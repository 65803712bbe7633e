"""DiffusionDet decoder (DynamicHead) in flax.linen — TPU-native.

Functional re-design of the reference ``DynamicHead`` and friends
(``mega_core/modeling/roi_heads/box_head/box_head.py:156-741``):

  * ``RCNNHead`` stages (self-attention over proposals → DynamicConv
    instance interaction → FFN → time FiLM → cls/reg towers → box deltas,
    box_head.py:438-590);
  * ``RCNNHead_cond`` conditioned stage with adaptive-norm conditioning
    (shift from the temporal cross-attention output, scale from time,
    box_head.py:593-664);
  * ``DynamicConv`` (box_head.py:666-711) as batched einsum — two
    per-proposal dynamic 256↔64 projections generated from the proposal
    feature (pure MXU bmm work);
  * sinusoidal time embedding + MLP (box_head.py:216-223, 729-741);
  * top-k condition-feature selection (75/25 per frame, box_head.py:304-317);
  * global cross-attention over the diverse memory with classifier-free
    guidance null-masking p=0.1 during training (box_head.py:365-394).

Everything is static-shape: [B, N=300] proposals, fixed top-k, fixed-size
memory with a validity mask instead of ragged tensors.  Attention layouts
are batch-first; the temporal attention flattens frames into one sequence
(the reference reaches the same effect through seq-major tensors with
batch=1).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import multilevel_roi_align_auto
from ..structures.boxes import apply_deltas_diffusion


def sinusoidal_time_embedding(t, dim: int):
    """(box_head.py:729-741): exp-spaced frequencies, [sin | cos]."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Linear(nn.Module):
    """Dense layer with torch parameter layout (weight [out, in])."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("weight", nn.initializers.xavier_uniform(), (self.features, in_f))
        y = x @ w.T.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x=None, params_only: bool = False):
        g = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if params_only:
            # fused-kernel callers consume (weight, bias) directly while
            # keeping the parameter tree (and checkpoints) unchanged
            return g, b
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * g + b).astype(x.dtype)


class MultiheadAttention(nn.Module):
    """Torch-layout MHA (fused in_proj + out_proj) for checkpoint parity."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_mask=None, attn_mask=None):
        """query [B, Lq, D]; key/value [B, Lk, D]; key_mask [B, Lk] bool;
        attn_mask [B, Lq, Lk] bool (True = attend) for per-pair sparsity
        (the sparse_attn block masks)."""
        d, h = self.d_model, self.num_heads
        dh = d // h
        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        wq, wk, wv = jnp.split(w_in, 3, axis=0)
        bq, bk, bv = jnp.split(b_in, 3, axis=0)

        q = query @ wq.T.astype(query.dtype) + bq.astype(query.dtype)
        k = key @ wk.T.astype(query.dtype) + bk.astype(query.dtype)
        v = value @ wv.T.astype(query.dtype) + bv.astype(query.dtype)

        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
        if key_mask is not None:
            neg = jnp.asarray(-1e9, logits.dtype)
            logits = jnp.where(key_mask[:, None, None, :], logits, neg)
        if attn_mask is not None:
            neg = jnp.asarray(-1e9, logits.dtype)
            logits = jnp.where(attn_mask[:, None, :, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return Linear(d, dtype=self.dtype, name="out_proj")(out)


class DynParamLinear(nn.Module):
    """The DynamicConv parameter generator, layout-engineered for the MXU.

    Parameter tree and torch layout are identical to ``Linear`` (one
    weight [2·d·dd, in], one bias — torch row order ``(half, d, dd)``),
    but the two halves are produced by separate matmuls against
    row-slices of the weight rather than one matmul + ``jnp.split`` (the
    split of the [S, 2·d·dd] activation is a 300+ MB HBM round-trip per
    decoder stage), AND the rows of each half are pre-permuted so the
    generated per-sample projections come out TRANSPOSED — [S, dd, d]
    and [S, d, dd] with the contraction dim minor on both sides of the
    batched matmuls that consume them.  Without this, XLA re-lays out
    the [S, d, dd] activation per stage (profiled ~0.2 ms/stage); the
    row permute touches only the 16 MB weight instead.  Exact same
    arithmetic (a row permutation commutes with the matmul).

    ``p2_major="e"`` (the fused-kernel orientation) skips the second
    permute entirely: params2's torch-native flat order is already
    e-major ([S, dd, d] view, loss head ``box_head.py:694-698``), so the
    raw GEMM output reshapes to [S, dd, d] with minor dim d=256 — two
    clean 128-lane tiles, no padded relayout (the d-major [S, d, dd]
    form pads lanes 64→128: the profiled 0.61 ms/chunk reshape)."""

    d: int
    dd: int
    p2_major: str = "d"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        d, dd = self.d, self.dd
        h = d * dd
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (2 * h, in_f))
        b = self.param("bias", nn.initializers.zeros, (2 * h,))
        w1 = w[:h].reshape(d, dd, in_f).transpose(1, 0, 2).reshape(h, in_f)
        b1 = b[:h].reshape(d, dd).T.reshape(h)
        h1 = x @ w1.astype(self.dtype).T + b1.astype(self.dtype)
        if self.p2_major == "e":
            h2 = x @ w[h:].astype(self.dtype).T + b[h:].astype(self.dtype)
            return (h1.reshape(-1, dd, d), h2.reshape(-1, dd, d))
        w2 = w[h:].reshape(dd, d, in_f).transpose(1, 0, 2).reshape(h, in_f)
        b2 = b[h:].reshape(dd, d).T.reshape(h)
        h2 = x @ w2.astype(self.dtype).T + b2.astype(self.dtype)
        return (h1.reshape(-1, dd, d), h2.reshape(-1, d, dd))


class OutLayer(nn.Module):
    """DynamicConv out-projection over the flattened [49·D] features.

    Same parameter as ``Linear`` (torch weight [D, 49·D], columns in
    (y, x, c) flatten order).  The pooled positions arrive in row-major
    (py, px) order — the v4 ROIAlign kernel's native store order and the
    torch flatten order — so converted weights apply unmodified."""

    features: int
    pooler_resolution: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (self.features, in_f))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ w.T.astype(self.dtype) + b.astype(self.dtype)


class DynamicConv(nn.Module):
    """Instance-interaction block (box_head.py:666-711).

    The proposal feature generates two dynamic projections (D→64, 64→D)
    applied to the 49 pooled positions — implemented as batched einsums so
    the MXU sees one big [B·N, 49, D] × [B·N, D, 64] contraction.
    """

    hidden_dim: int = 256
    dim_dynamic: int = 64
    pooler_resolution: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pro_features, roi_features):
        """pro_features [S, D]; roi_features [S, 49, D] → [S, D].

        The 49 pooled positions arrive row-major ((py, px) — the torch
        flatten order, natively emitted by the v4 ROIAlign kernel), so
        the final flatten → ``out_layer`` matmul consumes converted
        weights unmodified."""
        d, dd = self.hidden_dim, self.dim_dynamic
        # DIFFUSIONVID_DYNCONV_KERNEL: "1" fused Pallas chain (TPU),
        # "nn" einsum with e-major p2 (no kernel), "0" einsum NT form.
        mode = os.environ.get("DIFFUSIONVID_DYNCONV_KERNEL", "1")
        use_kernel = (jax.default_backend() in ("tpu", "axon")
                      and mode not in ("0", "nn"))
        # p1t [S, dd, d] == p1^T in every mode; the second projection is
        # e-major [S, dd, d] for the kernel and the nn-einsum (layout-free
        # reshape from the GEMM) or d-major [S, d, dd] (NT einsum form).
        p2_major = "e" if (use_kernel or mode == "nn") else "d"
        p1t, p2x = DynParamLinear(d, dd, p2_major=p2_major,
                                  dtype=self.dtype,
                                  name="dynamic_layer")(pro_features)
        if use_kernel:
            # fused Pallas chain: the per-proposal bmm→LN→relu→bmm→LN→
            # relu stays in VMEM (r5 profile: the XLA einsum path spent
            # 5.26 ms/chunk on relayout copies + unfused norms around
            # ~1.1 ms of matmul; see ops/dynamic_conv_pallas.py)
            from ..ops.dynamic_conv_pallas import dynamic_conv_fused
            g1, b1 = LayerNorm(dd, name="norm1")(params_only=True)
            g2, b2 = LayerNorm(d, name="norm2")(params_only=True)
            x = dynamic_conv_fused(roi_features, p1t, p2x, g1, b1, g2, b2)
        else:
            x = jnp.einsum("spd,sed->spe", roi_features, p1t,
                           preferred_element_type=jnp.float32).astype(roi_features.dtype)
            x = nn.relu(LayerNorm(dd, name="norm1")(x))
            x = jnp.einsum("spe,sed->spd" if p2_major == "e" else
                           "spe,sde->spd", x, p2x,
                           preferred_element_type=jnp.float32).astype(roi_features.dtype)
            x = nn.relu(LayerNorm(d, name="norm2")(x))

        x = x.reshape(x.shape[0], -1)  # [S, 49*D]
        x = OutLayer(d, self.pooler_resolution,
                     dtype=self.dtype, name="out_layer")(x)
        return nn.relu(LayerNorm(d, name="norm3")(x))


class RCNNHead(nn.Module):
    """One decoder stage (box_head.py:438-548).

    ``conditioned=True`` adds the DiffusionVID adaptive-norm conditioning
    (RCNNHead_cond, box_head.py:593-664): FiLM shift comes from the temporal
    cross-attention output instead of the time embedding.
    """

    d_model: int = 256
    num_classes: int = 30
    dim_feedforward: int = 2048
    num_heads: int = 8
    num_cls: int = 1
    num_reg: int = 3
    pooler_resolution: int = 7
    sampling_ratio: int = 2
    conditioned: bool = False
    use_time: bool = True       # False → plain Sparse R-CNN stage (DAFA)
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence, spatial_scales, bboxes, pro_features,
                 time_emb, cond=None):
        """
        features: list of [B, Hl, Wl, C] FPN maps; bboxes [B, N, 4] xyxy;
        pro_features [B, N, D] or None; time_emb [B, 4D]; cond [B, N, D].
        Returns (class_logits [B,N,K], pred_boxes [B,N,4], obj_features [B,N,D]).
        """
        d = self.d_model
        b, n = bboxes.shape[:2]

        # flat: take the Pallas kernel's native flat [B, N, 49, C] store
        # order — row-major (py, px), i.e. the torch flatten order (saves
        # the y/x transpose + 7·7→49 re-pad relayouts per stage, and
        # converted out_layer weights apply unmodified).
        roi = multilevel_roi_align_auto(
            features, bboxes, spatial_scales,
            output_size=self.pooler_resolution,
            sampling_ratio=self.sampling_ratio, flat=True,
        )  # [B, N, 49, C] row-major
        roi = roi.reshape(b * n, self.pooler_resolution ** 2, d)

        if pro_features is None:
            pro_features = roi.mean(axis=1).reshape(b, n, d)

        # Self-attention among the N proposals of each frame.
        attn_out = MultiheadAttention(d, self.num_heads, dtype=self.dtype,
                                      name="self_attn")(pro_features, pro_features, pro_features)
        x = LayerNorm(d, name="norm1")(pro_features + attn_out)

        # Dynamic instance interaction with the pooled features.
        inter = DynamicConv(d, pooler_resolution=self.pooler_resolution,
                            dtype=self.dtype,
                            name="inst_interact")(
            x.reshape(b * n, d), roi)
        x = LayerNorm(d, name="norm2")(x + inter.reshape(b, n, d))

        # FFN.
        y = Linear(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        y = Linear(d, dtype=self.dtype, name="linear2")(nn.relu(y))
        obj_features = LayerNorm(d, name="norm3")(x + y)

        fc = obj_features.reshape(b * n, d)

        # Time FiLM (+ conditioning shift for the conditioned stage).
        if not self.use_time:
            if cond is not None:
                fc = fc + Linear(d, dtype=self.dtype, name="c_mlp")(
                    nn.silu(cond.reshape(b * n, d)))
        elif self.conditioned:
            scale = Linear(d, dtype=self.dtype, name="block_time_mlp")(nn.silu(time_emb))
            scale = jnp.repeat(scale, n, axis=0)
            shift = Linear(d, dtype=self.dtype, name="c_mlp")(nn.silu(cond.reshape(b * n, d)))
        else:
            ss = Linear(2 * d, dtype=self.dtype, name="block_time_mlp")(nn.silu(time_emb))
            ss = jnp.repeat(ss, n, axis=0)
            scale, shift = jnp.split(ss, 2, axis=-1)
        if self.use_time:
            fc = fc * (scale + 1.0) + shift

        cls_feat = fc
        for i in range(self.num_cls):
            cls_feat = Linear(d, use_bias=False, dtype=self.dtype, name=f"cls_module{i}")(cls_feat)
            cls_feat = nn.relu(LayerNorm(d, name=f"cls_norm{i}")(cls_feat))
        reg_feat = fc
        for i in range(self.num_reg):
            reg_feat = Linear(d, use_bias=False, dtype=self.dtype, name=f"reg_module{i}")(reg_feat)
            reg_feat = nn.relu(LayerNorm(d, name=f"reg_norm{i}")(reg_feat))

        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        wc = self.param("class_logits_weight", nn.initializers.xavier_uniform(),
                        (self.num_classes, d))
        bc = self.param("class_logits_bias", bias_init, (self.num_classes,))
        class_logits = cls_feat @ wc.T.astype(cls_feat.dtype) + bc.astype(cls_feat.dtype)
        deltas = Linear(4, dtype=self.dtype, name="bboxes_delta")(reg_feat)

        pred = apply_deltas_diffusion(deltas.astype(jnp.float32).reshape(b, n, 4),
                                      bboxes)
        return (class_logits.reshape(b, n, -1), pred, obj_features)


class DynamicHead(nn.Module):
    """The full decoder stack (box_head.py:156-435).

    Submodules: ``num_heads`` shared stages, ``num_heads_local`` conditioned
    stages, one global cross-attention layer, a time MLP.  Exposed as three
    jit-friendly methods:

      * ``shared_stages``  — run the shared RCNN stages (training + the
        per-frame feature-extraction pass of streaming inference);
      * ``topk_features``  — select the top-75/25 condition features;
      * ``condition``      — global cross-attention + conditioned stage.
    """

    num_classes: int = 30
    d_model: int = 256
    dim_feedforward: int = 2048
    nheads: int = 8
    num_heads: int = 3
    num_heads_local: int = 1
    num_cls: int = 1
    num_reg: int = 3
    pooler_resolution: int = 7
    sampling_ratio: int = 2
    global_stages: int = 1
    # Local temporal attention (ATTENTION.ENABLE/STAGE, box_head.py:184-194):
    # per-stage MultiheadAttention + LayerNorm over the local frame queue's
    # top-k features.  The reference's adaptive-norm path uses the LAST
    # loop's output as the conditioning signal (box_head.py:361-394), so
    # with GLOBAL.ENABLE=True the global chain overwrites the local result
    # — the local output only conditions the decoder when the global
    # attention is off, and we reproduce exactly that.
    local_stages: int = 0
    global_enable: bool = True
    top_k: tuple = (75, 25)
    prior_prob: float = 0.01
    p_uncond: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        kw = dict(
            d_model=self.d_model, num_classes=self.num_classes,
            dim_feedforward=self.dim_feedforward, num_heads=self.nheads,
            num_cls=self.num_cls, num_reg=self.num_reg,
            pooler_resolution=self.pooler_resolution,
            sampling_ratio=self.sampling_ratio, prior_prob=self.prior_prob,
            dtype=self.dtype,
        )
        self.head_series = [RCNNHead(**kw, name=f"head{i}") for i in range(self.num_heads)]
        self.head_series_cond = [RCNNHead(**kw, conditioned=True, name=f"head_cond{i}")
                                 for i in range(self.num_heads_local)]
        self.global_attention = [
            MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                               name=f"global_attn{i}")
            for i in range(self.global_stages)
        ] if self.global_enable else []
        self.local_attention = [
            MultiheadAttention(self.d_model, self.nheads, dtype=self.dtype,
                               name=f"local_attn{i}")
            for i in range(self.local_stages)
        ]
        self.local_norm = [LayerNorm(self.d_model, name=f"local_norm{i}")
                           for i in range(self.local_stages)]
        self.time_fc1 = Linear(self.d_model * 4, dtype=self.dtype, name="time_fc1")
        self.time_fc2 = Linear(self.d_model * 4, dtype=self.dtype, name="time_fc2")

    def time_embedding(self, t):
        """t [B] integer timesteps → [B, 4D]."""
        emb = sinusoidal_time_embedding(t, self.d_model)
        return self.time_fc2(nn.gelu(self.time_fc1(emb), approximate=False))

    def shared_stages(self, features, spatial_scales, bboxes, t):
        """Run the shared stages. Returns per-stage (logits, boxes) lists and
        the final proposal features [B, N, D]."""
        time_emb = self.time_embedding(t)
        inter_logits, inter_boxes = [], []
        pro_features = None
        for head in self.head_series:
            logits, pred, pro_features = head(features, spatial_scales, bboxes,
                                              pro_features, time_emb)
            inter_logits.append(logits)
            inter_boxes.append(pred)
            bboxes = jax.lax.stop_gradient(pred)
        return inter_logits, inter_boxes, pro_features, time_emb

    def topk_features(self, class_logits, pro_features):
        """Top-k condition features per frame (box_head.py:304-317).

        Returns ([B, k1, D], [B, k2, D]); k2 picks are the best k2 of the k1.
        """
        k1, k2 = self.top_k
        score = jnp.max(class_logits, axis=-1)  # [B, N]
        _, idx = jax.lax.top_k(score, k1)       # [B, k1]
        feats_k1 = jnp.take_along_axis(pro_features, idx[..., None], axis=1)
        return feats_k1, feats_k1[:, :k2]

    def condition(self, features, spatial_scales, bboxes, pro_features, t,
                  memory, memory_mask, train: bool = False,
                  memory_dis=None, memory_dis_mask=None,
                  local_kv=None, local_kv_mask=None):
        """Global cross-attention + conditioned stage(s).

        pro_features [B, N, D]; memory [M, D] diverse global memory (or the
        concatenated global-frame top-k features at training time);
        memory_mask [M] validity.  With ``global_stages >= 2`` (GLOBAL.
        RES_STAGE=2, e.g. DAFA-G) the 150-slot DISTINCT memory joins the
        queries for a first attention over the diverse memory, then the
        refined distinct slice keys the second attention (box_head.py:
        367-385 ``global_kv_[1]`` split + the two-stage update_lm design,
        roi_box_feature_extractors.py:1174-1211).

        ``local_kv``: per-stage local-queue key features (sequence of
        [K_i, D], at test the queue's top-75 / top-25 features —
        diffusion_det.py:512 ``proposal_feats_local``); ``local_kv_mask``
        matching validity.  Per the reference's adaptive-norm data flow the
        local chain's output becomes the conditioning ONLY when the global
        attention is disabled (box_head.py:361-394: ``attn_`` is
        overwritten by the global loop).  Returns per-stage (logits, boxes)
        lists.
        """
        b, n, d = pro_features.shape
        time_emb = self.time_embedding(t)

        # One flattened sequence of all frames' proposals attends to the
        # global memory (reference: seq-major batch=1, box_head.py:365-374).
        query = pro_features.reshape(1, b * n, d)

        attn = None
        if self.local_stages > 0 and local_kv is not None:
            # local box-level attention (box_head.py:361-365): stage i keys
            # on local_kv[i]; LayerNorm, no residual, last stage wins.
            for i in range(self.local_stages):
                j = min(i, len(local_kv) - 1)
                lkv = local_kv[j][None].astype(query.dtype)
                lkm = (None if local_kv_mask is None
                       else local_kv_mask[j][None])
                a = self.local_attention[i](query, lkv, lkv, key_mask=lkm)
                attn = self.local_norm[i](a)

        if not self.global_enable:
            if attn is None:
                raise ValueError(
                    "conditioned stages need a conditioning signal: enable "
                    "GLOBAL.ENABLE or pass local_kv with ATTENTION.ENABLE")
            attn = attn.reshape(b, n, d)
        else:
            attn = self._global_chain(query, memory, memory_mask, memory_dis,
                                      memory_dis_mask, b, n, d)

        if train:
            # Classifier-free guidance: null the condition for random frames
            # (box_head.py:386-394).
            null = jax.random.uniform(self.make_rng("cfg"), (b,)) < self.p_uncond
            attn = jnp.where(null[:, None, None], 0.0, attn)

        inter_logits, inter_boxes = [], []
        for head in self.head_series_cond:
            logits, pred, pro_features = head(features, spatial_scales, bboxes,
                                              pro_features, time_emb, cond=attn)
            inter_logits.append(logits)
            inter_boxes.append(pred)
            bboxes = jax.lax.stop_gradient(pred)
        return inter_logits, inter_boxes, pro_features

    def _global_chain(self, query, memory, memory_mask, memory_dis,
                      memory_dis_mask, b, n, d):
        kv = memory[None].astype(query.dtype)
        if self.global_stages >= 2:
            if memory_dis is None:
                # training parity: both stages key on the same global set
                # (box_head.py:336 global_kv_ = [global_kv1_, global_kv1_])
                memory_dis, memory_dis_mask = memory, memory_mask
            q_cat = jnp.concatenate([query, memory_dis[None].astype(query.dtype)],
                                    axis=1)
            a0 = self.global_attention[0](q_cat, kv, kv,
                                          key_mask=memory_mask[None])
            refined = q_cat + a0
            kv2 = refined[:, b * n:]
            attn = self.global_attention[1](
                refined[:, : b * n], kv2, kv2,
                key_mask=memory_dis_mask[None])
        else:
            attn = self.global_attention[0](query, kv, kv,
                                            key_mask=memory_mask[None])
        return attn.reshape(b, n, d)

    def __call__(self, features, spatial_scales, bboxes, t, num_global: int,
                 train: bool = True):
        """Training forward (box_head.py:273-435, flagship path:
        LOCAL.ENABLE=False, GLOBAL.ENABLE=True).

        ``bboxes`` [B, N, 4] noisy boxes for B = 1 cur + num_global frames;
        the global kv is the concatenated top-75 features of the trailing
        ``num_global`` frames.  Returns stacked (logits [S,B,N,K],
        boxes [S,B,N,4]) over all stages for deep supervision.
        """
        inter_logits, inter_boxes, pro_features, _ = self.shared_stages(
            features, spatial_scales, bboxes, t)

        if self.num_heads_local == 0:
            # plain DiffusionDet (vid_R_101_DiffusionDET.yaml:
            # NUM_HEADS_LOCAL=0) — no temporal conditioning stage
            return jnp.stack(inter_logits), jnp.stack(inter_boxes)

        k1_feats, _ = self.topk_features(inter_logits[-1], pro_features)
        g = num_global
        global_kv = k1_feats[-g:].reshape(-1, self.d_model) if g > 0 else k1_feats.reshape(-1, self.d_model)
        kv_mask = jnp.ones((global_kv.shape[0],), bool)

        local_kv = None
        nl = None
        if self.local_stages > 0:
            # ATTENTION.ENABLE training: the leading (local) frames' top-k
            # features key the local chain (box_head.py:325-329,
            # local_interval=3 — cur + the local refs, which the sampler
            # places first in the frame stack).
            nl = min(3, k1_feats.shape[0])
            local_kv = (k1_feats[:nl].reshape(-1, self.d_model),)

        last_boxes = jax.lax.stop_gradient(inter_boxes[-1])
        if train and nl is not None:
            # The reference slices the conditioned stage's queries,
            # features, and time to the local frames (box_head.py:341-346)
            # and returns EVERY stage's outputs sliced to them
            # (:429-431) — losses land on the local frames only.  nl is
            # static, so the slice is jit-friendly; the criterion slices
            # its targets to logits.shape[1] (engine/train.py).
            cond_logits, cond_boxes, _ = self.condition(
                [f[:nl] for f in features], spatial_scales,
                last_boxes[:nl], pro_features[:nl], t[:nl],
                global_kv, kv_mask, train=train, local_kv=local_kv)
            all_logits = jnp.stack([l[:nl] for l in inter_logits]
                                   + cond_logits)
            all_boxes = jnp.stack([x[:nl] for x in inter_boxes]
                                  + cond_boxes)
            return all_logits, all_boxes

        cond_logits, cond_boxes, _ = self.condition(
            features, spatial_scales, last_boxes, pro_features, t,
            global_kv, kv_mask, train=train, local_kv=local_kv)

        all_logits = jnp.stack(inter_logits + cond_logits)
        all_boxes = jnp.stack(inter_boxes + cond_boxes)
        return all_logits, all_boxes
