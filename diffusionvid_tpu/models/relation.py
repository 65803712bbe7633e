"""Relation-network attention — the RDN/MEGA proposal-interaction core.

Re-design of the reference ``AttentionExtractor``
(``mega_core/modeling/roi_heads/box_head/roi_box_feature_extractors.py:130-243``):
rank-geometry position embedding (log-scale center/size offsets →
sinusoidal embedding → per-group learned bias) plus grouped multi-head
attention whose logits are ``log(bias + ε) + qk/√d``.  Implemented as one
batched einsum stack (MXU-shaped) instead of per-group bmm loops.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import Linear


def position_matrix(boxes, ref_boxes):
    """[N, M, 4] log-scale geometry features (extract_position_matrix,
    roi_box_feature_extractors.py:152-180; +1 width convention)."""
    def parts(b):
        # clamp degenerate (padding) boxes so the logs stay finite
        w = jnp.maximum(b[:, 2] - b[:, 0] + 1.0, 1e-3)
        h = jnp.maximum(b[:, 3] - b[:, 1] + 1.0, 1e-3)
        cx = 0.5 * (b[:, 0] + b[:, 2])
        cy = 0.5 * (b[:, 1] + b[:, 3])
        return w, h, cx, cy

    w, h, cx, cy = parts(boxes)
    wr, hr, cxr, cyr = parts(ref_boxes)
    dx = jnp.log(jnp.abs((cx[:, None] - cxr[None, :]) / w[:, None]) + 1e-3)
    dy = jnp.log(jnp.abs((cy[:, None] - cyr[None, :]) / h[:, None]) + 1e-3)
    dw = jnp.log(w[:, None] / wr[None, :])
    dh = jnp.log(h[:, None] / hr[None, :])
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def position_embedding(pos_mat, feat_dim: int = 64, wave_length: float = 1000.0):
    """[N, M, feat_dim] sinusoidal embedding (extract_position_embedding,
    roi_box_feature_extractors.py:130-149)."""
    n_freq = feat_dim // 8
    rng = jnp.arange(n_freq, dtype=jnp.float32)
    dim_mat = wave_length ** (8.0 / feat_dim * rng)          # [n_freq]
    div = (pos_mat[..., None] * 100.0) / dim_mat             # [N,M,4,n_freq]
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=-1)
    return emb.reshape(*pos_mat.shape[:2], feat_dim)


class RelationAttention(nn.Module):
    """One grouped relation-attention layer (attention_module_multi_head,
    roi_box_feature_extractors.py:183-243)."""

    feat_dim: int = 1024
    groups: int = 16
    emb_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat, ref_feat, pos_emb, ref_valid=None):
        """roi_feat [N, D]; ref_feat [M, D]; pos_emb [N, M, emb_dim] or
        None (geometry-free — the reference's ver="global"/"global_p"
        calls pass position_embedding=None); ref_valid [M] optional mask.
        Returns [N, D] attended features."""
        d, g = self.feat_dim, self.groups
        dg = d // g

        q = Linear(d, use_bias=False, dtype=self.dtype, name="Wq")(roi_feat)
        k = Linear(d, use_bias=False, dtype=self.dtype, name="Wk")(ref_feat)
        q = q.reshape(-1, g, dg)
        k = k.reshape(-1, g, dg)
        aff = jnp.einsum("ngd,mgd->nmg", q, k,
                         preferred_element_type=jnp.float32) / math.sqrt(dg)

        if pos_emb is not None:
            # geometric bias: 1×1 conv over the embedding → one weight
            # per group
            wg = self.param("Wg_weight", nn.initializers.normal(0.01),
                            (g, self.emb_dim))
            bg = self.param("Wg_bias", nn.initializers.zeros, (g,))
            bias = nn.relu(jnp.einsum("nme,ge->nmg",
                                      pos_emb.astype(jnp.float32), wg)
                           + bg)                              # [N, M, G]
            logits = jnp.log(bias + 1e-6) + aff               # [N, M, G]
        else:
            logits = aff
        if ref_valid is not None:
            logits = jnp.where(ref_valid[None, :, None], logits, -1e9)
        att = jax.nn.softmax(logits, axis=1)                  # over refs

        # per-group weighted sum of full-dim values, then grouped 1×1 proj
        out = jnp.einsum("nmg,md->ngd", att.astype(ref_feat.dtype), ref_feat)
        # Wv: grouped conv [D, G*D] → implement as per-group projection
        wv = self.param("Wv_weight", nn.initializers.normal(0.01),
                        (g, d, dg))
        bv = self.param("Wv_bias", nn.initializers.zeros, (d,))
        proj = jnp.einsum("ngd,gde->nge", out.astype(jnp.float32), wv)
        return (proj.reshape(-1, d) + bv).astype(roi_feat.dtype)


class RelationStack(nn.Module):
    """Stacked relation attention with residual + FC, as used by the
    RDN/MEGA extractors (roi_box_feature_extractors.py:281-488).

    ``joint=True`` reproduces MEGA's test-time stagewise co-refinement
    (_forward_test, roi_box_feature_extractors.py:1472-1515): the current
    and reference proposals advance TOGETHER through each stage (the
    attended output's ref slice feeds the next stage's keys), so later
    stages see stage-refined reference features, not raw ones.
    ``joint=False`` is the RDN style — only the queries advance.
    """

    num_stages: int = 2
    feat_dim: int = 1024
    groups: int = 16
    emb_dim: int = 64
    joint: bool = False
    # RDN advanced-stage distillation (roi_box_feature_extractors.py:
    # 334-347, 406-427): after the base stages, the top ``advanced_num``
    # proposals of each ``group_size``-sized ref-frame group (refs arrive
    # in RPN-score order, so a prefix slice IS the top-k) are refined by
    # ``advanced_stages`` extra relation stages over the full ref set,
    # then the current proposals attend once over that distilled set.
    # advanced_num = REF_POST_NMS_TOP_N · RDN.RATIO (= 75 · 0.2).
    advanced_stages: int = 0
    advanced_num: int = 15
    group_size: int = 75
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, ref_feat, boxes, ref_boxes, ref_valid=None,
                 extra_kv=None, extra_valid=None, stage_kv=None,
                 stage_valid=None, return_stage_refs: bool = False):
        """feat [N,D] queries; ref_feat [M,D]; boxes/ref_boxes geometry;
        extra_kv [K,D] optional geometry-free memory keys appended to every
        stage's reference set.

        ``stage_kv`` [S,K2,D] / ``stage_valid`` [S,K2] (joint mode only)
        is MEGA's PER-STAGE long-range memory: stage i additionally keys
        on ring-buffer features captured at stage i of earlier frames
        (update_memory/mem[i], roi_box_feature_extractors.py:1112-1140).
        ``return_stage_refs=True`` also returns the stage-refined ref
        features [S,M,D] so the caller can push them into those rings."""
        n = feat.shape[0]
        m = ref_feat.shape[0]
        if ref_valid is None:
            ref_valid = jnp.ones((m,), bool)

        all_boxes = jnp.concatenate([boxes, ref_boxes], 0)
        n_extra = 0 if extra_kv is None else extra_kv.shape[0]
        n_stage = 0 if stage_kv is None else stage_kv.shape[1]
        neutral = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]),
                           (n_extra + n_stage, 1))
        key_boxes = jnp.concatenate([ref_boxes, neutral], 0)
        key_valid = jnp.concatenate(
            [ref_valid]
            + ([extra_valid] if extra_kv is not None else [])
            , 0)

        if self.joint:
            pos = position_embedding(position_matrix(all_boxes, key_boxes),
                                     self.emb_dim)
            x = jnp.concatenate([feat, ref_feat], 0)
            stage_refs = []
            for i in range(self.num_stages):
                x = nn.relu(Linear(self.feat_dim, dtype=self.dtype,
                                   name=f"fc{i}")(x))
                keys = [x[n:]]
                kv_valid = key_valid
                if extra_kv is not None:
                    keys.append(extra_kv)
                if stage_kv is not None:
                    keys.append(stage_kv[i])
                    kv_valid = jnp.concatenate([kv_valid, stage_valid[i]], 0)
                att = RelationAttention(self.feat_dim, self.groups,
                                        self.emb_dim, dtype=self.dtype,
                                        name=f"attn{i}")(
                    x, jnp.concatenate(keys, 0), pos, kv_valid)
                x = x + att
                stage_refs.append(x[n:])
            if return_stage_refs:
                return x[:n], jnp.stack(stage_refs)
            return x[:n]

        pos = position_embedding(position_matrix(boxes, key_boxes),
                                 self.emb_dim)
        x = feat
        for i in range(self.num_stages):
            x = nn.relu(Linear(self.feat_dim, dtype=self.dtype,
                               name=f"fc{i}")(x))
            keys = (ref_feat if extra_kv is None
                    else jnp.concatenate([ref_feat, extra_kv], 0))
            att = RelationAttention(self.feat_dim, self.groups, self.emb_dim,
                                    dtype=self.dtype, name=f"attn{i}")(
                x, keys, pos, key_valid)
            x = x + att

        if self.advanced_stages > 0:
            # distill: top advanced_num of each group_size ref-frame group
            # (prefix slice == top-k: RPN emits score-ordered proposals)
            gs, k = self.group_size, self.advanced_num
            d = self.feat_dim
            nl = m // gs
            adv = ref_feat.reshape(nl, gs, d)[:, :k].reshape(nl * k, d)
            adv_boxes = ref_boxes.reshape(nl, gs, 4)[:, :k].reshape(nl * k, 4)
            adv_valid = ref_valid.reshape(nl, gs)[:, :k].reshape(nl * k)
            # adv proposals attend over the FULL ref set with their own
            # geometry (cal_position_embedding(rois_ref_adv, rois_ref))
            pos_adv = position_embedding(
                position_matrix(adv_boxes, ref_boxes), self.emb_dim)
            for i in range(self.advanced_stages):
                j = self.num_stages + i
                att = RelationAttention(self.feat_dim, self.groups,
                                        self.emb_dim, dtype=self.dtype,
                                        name=f"attn{j}")(
                    adv, ref_feat, pos_adv, ref_valid)
                # reference order in the advanced loop: attention first,
                # then relu(fc) (roi_box_feature_extractors.py:417-421)
                adv = nn.relu(Linear(self.feat_dim, dtype=self.dtype,
                                     name=f"fc{j}")(adv + att))
            # final: cur proposals attend over the distilled set, with the
            # cur↔refs embedding sliced to the distilled columns
            pos_cur_adv = (pos[:, :m].reshape(n, nl, gs, self.emb_dim)
                           [:, :, :k].reshape(n, nl * k, self.emb_dim))
            j = self.num_stages + self.advanced_stages
            att = RelationAttention(self.feat_dim, self.groups, self.emb_dim,
                                    dtype=self.dtype, name=f"attn{j}")(
                x, adv, pos_cur_adv, adv_valid)
            x = x + att
        return x
