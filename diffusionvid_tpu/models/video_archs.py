"""MEGA-family video detection meta-architectures: DFF, FGFA, RDN, MEGA.

Functional re-designs of the reference detectors
(``mega_core/modeling/detector/``):

  * ``DFFArch``    — generalized_rcnn_dff.py:42-120: key frames run the full
    backbone; other frames warp the key features with FlowNetS flow and the
    predicted per-channel scale map;
  * ``FGFAArch``   — generalized_rcnn_fgfa.py:45-150: neighbor features are
    flow-warped onto the current frame and aggregated with EmbedNet cosine
    weights (softmax over frames per position);
  * ``RDNArch``    — generalized_rcnn_rdn.py: current-frame proposals are
    enhanced by relation attention over reference-frame proposals;
  * ``MEGAArch``   — generalized_rcnn_mega.py:389-672: RDN plus a
    fixed-size FPS-deduplicated global feature memory carried as explicit
    state (``MegaState``) instead of Python deques.

All are compositions over the classic pieces (GeneralizedRCNN backbone/
RPN/box head) with static shapes; streaming state is a pytree threaded by
the caller, mirroring the DiffusionVID streaming engine design.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.memory import FeatureMemory, init_memory, update_erase_memory
from .box_head import FastRCNNPredictor, fast_rcnn_loss, postprocess_classic
from .flownet import EmbedNet, FlowNetS, warp_features
from .heads import Linear
from .pixel_attention import PixelMemoryAttention, pixel_positional_embedding
from .rcnn import GeneralizedRCNN
from .relation import RelationAttention, RelationStack
from .rpn import rpn_loss


# ---------------------------------------------------------------------------
# pixel-attention streaming helpers (LOCAL/GLOBAL.PIXEL_ATTEND)
# ---------------------------------------------------------------------------

def _coprime_stride(n: int, k: int, w: int) -> int:
    """Largest stride ≤ n//k coprime with the row width, so a stride
    lattice over row-major pixels covers the map uniformly (stands in
    for the reference's per-frame torch.randperm — static shapes)."""
    stride = max(1, n // max(k, 1))
    while stride > 1 and math.gcd(stride, w) != 1:
        stride -= 1
    return stride


def _select_masked(px, mask, k, hashed=True):
    """Up to ``k`` rows of ``px`` where ``mask``, shapes static.

    ``hashed=True`` visits masked rows in a Knuth-hash order — the
    static-shape stand-in for the reference's ``torch.randperm``
    selections (generalized_rcnn_mega.py:162, 181).  Returns
    ([k, C], [k] valid)."""
    n = mask.shape[0]
    if hashed:   # Knuth multiplicative hash in uint32 (wraps mod 2^32)
        order = ((jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761))
                 % jnp.uint32(n)).astype(jnp.int32)
    else:
        order = jnp.arange(n, dtype=jnp.int32)
    score = jnp.where(mask, order, n + order)     # masked rows first
    idx = jnp.argsort(score)[:k]
    valid = jnp.arange(k) < mask.sum()
    return px[idx], valid


def _irrelevant_pixels(px, k=100):
    """pixels_irr: the 'irrelevant' pixel cache — rows whose L2-norm
    softmax exceeds uniform (generalized_rcnn_mega.py:177-182:
    ``softmax(|x|₂/32) > 1/N``), k of them in hashed order."""
    l2 = jnp.sqrt(jnp.sum(px.astype(jnp.float32) ** 2, -1)) / 32.0
    keep = jax.nn.softmax(l2) > 1.0 / px.shape[0]
    return _select_masked(px, keep, k)


def _pixels_in_boxes(h, w, boxes, box_valid, stride=16.0):
    """[h·w] mask of feature-grid pixels whose center falls in any valid
    box (``get_pixels_index``, roi_box_feature_extractors.py:1517-1545;
    boxes are input-resolution xyxy, grid stride 16 → ·0.0625).  The
    reference builds its point grid from ``meshgrid(arange(h), arange(w))``
    and compares the FIRST coordinate against x1/x2 — an h/w swap that
    tests row indices against x extents; this implements the intended
    geometry (x vs x, y vs y) instead of reproducing the swap."""
    b = boxes / stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)
    gx = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
    gy = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
    inb = ((gx[:, None] >= b[None, :, 0]) & (gx[:, None] <= b[None, :, 2])
           & (gy[:, None] >= b[None, :, 1]) & (gy[:, None] <= b[None, :, 3]))
    return (inb & box_valid[None, :]).any(axis=1)


def _ring_write(mem: FeatureMemory, new, new_valid) -> FeatureMemory:
    """Append ``new`` rows (valid-compacted) into a fixed ring.  The
    reference's pixel_external_mem grows to 24 000 rows and is randomly
    trimmed (generalized_rcnn_mega.py:184-192), then randomly subsampled
    to ≤2000 at every read (:116-118); a fixed-capacity ring holding the
    most recent pixels is the static-shape equivalent of that bounded
    recency-biased pool."""
    cap = mem.feats.shape[0]
    k = new.shape[0]
    order = jnp.argsort(~new_valid, stable=True)
    new_c = new[order]
    nv = new_valid.sum().astype(jnp.int32)
    pos = (mem.count + jnp.arange(k)) % cap
    keep = jnp.arange(k) < nv
    cur = mem.feats[pos]
    out = mem.feats.at[pos].set(
        jnp.where(keep[:, None], new_c.astype(mem.feats.dtype), cur))
    return FeatureMemory(out, mem.count + nv)


def _ring_valid(mem: FeatureMemory) -> jnp.ndarray:
    cap = mem.feats.shape[0]
    return jnp.arange(cap) < jnp.minimum(mem.count, cap)


class PixelState(NamedTuple):
    """Streaming state for the pixel-attention paths — the reference's
    per-video pixel caches (generalized_rcnn_mega.py:269-273, 430-436)
    as fixed-size arrays:

      ext        pixel_external_mem (local): pixels inside score>0.9
                 detections, appended per key frame (:187-192)
      last_high  pixels_last_high: pixels inside score>0.5 detections
                 of the latest key frame (:156-158)
      irr        pixels_irr: 'irrelevant' high-norm pixels of the latest
                 enhanced map (:177-183)
      gpix       global_cache_pixel: FPS-managed pixel memory sampled
                 from the global frames (:196-200)
      irr_g      pixels_irr_g: irrelevant pixels of the global frames
    """

    ext: FeatureMemory
    last_high: jnp.ndarray
    last_high_valid: jnp.ndarray
    irr: jnp.ndarray
    irr_valid: jnp.ndarray
    gpix: FeatureMemory
    irr_g: jnp.ndarray
    irr_g_valid: jnp.ndarray


def local_pixel_frame_offsets(sel_future: int = 5, sel_prev: int = 5,
                              interval: int = 25,
                              key_location: int = 12) -> list:
    """``local_frame_selector`` (generalized_rcnn_mega.py:60-74): frame
    offsets ±2^i (plus 0) clamped to the local window, deduplicated and
    sorted.  Host-side (static — the offset set depends only on config).
    Defaults give [-12,-8,-4,-2,-1,0,1,2,4,8,12]."""
    lo, hi = -key_location, interval - key_location - 1
    offs = ({max(min(-(2 ** i), hi), lo) for i in range(sel_prev)}
            | {0}
            | {max(min(2 ** i, hi), lo) for i in range(sel_future)})
    return sorted(offs)


class DFFArch(nn.Module):
    """Deep Feature Flow: detect on warped key-frame features."""

    depth: int = 101
    num_classes: int = 31
    key_frame_duration: int = 10
    pre_nms: int = 2000
    post_nms: int = 300
    pre_nms_train: int = 2000
    post_nms_train: int = 300
    res5_dilation: int = 1
    num_groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.detector = GeneralizedRCNN(depth=self.depth,
                                        num_classes=self.num_classes,
                                        pre_nms_test=self.pre_nms,
                                        post_nms_test=self.post_nms,
                                        pre_nms_train=self.pre_nms_train,
                                        post_nms_train=self.post_nms_train,
                                        res5_dilation=self.res5_dilation,
                                        num_groups=self.num_groups,
                                        width_per_group=self.width_per_group,
                                        dtype=self.dtype, name="detector")
        self.flownet = FlowNetS(predict_scale=True, dtype=self.dtype,
                                name="flownet")

    def key_features(self, images):
        return self.detector.features(images)

    def warp_from_key(self, key_images, cur_images, key_feat):
        """Warp key-frame res4 features onto the current frame
        (generalized_rcnn_dff.py:72-95)."""
        pair = jnp.concatenate([cur_images / 255.0, key_images / 255.0], -1)
        flow, scale = self.flownet(pair)
        flow = flow[:, : key_feat.shape[1], : key_feat.shape[2]]
        scale = scale[:, : key_feat.shape[1], : key_feat.shape[2]]
        return warp_features(key_feat, flow) * scale

    def detect(self, feat, image_hw):
        props, _ = self.detector.proposals(feat, image_hw, train=False)
        x = self.detector.box_features(feat, props.boxes)
        cls_logits, box_deltas = self.detector.predictor(x)
        return jax.vmap(lambda cl, bd, pb, pv: postprocess_classic(
            cl, bd, pb, pv, image_hw))(cls_logits, box_deltas,
                                       props.boxes, props.valid)

    def train_loss(self, cur_images, ref_images, image_hw,
                   gt_boxes, gt_labels, gt_valid):
        """DFF training (generalized_rcnn_dff.py:88-115): backbone runs on
        the sampled KEY frame only; its features are flow-warped onto the
        current frame and the detector trains on the current frame's GT."""
        key_feat = self.key_features(ref_images)
        feat = self.warp_from_key(ref_images, cur_images, key_feat)
        return self.detector.losses_from_features(
            feat, image_hw, gt_boxes, gt_labels, gt_valid)

    def __call__(self, key_images, cur_images, image_hw, is_key: bool = False):
        key_feat = self.key_features(key_images)
        feat = key_feat if is_key else self.warp_from_key(
            key_images, cur_images, key_feat)
        return self.detect(feat, image_hw)


class FGFAArch(nn.Module):
    """Flow-Guided Feature Aggregation."""

    depth: int = 101
    num_classes: int = 31
    pre_nms: int = 2000
    post_nms: int = 300
    pre_nms_train: int = 2000
    post_nms_train: int = 300
    res5_dilation: int = 1
    num_groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.detector = GeneralizedRCNN(depth=self.depth,
                                        num_classes=self.num_classes,
                                        pre_nms_test=self.pre_nms,
                                        post_nms_test=self.post_nms,
                                        pre_nms_train=self.pre_nms_train,
                                        post_nms_train=self.post_nms_train,
                                        res5_dilation=self.res5_dilation,
                                        num_groups=self.num_groups,
                                        width_per_group=self.width_per_group,
                                        dtype=self.dtype, name="detector")
        self.flownet = FlowNetS(predict_scale=False, dtype=self.dtype,
                                name="flownet")
        self.embednet = EmbedNet(dtype=self.dtype, name="embednet")

    def aggregate(self, cur_images, ref_images, ref_feats):
        """Warp each ref feature to cur + cosine-weighted aggregation
        (generalized_rcnn_fgfa.py:45-110). ref axis leads: [R,H',W',C]."""
        r = ref_images.shape[0]
        cur_rep = jnp.repeat(cur_images, r, axis=0)
        pair = jnp.concatenate([cur_rep / 255.0, ref_images / 255.0], -1)
        flow = self.flownet(pair)
        flow = flow[:, : ref_feats.shape[1], : ref_feats.shape[2]]
        warped = warp_features(ref_feats, flow)               # [R,H,W,C]

        emb = self.embednet(warped)                           # [R,H,W,E]
        cur_emb = self.embednet(warped[-1:])  # last ref is cur itself
        norm = lambda e: e / jnp.maximum(
            jnp.linalg.norm(e.astype(jnp.float32), axis=-1, keepdims=True), 1e-6)
        cos = jnp.sum(norm(emb) * norm(cur_emb), axis=-1)     # [R,H,W]
        w = jax.nn.softmax(cos, axis=0)[..., None]
        return jnp.sum(warped.astype(jnp.float32) * w, axis=0,
                       keepdims=True).astype(warped.dtype)

    def train_loss(self, cur_images, ref_images, image_hw,
                   gt_boxes, gt_labels, gt_valid):
        """FGFA training (generalized_rcnn_fgfa.py:105-143): one backbone
        pass over [cur, refs], refs flow-warped onto cur, cosine-weight
        aggregation against the CUR frame's embedding, detector trained on
        the current frame's GT.

        NOTE: like the reference, train-time aggregation runs over the
        SAMPLED refs only (cur joins only if offset 0 is drawn,
        vid_fgfa.py:25-27), while the test window always includes cur —
        that train/test asymmetry is the reference's own behavior, kept
        for parity."""
        all_images = jnp.concatenate([cur_images, ref_images], 0)
        feats = self.detector.features(all_images)
        cur_feat, ref_feats = feats[:1], feats[1:]

        r = ref_images.shape[0]
        cur_rep = jnp.repeat(cur_images, r, axis=0)
        pair = jnp.concatenate([cur_rep / 255.0, ref_images / 255.0], -1)
        flow = self.flownet(pair)
        flow = flow[:, : ref_feats.shape[1], : ref_feats.shape[2]]
        warped = warp_features(ref_feats, flow)               # [R,H,W,C]

        emb = self.embednet(jnp.concatenate([cur_feat, warped], 0))
        cur_emb, ref_emb = emb[:1], emb[1:]
        norm = lambda e: e / jnp.maximum(
            jnp.linalg.norm(e.astype(jnp.float32), axis=-1, keepdims=True),
            1e-6)
        cos = jnp.sum(norm(ref_emb) * norm(cur_emb), axis=-1)   # [R,H,W]
        w = jax.nn.softmax(cos, axis=0)[..., None]
        feat = jnp.sum(warped.astype(jnp.float32) * w, axis=0,
                       keepdims=True).astype(warped.dtype)
        return self.detector.losses_from_features(
            feat, image_hw, gt_boxes, gt_labels, gt_valid)

    def __call__(self, cur_images, ref_images, image_hw):
        """ref_images must include the current frame as its last entry."""
        ref_feats = self.detector.features(ref_images)
        feat = self.aggregate(cur_images, ref_images, ref_feats)
        props, _ = self.detector.proposals(feat, image_hw, train=False)
        x = self.detector.box_features(feat, props.boxes)
        cls_logits, box_deltas = self.detector.predictor(x)
        return jax.vmap(lambda cl, bd, pb, pv: postprocess_classic(
            cl, bd, pb, pv, image_hw))(cls_logits, box_deltas,
                                       props.boxes, props.valid)


class RDNArch(nn.Module):
    """Relation Distillation Network: relation attention over reference-
    frame proposals (2 base stages)."""

    depth: int = 101
    num_classes: int = 31
    feat_dim: int = 1024
    relation_stages: int = 2       # MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE
    # ATTENTION.ADVANCED_STAGE / RDN.RATIO: the RDN-base→RDN delta
    # (roi_box_feature_extractors.py:334-347); advanced_num =
    # int(REF_POST_NMS_TOP_N · RDN.RATIO)
    advanced_stages: int = 0
    advanced_num: int = 15
    ref_post_nms: int = 75         # MODEL.VID.RPN.REF_POST_NMS_TOP_N
    pre_nms: int = 2000
    post_nms: int = 300
    pre_nms_train: int = 2000
    post_nms_train: int = 300
    joint: bool = False   # True = MEGA stagewise cur+ref co-refinement
    res5_dilation: int = 1
    num_groups: int = 1
    width_per_group: int = 64
    # LOCAL.PIXEL_ATTEND: the current-frame C4 map is enhanced by pixel
    # attention over the local-ref pixel set BEFORE the RPN, and the
    # pixel path REPLACES the box-relation pipeline — the reference
    # runs it only when local box attention is off
    # (`not local_box_enable and local_pixel_enable`,
    # generalized_rcnn_mega.py:352, 608) and local_box_enable =
    # ATTENTION.ENABLE and STAGE > 0 (:58).  Here the same mutual
    # exclusion is relation_stages == 0 (the builder zeroes the stages
    # when ATTENTION.ENABLE is off); with stages > 0 the flag is inert,
    # exactly like the reference.  Default False everywhere, as in the
    # reference (defaults.py:450).
    pixel_attend_local: bool = False
    pixel_sparse: float = 0.1          # test-time ref subsample (:609)
    pixel_sparse_train: float = 0.25   # train-time subsample (:360, 474)
    dtype: Any = jnp.float32

    @property
    def pixel_replaces_box(self) -> bool:
        return self.pixel_attend_local and self.relation_stages == 0

    def setup(self):
        self.detector = GeneralizedRCNN(depth=self.depth,
                                        num_classes=self.num_classes,
                                        pre_nms_test=self.pre_nms,
                                        post_nms_test=self.post_nms,
                                        pre_nms_train=self.pre_nms_train,
                                        post_nms_train=self.post_nms_train,
                                        ref_post_nms=self.ref_post_nms,
                                        res5_dilation=self.res5_dilation,
                                        num_groups=self.num_groups,
                                        width_per_group=self.width_per_group,
                                        dtype=self.dtype, name="detector")
        self.reduce = Linear(self.feat_dim, dtype=self.dtype, name="reduce")
        self.relation = RelationStack(num_stages=self.relation_stages,
                                      feat_dim=self.feat_dim,
                                      joint=self.joint,
                                      advanced_stages=self.advanced_stages,
                                      advanced_num=self.advanced_num,
                                      group_size=self.ref_post_nms,
                                      dtype=self.dtype, name="relation")
        self.predictor = FastRCNNPredictor(self.num_classes, name="predictor")
        if self.pixel_attend_local or getattr(self, "pixel_attend_global",
                                              False):
            # res4 is 1024-wide at every depth: the trunk uses Bottleneck
            # blocks for all RESNET_STAGES entries (resnet.py:210), so
            # depth only changes the block count, not the stage widths
            self.pixel_attn = PixelMemoryAttention(
                feat_dim=1024, dtype=self.dtype, name="pixel_attn")
        if self.relation_stages == 0:
            # update_lm: with zero local relation stages the stagewise
            # fusion of the global box memory never runs, but the
            # reference still applies one geometry-free global-memory
            # attention pass on the pooled features
            # (roi_box_feature_extractors.py:1510-1513 applies update_lm
            # for ANY stage count when global_box_enable)
            self.global_lm = RelationAttention(
                self.feat_dim, 16, dtype=self.dtype, name="global_lm")

    def _pixel_enhance(self, cur_feat, ref_feat, ref_frame_valid=None,
                       sparse=None, memory=None, memory_valid=None):
        """Pixel-level attention on the current frame's C4 map
        (``update_lm_pixel_with_transpose``,
        generalized_rcnn_mega.py:85-130 + ``update_lm_pixel``,
        roi_box_feature_extractors.py:1214-1235):

          * the 2D sinusoidal positional embedding ``ps`` is added to
            BOTH the query map and the reference maps (:93-100); the
            attention residual lands on the ps-augmented query, so the
            enhanced map retains the +ps offset exactly like the
            reference (:123-124);
          * keys are a ``sparse`` per-frame subsample of the reference
            pixels (:102-110) — torch.randperm there, a stride lattice
            coprime with the row width here so shapes stay static under
            jit — plus the external pixel memories (``memory``):
            pixel_external_mem / global_cache_pixel (:115-121) and
            pixels_irr / pixels_last_high (1217-1221);
          * ``new_conv2`` re-projection + residual is dead code in the
            reference (resnet.py:147-151 constructs it under ``if
            False`` → always None, so the guard at
            generalized_rcnn_mega.py:611 never fires) — the enhanced map
            feeds the RPN directly.

        cur_feat [1,h,w,C]; ref_feat [F,h,w,C]; ref_frame_valid [F] masks
        frames before the video start (the reference's ``real_idx``
        filter, :76-77).  Returns the enhanced [1,h,w,C] map."""
        f, h, w, c = ref_feat.shape
        sparse = self.pixel_sparse if sparse is None else sparse
        ps = pixel_positional_embedding(h, w, c, self.dtype)
        hw = h * w
        k = max(1, int(round(hw * sparse)))
        stride = _coprime_stride(hw, k, w)
        refs = (ref_feat + ps[None]).reshape(f, hw, c)[:, ::stride][:, :k]
        keys = refs.reshape(f * k, c)
        if ref_frame_valid is None:
            ref_frame_valid = jnp.ones((f,), bool)
        keys_valid = jnp.repeat(ref_frame_valid, k)
        return self.pixel_attn(cur_feat[0] + ps, keys=keys,
                               keys_valid=keys_valid, memory=memory,
                               memory_valid=memory_valid)[None]

    def pooled(self, feat, boxes):
        x = self.detector.box_features(feat, boxes)     # [B,R,2048]
        return nn.relu(self.reduce(x))                  # [B,R,1024]

    def ref_proposals(self, images, image_hw):
        """Reference-frame 75-proposal boxes for visualization (the demo
        ``--track-refs`` overlay; reference demo/predictor.py:588-605 draws
        the contributing ref boxes).  Returns (boxes [F, 75, 4],
        valid [F, 75]) in RPN objectness order."""
        feat = self.detector.features(images)
        props, _ = self.detector.proposals(feat, image_hw, train=False,
                                           ref=True)
        return props.boxes, props.valid

    def _ref_pooled(self, ref_feat, image_hw):
        """75-proposal ref-frame features+boxes (rpn version="ref")."""
        ref_props, _ = self.detector.proposals(ref_feat, image_hw,
                                               train=False, ref=True)
        ref_x = jax.vmap(lambda f, b: self.pooled(f[None], b[None])[0])(
            ref_feat, ref_props.boxes).reshape(-1, self.feat_dim)
        return (ref_x, ref_props.boxes.reshape(-1, 4),
                ref_props.valid.reshape(-1))

    def train_loss(self, cur_images, ref_images, image_hw,
                   gt_boxes, gt_labels, gt_valid,
                   extra_kv=None, extra_valid=None):
        """RDN training (generalized_rcnn_rdn.py:75-106): one backbone pass
        over [cur, refs]; RPN trains on the current frame; the sampled
        current-frame proposals are relation-attended over the ref set
        (cur-as-ref first, rpn/rpn.py version="ref") before the Fast R-CNN
        loss.  ``extra_kv`` lets MEGA append memory/global keys."""
        all_images = jnp.concatenate([cur_images, ref_images], 0)
        feats = self.detector.features(all_images)
        cur_feat, ref_feat = feats[:1], feats[1:]
        if self.pixel_replaces_box:
            # train-side pixel path (generalized_rcnn_mega.py:352-363):
            # refs are ALL local maps INCLUDING the current frame
            # (feats_ref=concat_feats_l), sparse=0.25, and pixels_irr is
            # recomputed per batch from the full local pixel set
            irr, irr_valid = _irrelevant_pixels(
                feats.reshape(-1, feats.shape[-1]))
            cur_feat = self._pixel_enhance(
                cur_feat, feats, sparse=self.pixel_sparse_train,
                memory=irr, memory_valid=irr_valid)

        props, (logits, deltas, anchors) = self.detector.proposals(
            cur_feat, image_hw, train=True)
        # detached, as in the reference's no_grad RPN inference
        props = jax.tree.map(jax.lax.stop_gradient, props)
        r1, r2 = jax.random.split(self.make_rng("sampler"))
        losses = rpn_loss(r1, logits, deltas, anchors,
                          gt_boxes[None], gt_valid[None])
        # GT replaces the proposal tail (add_gt_proposals semantics)
        g = gt_boxes.shape[0]
        boxes = jnp.concatenate([props.boxes[0, :-g], gt_boxes], axis=0)
        valid = jnp.concatenate([props.valid[0, :-g], gt_valid], axis=0)

        cur_x = self.pooled(cur_feat, boxes[None])[0]
        # reference set: cur as its own ref + the sampled refs
        ref_x, ref_boxes, ref_valid = self._ref_pooled(
            jnp.concatenate([cur_feat, ref_feat], 0), image_hw)

        x = self.relation(cur_x, ref_x, boxes, ref_boxes, ref_valid,
                          extra_kv=extra_kv, extra_valid=extra_valid)
        if self.relation_stages == 0 and extra_kv is not None:
            # update_lm at train when the global cache is present
            # (generate_feats, roi_box_feature_extractors.py:1259-1263)
            lm = self.global_lm(x, extra_kv, None, extra_valid)
            x = jnp.where(extra_valid.any(), x + lm, x)
        cls_logits, box_deltas = self.predictor(x[None])
        losses.update(fast_rcnn_loss(
            r2, cls_logits, box_deltas, boxes[None], valid[None],
            gt_boxes[None], gt_labels[None], gt_valid[None]))
        return losses

    def __call__(self, cur_images, ref_images, image_hw):
        """Single-image inference: cur [1,H,W,3], refs [L,H,W,3]."""
        all_images = jnp.concatenate([cur_images, ref_images], 0)
        feats = self.detector.features(all_images)
        cur_feat, ref_feat = feats[:1], feats[1:]
        if self.pixel_replaces_box:
            # stateless fallback (no pixel memories); the streaming
            # engine uses MEGAArch.pixel_call with the full PixelState
            cur_feat = self._pixel_enhance(cur_feat, feats)

        props, _ = self.detector.proposals(cur_feat, image_hw, train=False)
        ref_props, _ = self.detector.proposals(ref_feat, image_hw,
                                               train=False, ref=True)

        cur_x = self.pooled(cur_feat, props.boxes)[0]               # [R,1024]
        ref_x = jax.vmap(lambda f, b: self.pooled(f[None], b[None])[0])(
            ref_feat, ref_props.boxes).reshape(-1, self.feat_dim)   # [L*75,1024]
        ref_boxes = ref_props.boxes.reshape(-1, 4)
        ref_valid = ref_props.valid.reshape(-1)

        x = self.relation(cur_x, ref_x, props.boxes[0], ref_boxes, ref_valid)
        cls_logits, box_deltas = self.predictor(x[None])
        return jax.vmap(lambda cl, bd, pb, pv: postprocess_classic(
            cl, bd, pb, pv, image_hw))(cls_logits, box_deltas,
                                       props.boxes, props.valid)


class MegaState(NamedTuple):
    """Streaming state for MEGA: FPS global memory of proposal features +
    per-stage long-range-memory ring buffers (the deque stack of
    generalized_rcnn_mega.py:446-605 and the per-stage ``mem_queue_list``
    of roi_box_feature_extractors.py:1112-1140, as fixed-size arrays).

    ``stage_feats`` [S, cap, D]: stage i keys on features that earlier
    frames produced AT stage i; ``stage_count`` tracks the ring fill."""

    mem: FeatureMemory
    stage_feats: Any = None     # [S, cap, D] or None (stage memory off)
    stage_count: Any = None     # [S] int32


class MEGAArch(RDNArch):
    """MEGA = RDN + global FPS memory attention.

    Functional streaming: ``init_state`` → repeated ``update_memory`` with
    global-frame proposal features → ``__call__`` runs the stagewise
    cur+ref co-refinement (joint RelationStack — the reference advances
    reference features through the same stages,
    roi_box_feature_extractors.py:1496-1505) with the FPS memory appended
    to every stage's key set, then predicts (the update_lm global pass)."""

    memory_size: int = 750
    joint: bool = True
    # long-range per-stage memory (MEMORY.ENABLE / MEMORY.SIZE frames,
    # 75 ref slots captured per frame per stage)
    use_stage_mem: bool = False
    mem_frames: int = 25
    ref_slots: int = 75          # REF_POST_NMS_TOP_N per pushed frame
    # GLOBAL.PIXEL_ATTEND (defaults.py:463): global maps are pixel-
    # enhanced (self-attention + pixel memories) before the ref RPN, and
    # a FPS-managed global pixel cache is maintained
    # (generalized_rcnn_mega.py:455-478)
    pixel_attend_global: bool = False
    pixel_mem_size: int = 1000   # MEMORY_MANAGEMENT_SIZE_PIXEL_TEST
    pixel_ext_cap: int = 2048    # pixel_external_mem read budget (:117)

    @property
    def stage_mem_cap(self) -> int:
        return self.mem_frames * self.ref_slots

    def init_state(self) -> MegaState:
        mem = init_memory(self.memory_size, self.feat_dim)
        if not self.use_stage_mem:
            return MegaState(mem)
        s = self.relation_stages
        return MegaState(
            mem,
            jnp.zeros((s, self.stage_mem_cap, self.feat_dim)),
            jnp.zeros((s,), jnp.int32))

    def memory_features(self, images, image_hw, pstate: "PixelState" = None):
        """Global frame → 75 ref proposals → pooled 1024-d features
        (generalized_rcnn_mega.py:446-526).  With GLOBAL.PIXEL_ATTEND and
        a pixel state, each global map is first self-enhanced — query
        pixels attend over a sparse-0.25 subsample of their own (ps-added)
        pixels plus the global pixel cache (:470-478; pixel_external_mem
        and pixels_irr are still None at global-init time, :430-436)."""
        feat = self.detector.features(images)
        if self.pixel_attend_global and pstate is not None:
            gvalid = (jnp.arange(pstate.gpix.feats.shape[0])
                      < pstate.gpix.count)
            feat = jnp.concatenate([
                self._pixel_enhance(feat[i:i + 1], feat[i:i + 1],
                                    sparse=self.pixel_sparse_train,
                                    memory=pstate.gpix.feats,
                                    memory_valid=gvalid)
                for i in range(feat.shape[0])], 0)
        props, _ = self.detector.proposals(feat, image_hw, train=False,
                                           ref=True)
        x = self.pooled(feat, props.boxes)
        return x.reshape(-1, self.feat_dim), props.valid.reshape(-1)

    # ---- pixel-attention streaming (LOCAL/GLOBAL.PIXEL_ATTEND) ----

    def init_pixel_state(self) -> "PixelState":
        c = 1024     # C4 width (see pixel_attn note in setup)
        z100 = jnp.zeros((100, c))
        f100 = jnp.zeros((100,), bool)
        return PixelState(
            ext=init_memory(self.pixel_ext_cap, c),
            last_high=z100, last_high_valid=f100,
            irr=z100, irr_valid=f100,
            gpix=init_memory(self.pixel_mem_size, c),
            irr_g=z100, irr_g_valid=f100)

    def update_global_pixels(self, pstate: "PixelState",
                             global_images) -> "PixelState":
        """select_pixel_ref(mode='random', update_mem='global') for each
        global frame (generalized_rcnn_mega.py:455-461): 250 hashed-order
        pixels → FPS ``update_erase_memory`` into the global pixel cache
        (:196-200), and pixels_irr_g refreshed from the frame's pixels
        (:177-183, 194)."""
        feats = self.detector.features(global_images)
        g, h, w, c = feats.shape
        gpix, irr_g, irr_gv = pstate.gpix, pstate.irr_g, pstate.irr_g_valid
        allpix = jnp.ones((h * w,), bool)
        for i in range(g):
            px = feats[i].reshape(-1, c)
            sel, sel_valid = _select_masked(px, allpix, 250)
            gpix = update_erase_memory(gpix, sel,
                                       sel_valid.sum().astype(jnp.int32))
            irr_g, irr_gv = _irrelevant_pixels(px)
        return pstate._replace(gpix=gpix, irr_g=irr_g, irr_g_valid=irr_gv)

    def pixel_call(self, cur_images, ref_images, ref_frame_valid, image_hw,
                   state: MegaState, pstate: "PixelState"):
        """Key-frame inference when the pixel pipeline REPLACES the box
        pipeline (generalized_rcnn_mega.py:608-620: `not local_box_enable
        and local_pixel_enable`):

          1. the current C4 map is pixel-enhanced over the
             frame-selector reference maps + external pixel memories
             (local_pixel_level_attention, :75-84, sparse=0.1);
          2. the RPN and the pooled box features run on the ENHANCED map
             (:612-614), with NO box-relation references (proposals_ref
             is None, :615-618 — with stage 0 the extractor reduces to
             the pooled features, roi_box_feature_extractors.py:1508);
          3. one geometry-free global box-memory attention pass
             (update_lm, :1510-1513) when the box memory is carried;
          4. after the heads, the local pixel memories update from the
             enhanced map + detections (select_pixel_ref mode='box'
             update_mem='local', :635-636, 148-158, 177-192).

        Returns (detections, new PixelState)."""
        feats = self.detector.features(
            jnp.concatenate([cur_images, ref_images], 0))
        cur_map, ref_maps = feats[:1], feats[1:]
        c = feats.shape[-1]
        mem = jnp.concatenate(
            [pstate.ext.feats, pstate.gpix.feats, pstate.irr,
             pstate.last_high], 0)
        mem_valid = jnp.concatenate(
            [_ring_valid(pstate.ext),
             jnp.arange(pstate.gpix.feats.shape[0]) < pstate.gpix.count,
             pstate.irr_valid, pstate.last_high_valid], 0)
        enhanced = self._pixel_enhance(
            cur_map, ref_maps, ref_frame_valid, sparse=self.pixel_sparse,
            memory=mem, memory_valid=mem_valid)

        props, _ = self.detector.proposals(enhanced, image_hw, train=False)
        x = self.pooled(enhanced, props.boxes)[0]
        if state is not None:
            mvalid = jnp.arange(self.memory_size) < state.mem.count
            lm = self.global_lm(x, state.mem.feats, None, mvalid)
            x = jnp.where(state.mem.count > 0, x + lm, x)
        cls_logits, box_deltas = self.predictor(x[None])
        dets = jax.vmap(lambda cl, bd, pb, pv: postprocess_classic(
            cl, bd, pb, pv, image_hw))(cls_logits, box_deltas,
                                       props.boxes, props.valid)

        h, w = enhanced.shape[1:3]
        epx = enhanced[0].reshape(-1, c)
        m09 = _pixels_in_boxes(h, w, dets.boxes[0],
                               dets.valid[0] & (dets.scores[0] > 0.9))
        sel09, v09 = _select_masked(epx, m09, 100)
        m05 = _pixels_in_boxes(h, w, dets.boxes[0],
                               dets.valid[0] & (dets.scores[0] > 0.5))
        sel05, v05 = _select_masked(epx, m05, 100)
        irr, irrv = _irrelevant_pixels(epx)
        pstate = pstate._replace(
            ext=_ring_write(pstate.ext, sel09, v09),
            last_high=sel05, last_high_valid=v05,
            irr=irr, irr_valid=irrv)
        return dets, pstate

    def update_memory(self, state: MegaState, feats, valid) -> MegaState:
        count = valid.sum().astype(jnp.int32)
        # compact valid features to a prefix (order-preserving)
        order = jnp.argsort(~valid)        # valid first, stable
        return state._replace(
            mem=update_erase_memory(state.mem, feats[order], count))

    def train_loss_mega(self, cur_images, local_images, mem_images,
                        global_images, image_hw, gt_boxes, gt_labels,
                        gt_valid):
        """MEGA training (generalized_rcnn_mega.py:252-388): memory and
        global frames contribute ref-proposal features as geometry-free
        attention keys (the roles of update_memory/update_lm at train
        time); local frames are the geometric relation refs; losses are on
        the current frame only."""
        extra_kv = extra_valid = None
        aux = []
        if mem_images is not None and mem_images.shape[0] > 0:
            aux.append(mem_images)
        if global_images is not None and global_images.shape[0] > 0:
            aux.append(global_images)
        if aux:
            aux_feat = self.detector.features(jnp.concatenate(aux, 0))
            extra_kv, _, extra_valid = self._ref_pooled(aux_feat, image_hw)
        return self.train_loss(cur_images, local_images, image_hw,
                               gt_boxes, gt_labels, gt_valid,
                               extra_kv=extra_kv, extra_valid=extra_valid)

    def _push_stage_mem(self, state: MegaState, stage_refs) -> MegaState:
        """Ring-write the newest frame's 75 stage-i ref features into ring
        i (update_memory push, roi_box_feature_extractors.py:1112-1125).
        ``stage_refs`` [S, M, D]; the newest window frame's slots are the
        LAST 75 of the ref stack."""
        k = self.ref_slots
        newest = stage_refs[:, -k:, :]                   # [S, k, D]
        cap = self.stage_mem_cap

        def write_one(ring, count, block):
            pos = (count % cap)
            idx = (pos + jnp.arange(k)) % cap
            return ring.at[idx].set(block), count + k

        rings, counts = jax.vmap(write_one)(
            state.stage_feats, state.stage_count,
            newest.astype(state.stage_feats.dtype))
        return MegaState(state.mem, rings, counts)

    def __call__(self, cur_images, ref_images, image_hw,
                 state: MegaState = None, return_state: bool = False):
        all_images = jnp.concatenate([cur_images, ref_images], 0)
        feats = self.detector.features(all_images)
        cur_feat, ref_feat = feats[:1], feats[1:]
        if self.pixel_replaces_box:
            cur_feat = self._pixel_enhance(cur_feat, feats)

        props, _ = self.detector.proposals(cur_feat, image_hw, train=False)
        ref_props, _ = self.detector.proposals(ref_feat, image_hw,
                                               train=False, ref=True)
        cur_x = self.pooled(cur_feat, props.boxes)[0]
        ref_x = jax.vmap(lambda f, b: self.pooled(f[None], b[None])[0])(
            ref_feat, ref_props.boxes).reshape(-1, self.feat_dim)
        ref_boxes = ref_props.boxes.reshape(-1, 4)
        ref_valid = ref_props.valid.reshape(-1)

        extra_kv = extra_valid = None
        stage_kv = stage_valid = None
        if state is not None:
            extra_kv = state.mem.feats
            extra_valid = jnp.arange(self.memory_size) < state.mem.count
            if self.use_stage_mem and state.stage_feats is not None:
                stage_kv = state.stage_feats
                stage_valid = (jnp.arange(self.stage_mem_cap)[None, :]
                               < jnp.minimum(state.stage_count,
                                             self.stage_mem_cap)[:, None])

        out = self.relation(cur_x, ref_x, props.boxes[0], ref_boxes,
                            ref_valid, extra_kv=extra_kv,
                            extra_valid=extra_valid, stage_kv=stage_kv,
                            stage_valid=stage_valid,
                            return_stage_refs=stage_kv is not None)
        if stage_kv is not None:
            x, stage_refs = out
            state = self._push_stage_mem(state, stage_refs)
        else:
            x = out
        if self.relation_stages == 0 and extra_kv is not None:
            # update_lm: zero local stages still get the final global
            # box-memory attention (roi_box_feature_extractors.py:1508-1513);
            # skipped while the memory is empty (the reference's
            # global_cache is None until the first update)
            lm = self.global_lm(x, extra_kv, None, extra_valid)
            x = jnp.where(extra_valid.any(), x + lm, x)
        cls_logits, box_deltas = self.predictor(x[None])
        dets = jax.vmap(lambda cl, bd, pb, pv: postprocess_classic(
            cl, bd, pb, pv, image_hw))(cls_logits, box_deltas,
                                       props.boxes, props.valid)
        if return_state:
            return dets, state
        return dets
