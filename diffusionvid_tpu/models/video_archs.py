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
from .pixel_attention import PixelMemoryAttention
from .rcnn import GeneralizedRCNN
from .relation import RelationStack
from .rpn import rpn_loss


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
    # LOCAL.PIXEL_ATTEND: before RPN/pooling, current-frame C4 pixels
    # attend over a sparse subsample of the local-ref pixel set
    # (generalized_rcnn_mega.py:75-84 local_pixel_level_attention); the
    # builder sets it from MODEL.VID.MEGA.LOCAL.PIXEL_ATTEND for the
    # MEGA method, matching the reference's wiring into the MEGA/DAFA
    # detectors only (default False everywhere, as in the reference).
    pixel_attend_local: bool = False
    pixel_sparse: float = 0.1
    dtype: Any = jnp.float32

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
        if self.pixel_attend_local:
            # res4 is 1024-wide at every depth: the trunk uses Bottleneck
            # blocks for all RESNET_STAGES entries (resnet.py:210), so
            # depth only changes the block count, not the stage widths
            self.pixel_attn = PixelMemoryAttention(
                feat_dim=1024, dtype=self.dtype, name="pixel_attn")

    def _pixel_enhance(self, cur_feat, ref_feat):
        """Pixel-level local attention on the current frame's C4 map
        (update_lm_pixel_with_transpose, generalized_rcnn_mega.py:85-130):
        keys are the cur pixels plus a ``pixel_sparse`` subsample of the
        ref-frame pixels.  The reference subsamples with torch.randperm at
        run time; here it is a trace-time stride so shapes stay static —
        under jit a data-dependent gather of a random subset would force
        a dynamic shape."""
        l, h, w, c = ref_feat.shape
        n = l * h * w
        px = ref_feat.reshape(n, c)
        k = max(1, int(round(n * self.pixel_sparse)))
        stride = max(1, n // k)
        # a stride sharing factors with the row width collapses the
        # lattice onto a few repeated columns; step down to the nearest
        # stride coprime with w so the sample covers the map uniformly
        # (stands in for the reference's per-frame randperm)
        while stride > 1 and math.gcd(stride, w) != 1:
            stride -= 1
        mem = px[::stride][:k]
        return self.pixel_attn(cur_feat[0], memory=mem)[None]

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
        if self.pixel_attend_local:
            cur_feat = self._pixel_enhance(cur_feat, ref_feat)

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
        if self.pixel_attend_local:
            cur_feat = self._pixel_enhance(cur_feat, ref_feat)

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

    def memory_features(self, images, image_hw):
        """Global frame → 75 ref proposals → pooled 1024-d features
        (generalized_rcnn_mega.py:446-526)."""
        feat = self.detector.features(images)
        props, _ = self.detector.proposals(feat, image_hw, train=False,
                                           ref=True)
        x = self.pooled(feat, props.boxes)
        return x.reshape(-1, self.feat_dim), props.valid.reshape(-1)

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
        if self.pixel_attend_local:
            cur_feat = self._pixel_enhance(cur_feat, ref_feat)

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
        cls_logits, box_deltas = self.predictor(x[None])
        dets = jax.vmap(lambda cl, bd, pb, pv: postprocess_classic(
            cl, bd, pb, pv, image_hw))(cls_logits, box_deltas,
                                       props.boxes, props.valid)
        if return_state:
            return dets, state
        return dets
