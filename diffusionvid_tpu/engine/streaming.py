"""Streaming video inference — the DiffusionVID flagship hot path, jitted.

Re-design of ``DiffusionDet._forward_test`` (``diffusion_det.py:377-646``)
as pure state-carrying step functions:

  reference (stateful Python object)          TPU rebuild (pure functions)
  ------------------------------------------  --------------------------------
  local deques of feats/classes/boxes/feats   the current INFER_BATCH chunk is
  (len ALL_FRAME_INTERVAL == INFER_BATCH,     the local window (flagship cfgs:
   KEY_FRAME_LOCATION == 0)                   KEY_FRAME_LOCATION=0, interval ==
                                              INFER_BATCH → the deque always
                                              equals the chunk at detect time)
  900/150-slot global memory, FPS dedup       FeatureMemory in StreamState
  Python DDIM loop w/ CPU alpha bounce        unrolled static time pairs, all
  (diffusion_det.py:578-584)                  constants live on device
  ragged box renewal (cat + randn fill)       keep-mask + fresh-noise refill
                                              (slot sets are equivalent:
                                              proposals are unordered)

Chunks are processed one jit call each; video state (global memory + rng)
is a pytree threaded through calls.  Tail chunks are padded to INFER_BATCH
with a frame-validity mask so shapes never change.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..models.diffusion_det import (
    DiffusionDetArch, DiffusionSchedule, make_schedule, ddim_times,
    signal_to_boxes, boxes_to_signal, predict_noise_from_start,
)
from ..ops.memory import FeatureMemory, init_memory, update_erase_memory
from .postprocess import postprocess_frame, select_topk_detections, postprocess_ensemble
from ..structures.boxes import BoxArray, clip_to_image


class StreamState(NamedTuple):
    mem: FeatureMemory       # 900-slot diverse global memory
    mem_dis: FeatureMemory   # 150-slot distinct memory (RES_STAGE≥2 parity)
    rng: jnp.ndarray


class StreamingDetector:
    """Thin driver around the jitted chunk functions.

    Usage::

        det = StreamingDetector(model, params, cfg)
        state = det.start_video(rng, global_frames, whwh)   # 24 init frames
        state, dets = det.process_chunk(state, frames, whwh, image_hw)
    """

    def __init__(self, model: DiffusionDetArch, params, *,
                 infer_batch: int = 8, sample_step: int = 1,
                 mem_size: int = 900, mem_dis_size: int = 150,
                 num_proposals: int = 300, score_renewal_thresh: float = 0.5,
                 nms_thresh: float = 0.5, use_nms: bool = True,
                 detections_per_img: int = 300,
                 stop_update_after_init: bool = True):
        self.model = model
        self.params = params
        self.infer_batch = infer_batch
        self.sample_step = sample_step
        self.mem_size = mem_size
        self.mem_dis_size = mem_dis_size
        self.num_proposals = num_proposals
        self.schedule = make_schedule()
        self.score_renewal_thresh = score_renewal_thresh
        self.nms_thresh = nms_thresh
        self.use_nms = use_nms
        self.detections_per_img = detections_per_img
        # STOP_UPDATE_AFTER_INIT_TEST (vid_mega.py:13, flagship True):
        # False = keep folding each chunk's top-k features into the memory
        # (the reference's 0/1-per-frame continuous update, vid_mega.py:212-221)
        self.stop_update_after_init = stop_update_after_init

        self._extract = jax.jit(self._extract_chunk)
        self._detect = jax.jit(self._detect_chunk)
        self._fold = jax.jit(self._fold_topk)

    # ---- state ----
    def init_state(self, rng) -> StreamState:
        d = self.model.hidden_dim
        return StreamState(init_memory(self.mem_size, d),
                           init_memory(self.mem_dis_size, d), rng)

    # ---- jitted internals ----
    def _extract_chunk(self, params, frames, whwh, rng):
        """Per-chunk feature extraction: backbone + 3 shared stages at t=999
        on random boxes (diffusion_det.py:436-460).  Returns the cached
        per-frame tuple + top-k condition features."""
        f = frames.shape[0]
        feats = self.model.apply(params, frames, method=DiffusionDetArch.extract_features)
        box_init = jax.random.normal(rng, (f, self.num_proposals, 4))
        boxes = signal_to_boxes(box_init, whwh, self.schedule.scale)
        t = jnp.full((f,), 999, jnp.int32)
        logits, pboxes, pro, k1, k2 = self.model.apply(
            params, feats, boxes, t, method=DiffusionDetArch.extract_proposals)
        return feats, logits, pboxes, pro, k1, k2

    def _detect_chunk(self, params, state: StreamState, frames, whwh):
        """One full detection pass over an INFER_BATCH chunk: extract pass +
        DDIM refinement + post-processing (diffusion_det.py:417-646)."""
        f = frames.shape[0]
        p = self.num_proposals
        sched = self.schedule
        rng, r_extract, r_x, r_loop = jax.random.split(state.rng, 4)

        feats, logits0, boxes0, pro0, k1, k2 = self._extract_chunk(
            params, frames, whwh, r_extract)

        mem_mask = jnp.arange(self.mem_size) < state.mem.count
        # RES_STAGE≥2: the 150-slot distinct memory keys the second global
        # attention stage (box_head.py:367-385 global_kv_[1])
        use_dis = getattr(self.model, "res_stage", 1) >= 2
        mem_dis = state.mem_dis.feats if use_dis else None
        mem_dis_mask = (jnp.arange(self.mem_dis_size) < state.mem_dis.count
                        if use_dis else None)
        # ATTENTION.ENABLE: local-queue top-k features key the local
        # attention chain.  Flagship configs have KEY_FRAME_LOCATION=0 and
        # ALL_FRAME_INTERVAL == INFER_BATCH, so the queue at detect time IS
        # the current chunk — stage 0 keys on its top-75, stage 1 on its
        # top-25 (diffusion_det.py:507-512 proposals_feat/_dis deques).
        local_kv = None
        if getattr(self.model, "local_stages", 0) > 0:
            local_kv = (k1.reshape(-1, k1.shape[-1]),
                        k2.reshape(-1, k2.shape[-1]))

        pairs = ddim_times(sched.num_timesteps, self.sample_step)
        x = jax.random.normal(r_x, (f, p, 4))

        if self.sample_step == 1:
            # ×1: shared stages are cached; one conditioned refinement at
            # t=999 on the cached boxes/features (diffusion_det.py:300-302).
            # Plain DiffusionDet (NUM_HEADS_LOCAL=0) has no conditioned
            # stage — the cached shared-stage outputs are the detections.
            if self.model.num_heads_local == 0:
                logits, pred_boxes = logits0, boxes0
            else:
                t_cond = jnp.full((f,), pairs[0][0], jnp.int32)
                logits, pred_boxes, _ = self.model.apply(
                    params, feats, boxes0, pro0, t_cond, state.mem.feats,
                    mem_mask, mem_dis, mem_dis_mask, local_kv,
                    method=DiffusionDetArch.refine)
            dets = jax.vmap(
                lambda lg, bx: postprocess_frame(
                    lg, bx, (whwh[1], whwh[0]), self.detections_per_img,
                    self.use_nms, self.nms_thresh)
            )(logits, pred_boxes)
        else:
            # ×N: every DDIM step re-runs the full 4-stage stack on the
            # current noisy boxes; detections are ensembled across steps.
            ens_boxes, ens_scores, ens_labels = [], [], []
            for (t_now, t_next) in pairs:
                r_loop, r_noise, r_renew = jax.random.split(r_loop, 3)
                t_cond = jnp.full((f,), t_now, jnp.int32)
                boxes_in = signal_to_boxes(x, whwh, sched.scale)
                logits, pred_boxes, _ = self.model.apply(
                    params, feats, boxes_in, t_cond, state.mem.feats, mem_mask,
                    mem_dis, mem_dis_mask, local_kv,
                    method=DiffusionDetArch.full_forward_test)

                x_start = boxes_to_signal(pred_boxes, whwh, sched.scale)
                eps = predict_noise_from_start(sched, x, t_cond, x_start)

                # Box renewal (diffusion_det.py:559-596): slots whose max
                # class score clears the threshold continue the DDIM chain,
                # the rest restart from fresh noise.
                keep = (jax.nn.sigmoid(logits).max(-1)
                        > self.score_renewal_thresh)[..., None]

                if t_next >= 0:
                    alpha = sched.alphas_cumprod[t_now]
                    alpha_next = sched.alphas_cumprod[t_next]
                    sigma = jnp.sqrt((1 - alpha / alpha_next)
                                     * (1 - alpha_next) / (1 - alpha))
                    c = jnp.sqrt(1 - alpha_next - sigma ** 2)
                    noise = jax.random.normal(r_noise, x.shape)
                    x_upd = (x_start * jnp.sqrt(alpha_next) + c * eps
                             + sigma * noise)
                    fresh = jax.random.normal(r_renew, x.shape)
                    x = jnp.where(keep, x_upd, fresh)
                else:
                    x = x_start

                step_sel = jax.vmap(
                    functools.partial(select_topk_detections,
                                      num_detections=self.detections_per_img)
                )(logits, pred_boxes)
                ens_boxes.append(step_sel[0])
                ens_scores.append(step_sel[1])
                ens_labels.append(step_sel[2])

            dets = jax.vmap(
                lambda bs, ss, ls: postprocess_ensemble(
                    [bs], [ss], [ls], (whwh[1], whwh[0]), self.nms_thresh)
            )(jnp.concatenate(ens_boxes, axis=1),
              jnp.concatenate(ens_scores, axis=1),
              jnp.concatenate(ens_labels, axis=1))

        return StreamState(state.mem, state.mem_dis, rng), dets, (k1, k2)

    # ---- public API ----
    def start_video(self, rng, global_frames, whwh) -> StreamState:
        """Reset state and initialize the global memory from the shuffled
        global frames (diffusion_det.py:389-401, 479-488; GLOBAL.SIZE=24
        with STOP_UPDATE_AFTER_INIT_TEST=True → memory is filled once)."""
        state = self.init_state(rng)
        n = global_frames.shape[0]
        for s in range(0, n, self.infer_batch):
            chunk = global_frames[s: s + self.infer_batch]
            pad = self.infer_batch - chunk.shape[0]
            n_valid = chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.tile(chunk[-1:], (pad, 1, 1, 1))], axis=0)
            state, _rng = self._update_memory(state, chunk, whwh, n_valid)
        return state

    def _update_memory(self, state, chunk, whwh, n_valid):
        rng, r = jax.random.split(state.rng)
        _, _, _, _, k1, k2 = self._extract(self.params, chunk, whwh, r)
        k1_flat = k1.reshape(-1, k1.shape[-1])
        k2_flat = k2.reshape(-1, k2.shape[-1])
        c1 = jnp.asarray(n_valid * k1.shape[1], jnp.int32)
        c2 = jnp.asarray(n_valid * k2.shape[1], jnp.int32)
        # Invalid (padded) frames sit at the tail of the flattened features,
        # so the prefix-count convention holds.
        mem = update_erase_memory(state.mem, k1_flat, c1)
        mem_dis = update_erase_memory(state.mem_dis, k2_flat, c2)
        return StreamState(mem, mem_dis, rng), rng

    def _fold_topk(self, state: StreamState, k1, k2, n_valid):
        mem = update_erase_memory(
            state.mem, k1.reshape(-1, k1.shape[-1]),
            n_valid * k1.shape[1])
        mem_dis = update_erase_memory(
            state.mem_dis, k2.reshape(-1, k2.shape[-1]),
            n_valid * k2.shape[1])
        return StreamState(mem, mem_dis, state.rng)

    def process_chunk(self, state: StreamState, frames, whwh,
                      n_valid: int = None):
        """Detect on one INFER_BATCH chunk of consecutive frames.

        frames [F, H, W, 3] float 0..255 (F == infer_batch; pad the tail
        chunk and ignore the extra outputs); whwh [4] true image size
        (per-video constant — the reference assumes equal sizes within a
        video, diffusion_det.py:529).
        Returns (new_state, BoxArray batch [F, D])."""
        state, dets, topk = self._detect(self.params, state, frames, whwh)
        if not self.stop_update_after_init:
            k1, k2 = topk
            nv = frames.shape[0] if n_valid is None else n_valid
            state = self._fold(state, k1, k2, jnp.asarray(nv, jnp.int32))
        return state, dets
