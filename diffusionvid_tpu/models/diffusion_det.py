"""DiffusionDet / DiffusionVID meta-architecture — TPU-native.

Functional re-design of the reference ``DiffusionDet`` module
(``mega_core/modeling/detector/diffusion_det.py:188-896``):

  * cosine beta schedule, 1000 timesteps, DDIM sampling, pred_x0 objective,
    signal scale 2.0 (diffusion_det.py:50-61, 222-267);
  * training: GT boxes padded/trimmed to 300 with ~N(0.5, 1/6) placeholder
    boxes, q_sample noising, clamp to ±scale (prepare_diffusion_concat,
    diffusion_det.py:690-725);
  * ``model_predictions`` coordinate round-trip: signal space [-s, s] ↔
    cxcywh in [0,1] ↔ absolute xyxy (diffusion_det.py:655-677).

Unlike the reference, the schedule is a pytree of constants captured by the
jitted step functions — no buffers, no CPU float64 bounce inside the loop
(the reference moves alphas to CPU per DDIM step, diffusion_det.py:578-584).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .fpn import FPN
from .heads import DynamicHead
from .resnet import ResNet
from ..structures.boxes import cxcywh_to_xyxy, xyxy_to_cxcywh


# --------------------------------------------------------------------------
# Diffusion schedule (pure numpy at setup, jnp constants afterwards)
# --------------------------------------------------------------------------

class DiffusionSchedule(NamedTuple):
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    num_timesteps: int
    scale: float


def cosine_beta_schedule(timesteps: int = 1000, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (diffusion_det.py:50-61), float64."""
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


def make_schedule(timesteps: int = 1000, scale: float = 2.0) -> DiffusionSchedule:
    # derive every buffer in float64 and cast at the end (the reference
    # registers float64-computed buffers that only become fp32 on .float();
    # computing 1/ac - 1 directly in fp32 loses ~3 digits at small t)
    betas = cosine_beta_schedule(timesteps)
    ac = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(ac),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - ac)),
        sqrt_recip_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / ac - 1.0)),
        num_timesteps=timesteps,
        scale=scale,
    )


def ddim_times(num_timesteps: int, sampling_steps: int):
    """[(T-1 → next), ...] time pairs (diffusion_det.py:536-539)."""
    times = np.linspace(-1, num_timesteps - 1, sampling_steps + 1).astype(int)
    times = list(reversed(times.tolist()))
    return list(zip(times[:-1], times[1:]))


# --------------------------------------------------------------------------
# Signal-space ↔ box-space transforms
# --------------------------------------------------------------------------

def signal_to_boxes(x, whwh, scale: float):
    """Clamp to ±scale, map to [0,1] cxcywh, convert to absolute xyxy
    (model_predictions head input, diffusion_det.py:656-660)."""
    x = jnp.clip(x, -scale, scale)
    x = ((x / scale) + 1.0) / 2.0
    return cxcywh_to_xyxy(x) * whwh[..., None, :]


def boxes_to_signal(boxes_xyxy, whwh, scale: float):
    """Absolute xyxy → clamped signal space (diffusion_det.py:668-672)."""
    x = xyxy_to_cxcywh(boxes_xyxy / whwh[..., None, :])
    return jnp.clip((x * 2.0 - 1.0) * scale, -scale, scale)


def predict_noise_from_start(sched: DiffusionSchedule, x_t, t, x0):
    """ε̂ = (√(1/ᾱt)·x_t − x0) / √(1/ᾱt − 1) (diffusion_det.py:649-653)."""
    c1 = sched.sqrt_recip_alphas_cumprod[t][..., None, None]
    c2 = sched.sqrt_recipm1_alphas_cumprod[t][..., None, None]
    return (c1 * x_t - x0) / c2


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    c1 = sched.sqrt_alphas_cumprod[t][..., None, None]
    c2 = sched.sqrt_one_minus_alphas_cumprod[t][..., None, None]
    return c1 * x_start + c2 * noise


def prepare_diffusion_targets(rng, sched: DiffusionSchedule, gt_boxes_xyxy,
                              gt_valid, whwh, num_proposals: int):
    """Per-image noisy training boxes (prepare_diffusion_concat,
    diffusion_det.py:690-725), fully static-shape.

    gt_boxes_xyxy [B, G, 4] absolute; gt_valid [B, G]; whwh [B, 4].
    Returns (noisy absolute xyxy boxes [B, P, 4], t [B]).
    """
    b, g, _ = gt_boxes_xyxy.shape
    p = num_proposals
    r_t, r_noise, r_place, r_shuffle = jax.random.split(rng, 4)

    t = jax.random.randint(r_t, (b,), 0, sched.num_timesteps)
    noise = jax.random.normal(r_noise, (b, p, 4))

    # Normalized cxcywh GT; empty images fall back to a full-image box
    # (diffusion_det.py:699-701).
    gt_norm = xyxy_to_cxcywh(gt_boxes_xyxy / whwh[:, None, :])
    any_gt = jnp.any(gt_valid, axis=1)
    fake = jnp.asarray([0.5, 0.5, 1.0, 1.0])
    gt0_valid = gt_valid.at[:, 0].set(gt_valid[:, 0] | ~any_gt)
    gt_norm = gt_norm.at[:, 0, :].set(
        jnp.where(any_gt[:, None], gt_norm[:, 0, :], fake))

    # Placeholder boxes ~ N(0.5, 1/6), wh clipped ≥1e-4 (diffusion_det:704-706).
    place = jax.random.normal(r_place, (b, p, 4)) / 6.0 + 0.5
    place = place.at[..., 2:].set(jnp.clip(place[..., 2:], 1e-4))

    # Static scatter: slot i takes GT i when valid.  When G > P the first
    # P GT slots are used (the reference subsamples a random P-subset when
    # num_gt > num_proposals, diffusion_det.py:708-711).
    ge = min(g, p)
    x_start = place.at[:, :ge, :].set(
        jnp.where(gt0_valid[:, :ge, None], gt_norm[:, :ge], place[:, :ge, :]))

    x_start = (x_start * 2.0 - 1.0) * sched.scale
    x = q_sample(sched, x_start, t, noise)
    boxes = signal_to_boxes(x, whwh, sched.scale)
    return boxes, t


# --------------------------------------------------------------------------
# The model: backbone + FPN + DynamicHead in one parameter tree
# --------------------------------------------------------------------------

class DiffusionDetArch(nn.Module):
    """Backbone + FPN + decoder with jit-friendly sub-entrypoints.

    Construct via ``from_config``.  ``in_strides`` are the FPN levels fed to
    the head (flagship: p3/p4/p5 → strides 8/16/32,
    configs/vid_R_101_DiffusionVID.yaml:16-17).
    """

    depth: int = 101
    num_classes: int = 30
    num_proposals: int = 300
    hidden_dim: int = 256
    num_heads: int = 3
    num_heads_local: int = 1
    res_stage: int = 1              # VID.MEGA.GLOBAL.RES_STAGE
    local_stages: int = 0           # VID.ROI_BOX_HEAD.ATTENTION.ENABLE/STAGE
    global_enable: bool = True      # VID.MEGA.GLOBAL.ENABLE
    backbone_type: str = "resnet"   # "resnet" | "swin"
    swin_size: str = "B-22k"
    fpn_in: Sequence[str] = ("res3", "res4", "res5")
    head_levels: Sequence[str] = ("p3", "p4", "p5")
    pixel_mean: Sequence[float] = (123.675, 116.280, 103.530)
    pixel_std: Sequence[float] = (58.395, 57.120, 57.375)
    compute_dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=None):
        dd = cfg.MODEL.DiffusionDet
        is_swin = "swin" in cfg.MODEL.BACKBONE.NAME.lower()
        return cls(
            depth=cfg.MODEL.RESNETS.DEPTH,
            num_classes=dd.NUM_CLASSES,
            num_proposals=dd.NUM_PROPOSALS,
            hidden_dim=dd.HIDDEN_DIM,
            num_heads=dd.NUM_HEADS,
            num_heads_local=dd.NUM_HEADS_LOCAL,
            res_stage=cfg.MODEL.VID.MEGA.GLOBAL.RES_STAGE,
            local_stages=(cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE
                          if cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.ENABLE
                          else 0),
            global_enable=bool(cfg.MODEL.VID.MEGA.GLOBAL.ENABLE),
            backbone_type="swin" if is_swin else "resnet",
            swin_size=cfg.MODEL.SWIN.SIZE if is_swin else "B-22k",
            fpn_in=tuple(cfg.MODEL.FPN.IN_FEATURES),
            head_levels=tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            compute_dtype=dtype if dtype is not None else
            (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32),
        )

    def setup(self):
        if self.backbone_type == "swin":
            from .swin import SwinTransformer
            out_idx = tuple(sorted(int(k[4:]) for k in self.fpn_in))
            self.backbone = SwinTransformer.from_size(
                self.swin_size, out_indices=out_idx,
                dtype=self.compute_dtype)
        else:
            self.backbone = ResNet(depth=self.depth, out_features=self.fpn_in,
                                   dtype=self.compute_dtype, name="backbone")
        self.fpn = FPN(in_features=self.fpn_in, out_channels=self.hidden_dim,
                       dtype=self.compute_dtype, name="fpn")
        # top-k clamped to the proposal count (box_head.py:235-236).
        k1 = min(75, self.num_proposals)
        k2 = min(25, self.num_proposals)
        self.head = DynamicHead(
            num_classes=self.num_classes, d_model=self.hidden_dim,
            num_heads=self.num_heads, num_heads_local=self.num_heads_local,
            global_stages=self.res_stage, local_stages=self.local_stages,
            global_enable=self.global_enable,
            top_k=(k1, k2), dtype=self.compute_dtype, name="head")

    @property
    def spatial_scales(self):
        return tuple(1.0 / (2 ** int(l[1:])) for l in self.head_levels)

    def normalize(self, images):
        mean = jnp.asarray(self.pixel_mean)
        std = jnp.asarray(self.pixel_std)
        if self.backbone_type == "swin" and images.shape[2] % 4 == 0:
            # same trick for the Swin patch embed: its 4×4/s4 conv aligns
            # exactly with a W-pack-4 view (one group per output column),
            # lifting stem lane utilization 3/128 → 12/128 with identical
            # arithmetic (swin.py:SwinTransformer, cin == 12).
            b, h, w, c = images.shape
            images = images.reshape(b, h, w // 4, 4 * c)
            mean = jnp.tile(mean, 4)
            std = jnp.tile(std, 4)
        elif self.backbone_type != "swin" and images.shape[2] % 2 == 0:
            # W-only space-to-depth view BEFORE the normalize so the
            # stem's packed layout is produced by the normalize fusion
            # itself: with the reshape after it, XLA materialized a
            # separate 60 MB relayout copy of the packed view
            # (round-5 profile: copy.4150, 0.87 ms/chunk at 69 GB/s).
            # Identical arithmetic — the (w, c) pair is adjacent in
            # memory, and mean/std just tile ×2.  StemConv consumes the
            # packed form directly (resnet.py:StemConv, cin == 6).
            b, h, w, c = images.shape
            images = images.reshape(b, h, w // 2, 2 * c)
            mean = jnp.tile(mean, 2)
            std = jnp.tile(std, 2)
        return ((images - mean) / std).astype(self.compute_dtype)

    def features(self, images):
        """images [B,H,W,3] in 0..255 → list of head-level FPN maps."""
        pyr = self.fpn(self.backbone(self.normalize(images)))
        return [pyr[l] for l in self.head_levels]

    def __call__(self, images, noisy_boxes, t, num_global: int,
                 train: bool = True):
        """Training forward: one head pass over all frames
        (diffusion_det.py:338-375).  Returns ([S,B,N,K], [S,B,N,4])."""
        feats = self.features(images)
        logits, boxes = self.head(feats, self.spatial_scales, noisy_boxes, t,
                                  num_global=num_global, train=train)
        return logits.astype(jnp.float32), boxes.astype(jnp.float32)

    # ---- streaming-inference sub-entrypoints ----
    def extract_features(self, images):
        return self.features(images)

    def extract_proposals(self, feats, boxes_init, t):
        """Shared stages + top-k on ready-made FPN maps (the per-chunk
        feature-extraction pass, diffusion_det.py:436-460)."""
        inter_logits, inter_boxes, pro_features, _ = self.head.shared_stages(
            feats, self.spatial_scales, boxes_init, t)
        k1, k2 = self.head.topk_features(inter_logits[-1], pro_features)
        return (inter_logits[-1].astype(jnp.float32),
                inter_boxes[-1].astype(jnp.float32), pro_features, k1, k2)

    def refine(self, feats, bboxes, pro_features, t, memory, memory_mask,
               memory_dis=None, memory_dis_mask=None,
               local_kv=None, local_kv_mask=None):
        """Global cross-attention + conditioned stage (one DDIM model call
        on the current batch, diffusion_det.py:551-557 + box_head.py:319-424).
        With NUM_HEADS_LOCAL=0 (plain DiffusionDet) the cached shared-stage
        outputs ARE the detections — callers should use full_forward_test.
        RES_STAGE≥2 additionally consumes the 150-slot distinct memory;
        ``local_kv`` is the ATTENTION.ENABLE local-queue top-k features
        (diffusion_det.py:512)."""
        logits, boxes, pro = self.head.condition(
            feats, self.spatial_scales, bboxes, pro_features, t,
            memory, memory_mask, train=False,
            memory_dis=memory_dis, memory_dis_mask=memory_dis_mask,
            local_kv=local_kv, local_kv_mask=local_kv_mask)
        return logits[-1].astype(jnp.float32), boxes[-1].astype(jnp.float32), pro

    def full_forward_test(self, feats, bboxes, t, memory, memory_mask,
                          memory_dis=None, memory_dis_mask=None,
                          local_kv=None, local_kv_mask=None):
        """Full stack at test time (multi-step DDIM re-runs the shared
        stages each step — box_head.py:286-299 with sampling_timesteps>1,
        then the conditioned path when NUM_HEADS_LOCAL > 0)."""
        inter_logits, inter_boxes, pro_features, _ = self.head.shared_stages(
            feats, self.spatial_scales, bboxes, t)
        if self.num_heads_local == 0:
            return (inter_logits[-1].astype(jnp.float32),
                    inter_boxes[-1].astype(jnp.float32), pro_features)
        last_boxes = inter_boxes[-1]
        logits, boxes, pro = self.head.condition(
            feats, self.spatial_scales, last_boxes, pro_features, t,
            memory, memory_mask, train=False,
            memory_dis=memory_dis, memory_dis_mask=memory_dis_mask,
            local_kv=local_kv, local_kv_mask=local_kv_mask)
        return logits[-1].astype(jnp.float32), boxes[-1].astype(jnp.float32), pro
