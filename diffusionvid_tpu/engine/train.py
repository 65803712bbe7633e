"""Training step + solver.

Replaces the reference trainer/solver stack
(``mega_core/engine/trainer.py:43-248``, ``mega_core/solver/build.py``):

  * per-group learning rates — backbone ×BACKBONE_MULTIPLIER, bias
    LR/WD factors (solver/build.py:16-40) — via optax.multi_transform;
  * AdamW or SGD, full-model grad-norm clip 1.0 (CLIP_GRADIENTS,
    diffusion_det config);
  * WarmupMultiStep or cosine LR schedule (solver/lr_scheduler.py:10-53);
  * apex-AMP fp16 → native bf16 compute dtype (params fp32 throughout);
  * DDP gradient all-reduce → ``psum`` over the data-parallel mesh axis
    (inserted automatically by jit+sharding; see parallel/mesh.py);
  * gradient accumulation (ACCUMULATION_STEPS, trainer.py:139-146) via
    optax.MultiSteps.

The train batch is a static-shape pytree: images [B,H,W,3] (B = 1 cur +
num_global ref frames, each with its own GT — diffusion_det.py:338-348),
padded GT arrays + validity masks.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.criterion import set_criterion
from ..models.diffusion_det import (
    DiffusionDetArch, make_schedule, prepare_diffusion_targets,
)


class TrainBatch(NamedTuple):
    """One batch of S samples; each sample is B frames (1 cur + num_global
    refs, each with its own GT — diffusion_det.py:338-348).  S is the
    data-parallel axis (the reference's DDP rank axis)."""

    images: jnp.ndarray     # [S, B, H, W, 3] float 0..255
    gt_boxes: jnp.ndarray   # [S, B, G, 4] absolute xyxy
    gt_labels: jnp.ndarray  # [S, B, G] int32 in 1..K (0 = pad)
    gt_valid: jnp.ndarray   # [S, B, G] bool
    whwh: jnp.ndarray       # [S, 4] (w, h, w, h) true image size


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def warmup_multistep_schedule(base_lr: float, steps, gamma: float = 0.1,
                              warmup_iters: int = 500,
                              warmup_factor: float = 1.0 / 3):
    """WarmupMultiStepLR (solver/lr_scheduler.py:10-53): linear warmup then
    step decay at the given iteration milestones."""
    boundaries = {int(s): gamma for s in steps}
    decay = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(count):
        warm = jnp.where(
            count < warmup_iters,
            warmup_factor + (1 - warmup_factor) * count / max(warmup_iters, 1),
            1.0)
        return decay(count) * warm

    return schedule


def warmup_cosine_schedule(base_lr: float, max_iter: int,
                           warmup_iters: int = 500,
                           warmup_factor: float = 1.0 / 3,
                           min_lr_ratio: float = 0.0):
    """Cosine decay with linear warmup (the reference's timm
    CosineLRScheduler path, solver/build.py:61-70)."""
    import jax.numpy as _jnp

    def schedule(count):
        warm = _jnp.where(
            count < warmup_iters,
            warmup_factor + (1 - warmup_factor) * count / max(warmup_iters, 1),
            1.0)
        prog = _jnp.clip((count - warmup_iters)
                         / max(max_iter - warmup_iters, 1), 0.0, 1.0)
        cos = min_lr_ratio + (1 - min_lr_ratio) * 0.5 * (
            1.0 + _jnp.cos(_jnp.pi * prog))
        return base_lr * warm * cos

    return schedule


def _param_label(path) -> str:
    keys = [getattr(k, "key", str(k)) for k in path]
    top = keys[0] if keys else ""
    leaf = keys[-1] if keys else ""
    is_backbone = top == "backbone"
    is_bias = leaf in ("bias", "in_proj_bias", "class_logits_bias")
    is_frozen_stat = leaf in ("running_mean", "running_var")
    if is_frozen_stat:
        return "frozen"
    if is_backbone:
        return "backbone_bias" if is_bias else "backbone"
    return "bias" if is_bias else "main"


def make_optimizer(params, *, base_lr: float = 1e-4, steps=(80000, 120000),
                   gamma: float = 0.1, warmup_iters: int = 1000,
                   warmup_factor: float = 0.01, weight_decay: float = 1e-4,
                   weight_decay_bias: float = 1e-4,
                   backbone_multiplier: float = 0.1,
                   bias_lr_factor: float = 1.0, clip_norm: float = 1.0,
                   optimizer_type: str = "adamw", momentum: float = 0.9,
                   accumulation_steps: int = 1,
                   lr_scheduler_type: str = "step", max_iter: int = 130000):
    """Per-group optimizer mirroring make_optimizer (solver/build.py:9-58)."""
    labels = jax.tree_util.tree_map_with_path(lambda p, _: _param_label(p), params)

    def group(lr_mult, wd):
        if lr_scheduler_type == "cosine":
            sched = warmup_cosine_schedule(base_lr * lr_mult, max_iter,
                                           warmup_iters, warmup_factor)
        else:
            sched = warmup_multistep_schedule(base_lr * lr_mult, steps, gamma,
                                              warmup_iters, warmup_factor)
        if optimizer_type == "adamw":
            tx = optax.adamw(sched, weight_decay=wd)
        else:
            tx = optax.chain(optax.add_decayed_weights(wd), optax.sgd(sched, momentum=momentum))
        return tx

    tx = optax.multi_transform(
        {
            "main": group(1.0, weight_decay),
            "bias": group(bias_lr_factor, weight_decay_bias),
            "backbone": group(backbone_multiplier, weight_decay),
            "backbone_bias": group(backbone_multiplier * bias_lr_factor, weight_decay_bias),
            "frozen": optax.set_to_zero(),
        },
        labels)
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


def make_loss_fn(model: DiffusionDetArch, num_global: int,
                 class_weight: float = 2.0, l1_weight: float = 5.0,
                 giou_weight: float = 2.0):
    sched = make_schedule()
    p = model.num_proposals
    k = model.num_classes

    def sample_loss(params, images, gt_boxes, gt_labels, gt_valid, whwh, rng):
        """Loss of ONE sample (B frames sharing one head pass).  ``params``
        is the inner parameter tree (variables["params"])."""
        r_noise, r_cfg = jax.random.split(rng)
        whwh_b = jnp.tile(whwh[None], (images.shape[0], 1))
        noisy_boxes, t = prepare_diffusion_targets(
            r_noise, sched, gt_boxes, gt_valid, whwh_b, p)
        logits, boxes = model.apply({"params": params}, images, noisy_boxes, t,
                                    num_global=num_global, train=True,
                                    rngs={"cfg": r_cfg})
        # ATTENTION.ENABLE training slices every stage's outputs to the
        # local frames (box_head.py:429-431) — pair the targets with the
        # frames the head actually returned (nl == B when local attention
        # is off, so this is a no-op on the flagship path)
        nl = logits.shape[1]
        total, losses = set_criterion(
            logits, boxes, gt_labels[:nl], gt_boxes[:nl], gt_valid[:nl],
            whwh_b[:nl], k, class_weight=class_weight, l1_weight=l1_weight,
            giou_weight=giou_weight)
        return total, losses

    def loss_fn(params, batch: TrainBatch, rng):
        s = batch.images.shape[0]
        rngs = jax.random.split(rng, s)
        totals, losses = jax.vmap(sample_loss, in_axes=(None, 0, 0, 0, 0, 0, 0))(
            params, batch.images, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid, batch.whwh, rngs)
        return jnp.mean(totals), jax.tree.map(jnp.mean, losses)

    return loss_fn


def make_train_step(model: DiffusionDetArch, tx, num_global: int, **loss_kw):
    """One optimizer step.  Under a data-parallel mesh the gradient psum is
    inserted by XLA from the sharding annotations (batch sharded on 'dp',
    params replicated) — the NCCL-DDP analogue with zero user code."""
    loss_fn = make_loss_fn(model, num_global, **loss_kw)

    def train_step(state: TrainState, batch: TrainBatch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
