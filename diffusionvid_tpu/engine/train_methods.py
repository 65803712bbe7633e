"""Training steps for the classic / MEGA-family meta-architectures.

The flagship DiffusionVID trainer lives in engine/train.py; this module
gives every other VID.METHOD a loss + optimizer step with the same
``TrainBatch``/``TrainState`` plumbing, mirroring the reference's single
``do_train`` loop that works for all detectors because each model returns
a loss dict (``mega_core/engine/trainer.py:43-146``,
``generalized_rcnn_{dff,fgfa,rdn,mega}.py`` train forwards,
``sparse_rcnn_dafa.py:247``).

Batch layout: ``TrainBatch.images`` is [S, B, H, W, 3] with
B = 1 cur + num_local + num_mem + num_global frames, in that order
(``data/sampling.MethodSampleSpec``).  Only the cur frame's GT feeds the
classic losses, as in the reference wrappers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data.sampling import MethodSampleSpec
from .train import TrainBatch, TrainState


def make_method_loss_fn(model, spec: MethodSampleSpec):
    """(params, batch, rng) → (total, metrics) for one VID.METHOD."""
    m = spec.method
    l, me, g = spec.num_local, spec.num_mem, spec.num_global

    def sample_loss(params, images, gt_boxes, gt_labels, gt_valid, whwh, rng):
        hw = (whwh[1], whwh[0])
        v = {"params": params}
        cur = images[:1]
        rngs = {"sampler": rng}
        if m == "base":
            losses = model.apply(v, cur, hw, gt_boxes[:1], gt_labels[:1],
                                 gt_valid[:1], train=True, rngs=rngs)
        elif m == "dff":
            losses = model.apply(v, cur, images[1:2], hw, gt_boxes[:1],
                                 gt_labels[:1], gt_valid[:1],
                                 method=type(model).train_loss, rngs=rngs)
        elif m == "fgfa":
            losses = model.apply(v, cur, images[1:1 + l], hw, gt_boxes[:1],
                                 gt_labels[:1], gt_valid[:1],
                                 method=type(model).train_loss, rngs=rngs)
        elif m == "rdn":
            losses = model.apply(v, cur, images[1:1 + l], hw, gt_boxes[0],
                                 gt_labels[0], gt_valid[0],
                                 method=type(model).train_loss, rngs=rngs)
        elif m == "mega":
            losses = model.apply(
                v, cur, images[1:1 + l], images[1 + l:1 + l + me],
                images[1 + l + me:1 + l + me + g], hw,
                gt_boxes[0], gt_labels[0], gt_valid[0],
                method=type(model).train_loss_mega, rngs=rngs)
        elif m == "dafa":
            losses = model.apply(
                v, cur, images[1 + l + me:1 + l + me + g], whwh,
                gt_boxes[:1], gt_labels[:1], gt_valid[:1],
                method=type(model).train_loss, rngs=rngs)
        else:
            raise ValueError(f"no train step for method {m}")
        if m == "dafa":
            total = losses.pop("total_loss_stages")
        else:
            total = sum(jnp.asarray(x) for x in losses.values())
        return total, losses

    def loss_fn(params, batch: TrainBatch, rng):
        s = batch.images.shape[0]
        rngs = jax.random.split(rng, s)
        totals, losses = jax.vmap(sample_loss,
                                  in_axes=(None, 0, 0, 0, 0, 0, 0))(
            params, batch.images, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid, batch.whwh, rngs)
        return jnp.mean(totals), jax.tree.map(jnp.mean, losses)

    return loss_fn


def make_method_train_step(model, tx, spec: MethodSampleSpec):
    loss_fn = make_method_loss_fn(model, spec)

    def train_step(state: TrainState, batch: TrainBatch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
