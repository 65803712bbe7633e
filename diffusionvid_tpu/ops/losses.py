"""Loss primitives — pure jnp.

Replaces the reference's CUDA SigmoidFocalLoss
(``mega_core/csrc/cuda/SigmoidFocalLoss_cuda.cu``) and the fvcore
``sigmoid_focal_loss_jit`` used by the DiffusionDet criterion
(``box_head/loss.py:16,369``), plus ``smooth_l1_loss``
(``mega_core/layers/smooth_l1_loss.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss (fvcore semantics: targets are {0,1} one-hot).

    FL = -alpha_t (1 - p_t)^gamma log(p_t); returns same shape as logits.
    """
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable binary CE with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1_loss(pred, target, beta: float = 1.0 / 9):
    """Elementwise smooth L1 (mega_core/layers/smooth_l1_loss.py semantics)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
