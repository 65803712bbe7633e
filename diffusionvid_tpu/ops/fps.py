"""Farthest-point sampling (FPS) — the DiffusionVID diversity-memory core.

Replaces the reference CUDA kernel (``mega_core/csrc/cuda/fps.cu``, wrapper
``mega_core/layers/fps.py``) used by ``select_farthest_k_greedy_cuda``
(``diffusion_det.py:869-896``) to keep the global proposal-feature memory
maximally diverse.

Semantics match the CUDA kernel: start from index 0, then greedily pick the
point with the largest min-distance to the already-selected set, k times
(index 0 is re-emitted as the first pick).  Here the running min-distance
vector is carried through a ``lax.fori_loop`` with fixed trip count — O(k·N)
vector ops, fully static shapes, one jit.  Invalid (padding) rows are
excluded via a mask instead of ragged inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_l2_distance(feats, eps: float = 1e-12):
    """[N, N] L2 distance matrix (reference: torch.cdist p=2,
    diffusion_det.py:880)."""
    sq = jnp.sum(feats * feats, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * feats @ feats.T
    return jnp.sqrt(jnp.clip(d2, eps))


def farthest_point_sample(distance, k: int, valid=None):
    """Greedy max-min-distance selection.

    Args:
      distance: [N, N] pairwise distances.
      k: number of indices to select (static).
      valid: optional [N] bool; invalid rows are never selected.

    Returns [k] int32 indices.
    """
    n = distance.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)

    # Running min distance to the selected set; invalid rows pinned to -1 so
    # argmax never picks them (the CUDA kernel's `temp` buffer, fps.cu).
    big = jnp.asarray(1e10, distance.dtype)
    temp0 = jnp.where(valid, big, -1.0)

    def body(j, carry):
        temp, last, out = carry
        d = distance[last]
        temp = jnp.where(valid, jnp.minimum(temp, d), -1.0)
        nxt = jnp.argmax(temp).astype(jnp.int32)
        out = out.at[j].set(nxt)
        return temp, nxt, out

    out0 = jnp.zeros((k,), jnp.int32)
    first = jnp.asarray(0, jnp.int32)
    out0 = out0.at[0].set(first)
    _, _, out = jax.lax.fori_loop(1, k, body, (temp0, first, out0))
    return out


def select_farthest_k_greedy(feats, k: int, valid=None):
    """Feature-space FPS: L2 distances then greedy selection
    (reference ``select_farthest_k_greedy_cuda``, diffusion_det.py:869-896)."""
    return farthest_point_sample(pairwise_l2_distance(feats), k, valid=valid)
