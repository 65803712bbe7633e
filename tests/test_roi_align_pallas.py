"""Pallas ROIAlign kernel vs the gather formulation (interpreter mode —
the real kernel is exercised on TPU by bench.py and the TPU test run)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.ops.roi_align import multilevel_roi_align
from diffusionvid_tpu.ops.roi_align_pallas import multilevel_roi_align_mxu, _band_params


def test_band_params_interior_and_border():
    coords = jnp.asarray([[2.3, -0.4, 7.6, -1.5, 9.0]])
    sizes = jnp.asarray([[8.0]])
    lo, w0, w1 = _band_params(coords, sizes)
    lo, w0, w1 = np.asarray(lo[0]), np.asarray(w0[0]), np.asarray(w1[0])
    # interior: band [2,3], weights (0.7, 0.3)
    assert lo[0] == 2 and abs(w0[0] - 0.7) < 1e-5 and abs(w1[0] - 0.3) < 1e-5
    # -0.4 is inside (-1, 8): clamps to 0 → full weight on slot 0
    assert lo[1] == 0 and abs(w0[1] - 1.0) < 1e-5 and abs(w1[1]) < 1e-5
    # 7.6 → low=7=size-1: band shifts to [6,7], weight on slot 1
    assert lo[2] == 6 and abs(w0[2]) < 1e-5 and abs(w1[2] - 1.0) < 1e-5
    # -1.5 and 9.0 are outside → zero weights
    assert w0[3] == w1[3] == 0.0
    assert w0[4] == w1[4] == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("version", [1, 2, 3, 4])
def test_kernel_matches_gather_interpreted(version):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    f, p_, d = 2, 50, 256
    feats = [jnp.asarray(rng.randn(f, 16, 24, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 8, 12, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 4, 6, d).astype(np.float32))]
    scales = (1 / 8, 1 / 16, 1 / 32)
    boxes = rng.uniform(0, 100, (f, p_, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(10, 120, (f, p_, 2))
    boxes = jnp.asarray(boxes)

    ref = multilevel_roi_align(feats, boxes, scales)
    with pltpu.force_tpu_interpret_mode():
        got = multilevel_roi_align_mxu(feats, boxes, scales, roi_block=25,
                                       version=version)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("version", [2, 3, 4])
def test_kernel_windowed_ypass_matches_gather_interpreted(version):
    """Maps wider than the x-window (W3=96 > 64) exercise the narrow
    window branches; wide-aspect boxes take the full-row fallback."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(1)
    f, p_, d = 1, 50, 256
    feats = [jnp.asarray(rng.randn(f, 64, 96, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 32, 48, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 16, 24, d).astype(np.float32))]
    scales = (1 / 8, 1 / 16, 1 / 32)
    # mix: small boxes (narrow windows), huge-aspect boxes (span > 55 at
    # p3 -> full-row fallback), boxes at the right edge (xb clipping)
    boxes = rng.uniform(0, 400, (f, p_, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 80, (f, p_, 2))
    boxes[0, :5, 0] = 0.0
    boxes[0, :5, 2] = 700.0          # span ~87 cols at p3 -> fallback
    boxes[0, :5, 1] = 100.0
    boxes[0, :5, 3] = 120.0
    boxes[0, 5:8, 0] = 650.0         # right edge -> window base clipped
    boxes[0, 5:8, 2] = 760.0
    boxes = jnp.asarray(boxes)

    ref = multilevel_roi_align(feats, boxes, scales)
    with pltpu.force_tpu_interpret_mode():
        got = multilevel_roi_align_mxu(feats, boxes, scales, roi_block=25,
                                       version=version)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("version", [3, 4])
def test_kernel_flat_matches_gather_interpreted(version):
    """flat=True returns a FLAT [B, R, 49, C] tile in row-major (py, px)
    order — the torch flatten order — for every kernel version (v4 emits
    it natively; v3 permutes its px-major store order in XLA)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(2)
    f, p_, d = 1, 50, 256
    feats = [jnp.asarray(rng.randn(f, 64, 96, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 32, 48, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 16, 24, d).astype(np.float32))]
    scales = (1 / 8, 1 / 16, 1 / 32)
    boxes = rng.uniform(0, 400, (f, p_, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 80, (f, p_, 2))
    boxes = jnp.asarray(boxes)

    ref = multilevel_roi_align(feats, boxes, scales)      # [B, R, 7, 7, C]
    ref_flat = np.asarray(ref).reshape(f, p_, 49, d)      # row-major
    with pltpu.force_tpu_interpret_mode():
        got = multilevel_roi_align_mxu(feats, boxes, scales, roi_block=25,
                                       flat=True, version=version)
    assert got.shape == (f, p_, 49, d)
    np.testing.assert_allclose(np.asarray(got), ref_flat,
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_bwd_kernel_matches_gather_vjp_interpreted():
    """The banded-transpose backward kernel must produce the same feature
    gradients as the gather formulation's autodiff transpose, for a
    row-major flat cotangent over mixed-level, border-crossing ROIs."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from diffusionvid_tpu.ops.roi_align_pallas import (
        multilevel_roi_align_bwd_mxu)

    rng = np.random.RandomState(4)
    f, p_, d = 2, 50, 64
    feats = [jnp.asarray(rng.randn(f, 64, 96, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 32, 48, d).astype(np.float32)),
             jnp.asarray(rng.randn(f, 16, 24, d).astype(np.float32))]
    scales = (1 / 8, 1 / 16, 1 / 32)
    boxes = rng.uniform(-40, 760, (f, p_, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(4, 400, (f, p_, 2))
    boxes = jnp.asarray(boxes)
    g = jnp.asarray(rng.randn(f, p_, 49, d).astype(np.float32))

    # reference: vjp of the gather formulation, cotangent in y-major 5D
    # (the flat contract is row-major, so the reshape alone is the map)
    g5 = g.reshape(f, p_, 7, 7, d)
    _, vjp = jax.vjp(
        lambda fs: multilevel_roi_align(list(fs), boxes, scales), feats)
    (ref,) = vjp(g5)

    with pltpu.force_tpu_interpret_mode():
        got = multilevel_roi_align_bwd_mxu(
            g, boxes, [(64, 96), (32, 48), (16, 24)], scales)

    for lvl, (gr, rr) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(rr),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"level {lvl}")


@pytest.mark.slow
def test_custom_vjp_kernel_backward_wiring(monkeypatch):
    """The flat backward routes through the banded kernel by default
    (promoted after the round-3 real-chip adjudication: 184.8 vs 238.6
    ms/step); gradients must match the gather-transpose route
    (DIFFUSIONVID_ROI_BWD_KERNEL=0 kill switch)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from diffusionvid_tpu.ops.roi_align import _pallas_roi_align_diff

    rng = np.random.RandomState(5)
    f, p_, d = 1, 25, 32
    feats = tuple(jnp.asarray(rng.randn(*s).astype(np.float32))
                  for s in [(f, 32, 48, d), (f, 16, 24, d), (f, 8, 12, d)])
    scales = (1 / 8, 1 / 16, 1 / 32)
    boxes = rng.uniform(0, 200, (f, p_, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 120, (f, p_, 2))
    boxes = jnp.asarray(boxes)

    def loss(fs):
        out = _pallas_roi_align_diff(fs, boxes, scales, 7, 2, True)
        return jnp.sum(out * out)

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("DIFFUSIONVID_ROI_BWD_KERNEL", "0")
        ref = jax.grad(loss)(feats)
        monkeypatch.setenv("DIFFUSIONVID_ROI_BWD_KERNEL", "1")
        got = jax.grad(loss)(feats)
    for lvl, (gr, rr) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(rr),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"level {lvl}")
