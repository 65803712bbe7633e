"""ROIAlign numerics vs an independent numpy oracle implementing the
CUDA kernel's documented semantics (ROIAlign_cuda.cu: aligned offset,
per-sample bilinear with zero-outside-(-1,size) borders, mean over the
sampling grid)."""

import numpy as np
import jax.numpy as jnp

from diffusionvid_tpu.ops import roi_align, multilevel_roi_align, fpn_level_assignment


def np_roi_align(feat_hwc, roi, scale, p, sr, aligned=True):
    h, w, c = feat_hwc.shape
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = [v * scale - off for v in roi]
    rw, rh = x2 - x1, y2 - y1
    if not aligned:
        rw, rh = max(rw, 1.0), max(rh, 1.0)
    bh, bw = rh / p, rw / p
    out = np.zeros((p, p, c), np.float64)
    for py in range(p):
        for px in range(p):
            acc = np.zeros(c, np.float64)
            for sy in range(sr):
                for sx in range(sr):
                    y = y1 + (py + (sy + 0.5) / sr) * bh
                    x = x1 + (px + (sx + 0.5) / sr) * bw
                    if y < -1.0 or y > h or x < -1.0 or x > w:
                        continue
                    y = min(max(y, 0.0), h - 1)
                    x = min(max(x, 0.0), w - 1)
                    y0, x0 = int(np.floor(y)), int(np.floor(x))
                    y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    ly, lx = y - y0, x - x0
                    acc += ((1 - ly) * (1 - lx) * feat_hwc[y0, x0]
                            + (1 - ly) * lx * feat_hwc[y0, x1i]
                            + ly * (1 - lx) * feat_hwc[y1i, x0]
                            + ly * lx * feat_hwc[y1i, x1i])
            out[py, px] = acc / (sr * sr)
    return out


def test_single_level_matches_oracle():
    rng = np.random.RandomState(42)
    feat = rng.randn(1, 16, 20, 3).astype(np.float32)
    rois = np.array([[[4.0, 6.0, 60.0, 50.0],
                      [0.0, 0.0, 10.0, 10.0],
                      [-8.0, -8.0, 30.0, 30.0]]], np.float32)  # partly off-image
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               spatial_scale=0.25, output_size=7, sampling_ratio=2))
    for i in range(rois.shape[1]):
        expected = np_roi_align(feat[0], rois[0, i], 0.25, 7, 2)
        np.testing.assert_allclose(out[0, i], expected, atol=1e-4)


def test_level_assignment_canonical():
    # area 224² at canonical level 4 → level index for p3..p5 (min_level 3) is 1.
    rois = jnp.asarray([[[0.0, 0.0, 224.0, 224.0],
                         [0.0, 0.0, 50.0, 50.0],
                         [0.0, 0.0, 1000.0, 1000.0]]])
    lvl = np.asarray(fpn_level_assignment(rois, num_levels=3, min_level=3))
    np.testing.assert_array_equal(lvl[0], [1, 0, 2])


def test_multilevel_matches_per_level_oracle():
    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.randn(1, 32, 40, 4).astype(np.float32)),
             jnp.asarray(rng.randn(1, 16, 20, 4).astype(np.float32)),
             jnp.asarray(rng.randn(1, 8, 10, 4).astype(np.float32))]
    scales = (1 / 8, 1 / 16, 1 / 32)
    rois = np.array([[[10.0, 10.0, 70.0, 70.0],        # small → level 0
                      [5.0, 5.0, 280.0, 250.0],        # mid → level 1
                      [0.0, 0.0, 310.0, 300.0]]], np.float32)
    lvls = np.asarray(fpn_level_assignment(jnp.asarray(rois), 3, 3))[0]
    out = np.asarray(multilevel_roi_align(feats, jnp.asarray(rois), scales,
                                          output_size=7, sampling_ratio=2))
    for i in range(3):
        l = int(lvls[i])
        expected = np_roi_align(np.asarray(feats[l][0]), rois[0, i], scales[l], 7, 2)
        np.testing.assert_allclose(out[0, i], expected, atol=1e-4,
                                   err_msg=f"roi {i} level {l}")


def test_gradients_flow():
    import jax
    feat = jnp.ones((1, 8, 8, 2))
    rois = jnp.asarray([[[2.0, 2.0, 20.0, 20.0]]])

    def f(x):
        return jnp.sum(roi_align(x, rois, 0.25, output_size=3, sampling_ratio=2))

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
