"""One-process TPU adjudication of the opt-in Pallas kernels.

Two round-3 kernels shipped opt-in pending a measurement on the real
chip (the dev host reaches it over a tunnel whose init costs minutes,
so each extra process is expensive — this runs every candidate in ONE
process):

  1. DIFFUSIONVID_SWIN_KERNEL = off | v1 | v2
     fused window-attention for the Swin-B inference path
     (ops/swin_attention_pallas.py).  The flag is read at trace time
     inside WindowAttention.__call__, so flipping the env var and
     rebuilding the StreamingDetector (fresh jax.jit wrappers) retraces.
  2. DIFFUSIONVID_ROI_BWD_KERNEL = "" | 1
     banded-transpose Pallas backward for multilevel ROIAlign in the
     flagship train step (ops/roi_align.py:_pra_bwd).

Prints one JSON line per (knob, mode) with the measured number; the
fastest mode is then promoted to the default in the source (done by
hand after reading the output — this script only measures).

Usage:  timeout 3000 python tools/adjudicate_kernels.py [swin] [roi]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def emit(knob, mode, value, unit, extra=None):
    rec = {"knob": knob, "mode": mode, "value": round(value, 2), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def adjudicate_swin():
    model, variables, whwh, frames = bench.build(50, "swin", 4)
    for mode in ("off", "v1", "v2"):
        os.environ["DIFFUSIONVID_SWIN_KERNEL"] = mode
        jax.clear_caches()
        t0 = time.perf_counter()
        det, state = bench.make_detector(model, variables, 4, 1)
        try:
            fps = bench.stream_fps(det, state, frames[:4], whwh, 4, chunks=30)
        except Exception as e:  # a kernel that fails to lower must not
            emit("swin_kernel", mode, -1.0, "frames/sec/chip",
                 {"error": repr(e)[:200]})  # kill the other candidates
            continue
        emit("swin_kernel", mode, fps, "frames/sec/chip",
             {"compile_s": round(time.perf_counter() - t0, 1)})
    os.environ.pop("DIFFUSIONVID_SWIN_KERNEL", None)


def adjudicate_roi_bwd():
    model, variables, whwh, frames = bench.build(101, "resnet", bench.INFER_BATCH)
    from diffusionvid_tpu.engine import (
        TrainBatch, TrainState, make_optimizer, make_train_step)
    import jax.numpy as jnp
    import numpy as np

    num_global = 4
    b = 1 + num_global
    rng = np.random.RandomState(2)
    g = 32
    batch = TrainBatch(
        images=jnp.asarray(rng.uniform(0, 255, (1, b, bench.H, bench.W, 3)),
                           jnp.float32),
        gt_boxes=jnp.tile(jnp.asarray([40.0, 40.0, 300.0, 260.0]),
                          (1, b, g, 1)),
        gt_labels=jnp.full((1, b, g), 3, jnp.int32),
        gt_valid=jnp.zeros((1, b, g), bool).at[..., :5].set(True),
        whwh=jnp.tile(jnp.asarray([bench.W, bench.H, bench.W, bench.H],
                                  jnp.float32), (1, 1)))
    params = variables["params"]
    tx = make_optimizer(params, base_lr=1e-4, warmup_iters=0)
    for mode in ("off", "on"):
        # the kernel is default-ON (roi_align.py reads unset as "1"), so
        # the off row must set "0" explicitly, not unset the var
        os.environ["DIFFUSIONVID_ROI_BWD_KERNEL"] = "1" if mode == "on" else "0"
        jax.clear_caches()
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(model, tx, num_global))
        r = jax.random.PRNGKey(5)
        t0 = time.perf_counter()
        try:
            state, metrics = step(state, batch, r)
            _ = float(metrics["total_loss"])
        except Exception as e:
            emit("roi_bwd_kernel", mode, -1.0, "ms/step",
                 {"error": repr(e)[:200]})
            continue
        compile_s = time.perf_counter() - t0
        start = time.perf_counter()
        n = 5
        for _ in range(n):
            state, metrics = step(state, batch, r)
        _ = float(metrics["total_loss"])
        sec = (time.perf_counter() - start) / n
        emit("roi_bwd_kernel", mode, 1000.0 * sec, "ms/step",
             {"compile_s": round(compile_s, 1)})
    os.environ.pop("DIFFUSIONVID_ROI_BWD_KERNEL", None)


def adjudicate_roi_fwd():
    """DIFFUSIONVID_ROI_FWD_VERSION = 3 | 4: the round-3 one-hot VPU
    x-pass vs the round-4 MXU-dot x-pass + native row-major flat store
    (ops/roi_align_pallas.py).  Read at trace time in
    multilevel_roi_align_mxu, so a fresh StreamingDetector retraces."""
    model, variables, whwh, frames = bench.build(101, "resnet",
                                                 bench.INFER_BATCH)
    for mode in ("3", "4"):
        os.environ["DIFFUSIONVID_ROI_FWD_VERSION"] = mode
        jax.clear_caches()
        t0 = time.perf_counter()
        det, state = bench.make_detector(model, variables,
                                         bench.INFER_BATCH, 1)
        try:
            fps = bench.stream_fps(det, state, frames, whwh,
                                   bench.INFER_BATCH, chunks=30)
        except Exception as e:
            emit("roi_fwd_version", mode, -1.0, "frames/sec/chip",
                 {"error": repr(e)[:200]})
            continue
        emit("roi_fwd_version", mode, fps, "frames/sec/chip",
             {"compile_s": round(time.perf_counter() - t0, 1)})
    os.environ.pop("DIFFUSIONVID_ROI_FWD_VERSION", None)


def adjudicate_dynconv():
    """DIFFUSIONVID_DYNCONV_KERNEL = 1 | nn | 0: the fused DynamicConv
    Pallas chain (ops/dynamic_conv_pallas.py) vs the e-major NN einsum
    vs the d-major NT einsum (models/heads.py:DynamicConv).  All three
    in ONE process so the tunnel/session conditions are identical."""
    model, variables, whwh, frames = bench.build(101, "resnet",
                                                 bench.INFER_BATCH)
    for mode in ("1", "nn", "0"):
        os.environ["DIFFUSIONVID_DYNCONV_KERNEL"] = mode
        jax.clear_caches()
        t0 = time.perf_counter()
        det, state = bench.make_detector(model, variables,
                                         bench.INFER_BATCH, 1)
        try:
            fps = bench.stream_fps(det, state, frames, whwh,
                                   bench.INFER_BATCH, chunks=30)
        except Exception as e:
            emit("dynconv_kernel", mode, -1.0, "frames/sec/chip",
                 {"error": repr(e)[:200]})
            continue
        emit("dynconv_kernel", mode, fps, "frames/sec/chip",
             {"compile_s": round(time.perf_counter() - t0, 1)})
    os.environ.pop("DIFFUSIONVID_DYNCONV_KERNEL", None)


def main():
    bench._probe_device()
    which = set(sys.argv[1:]) or {"swin", "roi", "roifwd", "dynconv"}
    if "swin" in which:
        adjudicate_swin()
    if "roi" in which:
        adjudicate_roi_bwd()
    if "roifwd" in which:
        adjudicate_roi_fwd()
    if "dynconv" in which:
        adjudicate_dynconv()


if __name__ == "__main__":
    main()
