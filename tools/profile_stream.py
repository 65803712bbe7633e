"""Profile the R-101 streaming inference chunk on the real TPU and print an
op-level time breakdown (parsed from the jax.profiler trace).

Usage:  python tools/profile_stream.py [--out /tmp/prof_r3]

This is a perf-engineering tool, not part of the test suite: it answers
"where do the 45 ms of an 8-frame chunk actually go" with XLA-op-level
attribution, grouped by fusion category (conv / matmul / roialign kernel /
elementwise fusions / infeed).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import build, make_detector, H, W, INFER_BATCH


def run_train(outdir):
    """Profile the flagship training step (same operating point as
    bench.py's bench_train: 1 sample = 5 frames @608×1024)."""
    from diffusionvid_tpu.engine import (
        TrainBatch, TrainState, make_optimizer, make_train_step)
    import jax.numpy as jnp

    model, variables, whwh, frames = build(101, "resnet", INFER_BATCH)
    num_global = 4
    b = 1 + num_global
    rng = np.random.RandomState(2)
    g = 32
    batch = TrainBatch(
        images=jnp.asarray(rng.uniform(0, 255, (1, b, H, W, 3)), jnp.float32),
        gt_boxes=jnp.tile(jnp.asarray([40.0, 40.0, 300.0, 260.0]),
                          (1, b, g, 1)),
        gt_labels=jnp.full((1, b, g), 3, jnp.int32),
        gt_valid=jnp.zeros((1, b, g), bool).at[..., :5].set(True),
        whwh=jnp.tile(jnp.asarray([W, H, W, H], jnp.float32), (1, 1)))
    params = variables["params"]
    tx = make_optimizer(params, base_lr=1e-4, warmup_iters=0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, tx, num_global))
    r = jax.random.PRNGKey(5)
    state, metrics = step(state, batch, r)
    _ = float(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, batch, r)
    _ = float(metrics["total_loss"])
    print(f"train step: {(time.perf_counter() - t0) / 3 * 1000:.2f} ms")
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, metrics = step(state, batch, r)
        _ = float(metrics["total_loss"])


def run(outdir, which="r101"):
    if which == "train":
        return run_train(outdir)
    if which == "swin":
        model, variables, whwh, frames = build(50, "swin", 4)
        frames = frames[:4]
        nb = 4
    else:
        model, variables, whwh, frames = build(101, "resnet", INFER_BATCH)
        nb = INFER_BATCH
    det, state = make_detector(model, variables, nb, 1)
    for _ in range(3):
        state, dets = det.process_chunk(state, frames, whwh)
    _ = np.asarray(dets.scores)
    t0 = time.perf_counter()
    for _ in range(5):
        state, dets = det.process_chunk(state, frames, whwh)
    _ = np.asarray(dets.scores)
    dt = (time.perf_counter() - t0) / 5
    print(f"chunk time: {dt*1000:.2f} ms  ({frames.shape[0]/dt:.1f} fps)")

    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, dets = det.process_chunk(state, frames, whwh)
        _ = np.asarray(dets.scores)


def parse(outdir):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace files found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # find TPU-device op events (pid of the device track); host threads have
    # python function names, device tracks have XLA op names
    by_name = collections.defaultdict(float)
    count = collections.defaultdict(int)
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us → ms
        by_name[name] += dur
        count[name] += 1

    items = sorted(by_name.items(), key=lambda kv: -kv[1])
    total = sum(by_name.values())
    print(f"\ndevice pids: {sorted(dev_pids)} ({ {p: pids[p] for p in dev_pids} })")
    print(f"total device op time (3 chunks): {total:.2f} ms\n")
    print(f"{'ms/3chunks':>10} {'n':>5}  name")
    for name, ms in items[:60]:
        print(f"{ms:10.3f} {count[name]:5d}  {name[:110]}")

    # rough categories
    cats = collections.defaultdict(float)
    for name, ms in by_name.items():
        ln = name.lower()
        if "conv" in ln:
            cats["conv"] += ms
        elif "roi" in ln or "tpu_custom_call" in ln or "custom-call" in ln:
            cats["custom_call(pallas)"] += ms
        elif "dot" in ln or "matmul" in ln or "gemm" in ln:
            cats["dot"] += ms
        elif "fusion" in ln:
            cats["fusion"] += ms
        elif "copy" in ln or "transpose" in ln:
            cats["copy/transpose"] += ms
        elif "dynamic" in ln or "gather" in ln or "scatter" in ln:
            cats["gather/scatter"] += ms
        else:
            cats["other"] += ms
    print("\nby category (ms over 3 chunks):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {k:22s} {v:9.3f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/prof_r3")
    ap.add_argument("--model", default="r101", choices=["r101", "swin", "train"])
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run(args.out, args.model)
    parse(args.out)
