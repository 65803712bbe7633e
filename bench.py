"""Benchmark: flagship DiffusionVID streaming inference throughput on TPU.

Measures frames/sec/chip of the full streaming hot path (backbone R-101 +
FPN + 3 shared stages + memory cross-attention + conditioned stage + NMS
post-processing) at the reference operational point: 300 proposals,
INFER_BATCH=8 frame chunks, ~600×1000 input padded to 608×1024
(configs/vid_R_101_DiffusionVID.yaml:68-78; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio to REFERENCE_FPS — the reference repo
publishes no throughput (BASELINE.md: "the repo publishes no throughput
numbers"), so the denominator is the commonly-cited single-GPU fp16
throughput class for DiffusionVID R-101 ×1 (~20 fps on a desktop GPU);
treat it as a stable comparison anchor across rounds, not a ground truth.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS = 20.0
H, W = 608, 1024
INFER_BATCH = 8
WARMUP_CHUNKS = 2
BENCH_CHUNKS = 10


def main():
    from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch, signal_to_boxes
    from diffusionvid_tpu.engine import StreamingDetector

    model = DiffusionDetArch(depth=101, num_classes=30, num_proposals=300,
                             hidden_dim=256, num_heads=3, num_heads_local=1,
                             compute_dtype=jnp.bfloat16)

    whwh = jnp.asarray([W, H, W, H], jnp.float32)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.uniform(0, 255, (INFER_BATCH, H, W, 3)), jnp.float32)

    init_boxes = signal_to_boxes(
        jax.random.normal(jax.random.PRNGKey(1), (INFER_BATCH, 300, 4)), whwh, 2.0)
    t = jnp.full((INFER_BATCH,), 999, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(2)},
        frames, init_boxes, t, num_global=1, train=False)

    det = StreamingDetector(model, variables, infer_batch=INFER_BATCH,
                            sample_step=1, mem_size=900, mem_dis_size=150,
                            num_proposals=300)
    state = det.init_state(jax.random.PRNGKey(3))
    # Fill the memory so the cross-attention sees a realistic 900-slot kv.
    state = state._replace(mem=state.mem._replace(
        feats=jnp.asarray(rng.randn(900, 256), jnp.float32),
        count=jnp.asarray(900, jnp.int32)))

    # Warmup (compile).  NOTE: under the axon tunnel block_until_ready is
    # not a reliable barrier — force a small host transfer instead.
    for _ in range(WARMUP_CHUNKS):
        state, dets = det.process_chunk(state, frames, whwh)
    _ = np.asarray(dets.scores)

    start = time.perf_counter()
    for _ in range(BENCH_CHUNKS):
        state, dets = det.process_chunk(state, frames, whwh)
    _ = np.asarray(dets.scores)
    elapsed = time.perf_counter() - start

    fps = BENCH_CHUNKS * INFER_BATCH / elapsed
    print(json.dumps({
        "metric": "diffusionvid_r101_x1_stream_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
