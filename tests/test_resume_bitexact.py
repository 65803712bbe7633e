"""Checkpoint/resume must continue the training trajectory bit-exactly.

Every random draw in tools/train_net.py is derived from the iteration
index (sample RNG, batch-reuse RNG, per-step jax PRNG fold_in), and the
cheap batch-index iterator is fast-forwarded on resume — so a run trained
0→N in one process and a run trained 0→k, killed, and resumed k→N must
produce IDENTICAL parameters (reference semantics: restart from
last_checkpoint, utils/checkpoint.py:52-56 — but the reference makes no
bit-exactness promise; this is a rebuild upgrade).

One slow test drives the real CLI three times on the synthetic dataset
over a 2-device DP mesh (the 8-virtual-device conftest), sharing the jax
compilation cache so only the first run pays the compile.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "vid_R_50_tiny_synthetic.yaml")

OVERRIDES = [
    "MODEL.RESNETS.DEPTH", "18",
    "SOLVER.CHECKPOINT_PERIOD", "2",
    "SOLVER.TEST_PERIOD", "0",
    "INPUT.MIN_SIZE_TRAIN", "(96,)",
    "INPUT.MAX_SIZE_TRAIN", "160",
    "TPU.MESH_DP", "2",
]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return env


def _train(data, out, max_iter, resume=False):
    cmd = [sys.executable, os.path.join(REPO, "tools", "train_net.py"),
           "--config-file", CFG, "--data-dir", data, "--no-prefetch"]
    if resume:
        cmd.append("--resume")
    cmd += ["SOLVER.MAX_ITER", str(max_iter), "OUTPUT_DIR", out] + OVERRIDES
    r = subprocess.run(cmd, cwd=REPO, env=_env(), capture_output=True,
                       text=True, timeout=2400)
    assert r.returncode == 0, (r.stderr[-3000:], r.stdout[-1000:])
    return r


def _leaves(path):
    from diffusionvid_tpu.utils import load_checkpoint
    import jax
    ck = load_checkpoint(path)
    flat = jax.tree_util.tree_flatten_with_path(ck["params"])[0]
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}


@pytest.mark.slow
def test_resume_is_bitexact(tmp_path):
    data = str(tmp_path / "synth")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", data, "--videos", "2", "--frames", "8",
         "--size", "96", "144"],
        check=True, cwd=REPO)

    out_a = str(tmp_path / "a")      # uninterrupted 0→4
    out_b = str(tmp_path / "b")      # 0→2, then resume 2→4
    _train(data, out_a, 4)
    _train(data, out_b, 2)
    r = _train(data, out_b, 4, resume=True)
    assert "resumed from" in r.stderr + r.stdout

    la = _leaves(os.path.join(out_a, "model_0000004"))
    lb = _leaves(os.path.join(out_b, "model_0000004"))
    assert set(la) == set(lb)
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k], err_msg=k)
