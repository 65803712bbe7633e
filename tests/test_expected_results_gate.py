"""TEST.EXPECTED_RESULTS regression gate, exercised end-to-end through the
CLIs (VERDICT r2 item #6; reference ``mega_core/config/defaults.py:538-539``
+ the inference-time check).

One slow subprocess drives the full eval path (``tools/test_net.py``) on
the synthetic dataset with a gate that must PASS; the saved predictions
are then re-evaluated through ``tools/test_prediction.py`` (no model,
fast) with a passing and a failing expectation — the failing one must
abort with a non-zero exit.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "vid_R_50_tiny_synthetic.yaml")


def _make_synth(tmp):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_data.py"),
         "--out", tmp, "--videos", "2", "--frames", "8", "--size", "96", "144"],
        check=True, cwd=REPO)


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return env


@pytest.mark.slow
def test_gate_passes_and_fails_e2e(tmp_path):
    data = str(tmp_path / "synth")
    out = str(tmp_path / "out")
    _make_synth(data)

    # full eval with a gate that must pass (random weights → AP50 == 0)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_net.py"),
         "--config-file", CFG, "--data-dir", data, "--output-dir", out,
         "TEST.EXPECTED_RESULTS", "((\"ap50\", 0.0, 0.005),)"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EXPECTED_RESULTS check passed" in r.stderr + r.stdout

    preds = os.path.join(out, "predictions.pkl")
    assert os.path.exists(preds)
    with open(preds, "rb") as f:
        assert len(pickle.load(f)) > 0

    # same predictions, no model: passing gate...
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_prediction.py"),
         "--config-file", CFG, "--predictions", preds, "--data-dir", data,
         "TEST.EXPECTED_RESULTS", "((\"ap50\", 0.0, 0.005),)"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EXPECTED_RESULTS check passed" in r.stderr + r.stdout

    # ...and a deviating expectation must abort non-zero
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_prediction.py"),
         "--config-file", CFG, "--predictions", preds, "--data-dir", data,
         "TEST.EXPECTED_RESULTS", "((\"ap50\", 0.8, 0.005),)"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "deviates" in r.stderr + r.stdout


def test_check_expected_results_unit():
    from diffusionvid_tpu.utils import check_expected_results

    check_expected_results({"ap50": 0.85}, [("ap50", 0.86, 0.01)], 4)
    with pytest.raises(AssertionError):
        check_expected_results({"ap50": 0.5}, [("ap50", 0.86, 0.01)], 4)
    with pytest.raises(AssertionError):
        check_expected_results({}, [("ap50", 0.86, 0.01)], 4)
