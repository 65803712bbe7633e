"""Scalar metrics logging to JSONL (+ optional TensorBoard).

Replaces the reference's TensorBoard writer (``tools/train_net.py:93-97``,
``engine/trainer.py:173-182``: Train/loss*, LR, Val/mAP scalars with purge
on resume).  JSONL is the primary sink (greppable, no deps); a TensorBoard
event writer is used when the package exists.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsWriter:
    def __init__(self, output_dir: str, resume_step: Optional[int] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        if resume_step is not None and os.path.exists(self.path):
            # purge entries after the resume point (TB purge semantics)
            kept = []
            with open(self.path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if rec.get("step", 0) <= resume_step:
                        kept.append(line)
            with open(self.path, "w") as f:
                f.writelines(kept)
        self._f = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(os.path.join(output_dir, "tb"),
                                     purge_step=resume_step)
        except Exception:
            pass

    def write(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def check_expected_results(results: dict, expected, sigma_tol: float = 4.0):
    """TEST.EXPECTED_RESULTS regression assert (reference
    ``mega_core/utils/checkpoint? → defaults.py:538-539`` semantics:
    [[metric, mean, std], ...]); raises on deviation > sigma_tol·std."""
    failures = []
    for item in expected or ():
        metric, mean, std = item[0], float(item[1]), float(item[2])
        actual = results.get(metric)
        if actual is None:
            failures.append(f"metric {metric} missing from results")
            continue
        if abs(actual - mean) > sigma_tol * std:
            failures.append(
                f"{metric}: {actual:.4f} deviates from {mean:.4f} "
                f"by more than {sigma_tol}·{std}")
    if failures:
        raise AssertionError("; ".join(failures))
