"""Environment info dump (reference: mega_core/utils/collect_env.py,
logged at startup, train_net.py:219-220)."""

from __future__ import annotations

import platform
import sys


def collect_env_info() -> str:
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax
        lines.append(f"jax: {jax.__version__}  backend: {jax.default_backend()}")
        lines.append(f"devices: {[str(d) for d in jax.devices()]}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    for mod in ("flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            lines.append(f"{mod}: {m.__version__}")
        except Exception:
            pass
    try:
        from ..native import get_lib
        lines.append(f"vidkit native: {'loaded' if get_lib() else 'unavailable'}")
    except Exception:
        pass
    return "\n".join(lines)
