"""Checkpoint save/load with resume semantics.

Replaces the reference ``Checkpointer``/``DetectronCheckpointer``
(``mega_core/utils/checkpoint.py:32-155``): bundles params/opt_state/step,
keeps a ``last_checkpoint`` pointer file for restart-based recovery, and
supports the class-head transfer trick (``skip_modules=['class_logits']``,
``tools/train_net.py:71``) via a name filter.  Storage is orbax
(TPU-native async-capable checkpointing) instead of torch.save.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

_LAST = "last_checkpoint"


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"model_{step:07d}")


def save_checkpoint(output_dir: str, step: int, params, opt_state=None,
                    extra: Optional[dict] = None) -> str:
    """Save params (+ optional opt state) and update the pointer file."""
    os.makedirs(output_dir, exist_ok=True)
    path = _ckpt_dir(output_dir, step)
    payload = {"params": params, "step": np.asarray(step)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload["extra"] = extra
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
    else:  # pragma: no cover
        import pickle
        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, payload), f)
    with open(os.path.join(output_dir, _LAST), "w") as f:
        f.write(path)
    return path


def last_checkpoint(output_dir: str) -> Optional[str]:
    p = os.path.join(output_dir, _LAST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        path = f.read().strip()
    return path if os.path.exists(path) or os.path.exists(path + ".pkl") else None


def load_checkpoint(path: str, target=None) -> dict:
    """Load a checkpoint directory; ``target`` optionally restores pytree
    structure (orbax restore_args)."""
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            return ckptr.restore(path, item=target)
        return ckptr.restore(path)
    import pickle  # pragma: no cover
    with open(path + ".pkl", "rb") as f:
        return pickle.load(f)


def filter_params(params, skip_keys=("class_logits",)):
    """Zero out (re-init) parameters whose path mentions any skip key —
    the COCO→VID class-head transfer (checkpoint.py:52,63)."""
    def walk(path, tree, fresh):
        if not isinstance(tree, dict):
            skip = any(any(k in part for k in skip_keys) for part in path)
            return fresh if skip else tree
        return {k: walk(path + (k,), v, fresh[k]) for k, v in tree.items()}
    return walk, None


def merge_pretrained(target_params, loaded_params, skip_keys=("class_logits",)):
    """Copy loaded params into the target tree, keeping the target's values
    for paths matching ``skip_keys`` or missing from the load."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded_params)[0])
    out = {}
    n_copied = 0
    for path, tval in flat_t.items():
        names = [getattr(k, "key", str(k)) for k in path]
        skip = any(any(s in n for s in skip_keys) for n in names)
        lval = flat_l.get(path)
        if (not skip and lval is not None
                and np.shape(lval) == np.shape(tval)):
            out[path] = lval
            n_copied += 1
        else:
            out[path] = tval
    treedef = jax.tree_util.tree_structure(target_params)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(target_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves), n_copied


# ---------------------------------------------------------------------------
# MODEL.WEIGHT resolution (DetectronCheckpointer URL/catalog handling,
# reference ``mega_core/config/paths_catalog.py:274-334`` ModelCatalog +
# ``mega_core/utils/checkpoint.py:120-140`` catalog://→URL→cache).
# ---------------------------------------------------------------------------

_C2_DETECTRON_URL = "https://dl.fbaipublicfiles.com/detectron"
_C2_IMAGENET_MODELS = {
    "MSRA/R-50": "ImageNetPretrained/MSRA/R-50.pkl",
    "MSRA/R-50-GN": "ImageNetPretrained/47261647/R-50-GN.pkl",
    "MSRA/R-101": "ImageNetPretrained/MSRA/R-101.pkl",
    "MSRA/R-101-GN": "ImageNetPretrained/47592356/R-101-GN.pkl",
    "FAIR/20171220/X-101-32x8d": "ImageNetPretrained/20171220/X-101-32x8d.pkl",
    "FAIR/X-101-64x4d": "ImageNetPretrained/FBResNeXt/X-101-64x4d.pkl",
}


def resolve_weight(weight: str, cache_dir: Optional[str] = None):
    """Resolve ``MODEL.WEIGHT`` to a local file path.

    - plain path → returned if it exists;
    - ``catalog://ImageNetPretrained/...`` → mapped to its public URL
      (the reference downloads it; this environment has no egress, so a
      pre-downloaded copy is looked up in ``cache_dir`` / $TORCH_HOME and
      otherwise a clear error names the URL to fetch);
    - ``http(s)://...`` → same local-cache lookup by basename.

    Returns None for an empty string.
    """
    if not weight:
        return None
    if os.path.exists(weight):
        return weight
    url = None
    if weight.startswith("catalog://"):
        name = weight[len("catalog://"):]
        if name.startswith("ImageNetPretrained/"):
            key = name[len("ImageNetPretrained/"):]
            if key not in _C2_IMAGENET_MODELS:
                raise FileNotFoundError(
                    f"unknown catalog entry {weight!r}; known: "
                    f"{sorted(_C2_IMAGENET_MODELS)}")
            url = f"{_C2_DETECTRON_URL}/{_C2_IMAGENET_MODELS[key]}"
        else:
            raise FileNotFoundError(
                f"unsupported catalog namespace in {weight!r} (only "
                f"ImageNetPretrained/* backbones are used by the VID "
                f"configs)")
    elif weight.startswith(("http://", "https://")):
        url = weight
    else:
        raise FileNotFoundError(f"MODEL.WEIGHT {weight!r} does not exist")

    base = os.path.basename(url)
    for d in filter(None, (cache_dir,
                           os.environ.get("DIFFUSIONVID_WEIGHTS"),
                           os.path.join(os.environ.get("TORCH_HOME", ""),
                                        "checkpoints"))):
        cand = os.path.join(d, base)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"MODEL.WEIGHT {weight!r} resolves to {url} but no local copy was "
        f"found (no network egress here).  Download it and either pass its "
        f"path via --pretrained, or place it under $DIFFUSIONVID_WEIGHTS/"
        f"{base}")
