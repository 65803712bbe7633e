"""Torch checkpoint → JAX parameter-tree conversion.

Replaces the reference's weight-porting machinery
(``mega_core/utils/c2_model_loading.py``, ``model_serialization.py``): maps
the released DiffusionVID torch state dicts (detectron2-style module names)
onto this package's parameter tree.  Parameters were deliberately stored in
torch layout throughout the models (Conv ``weight`` [out,in,kh,kw], Linear
``weight`` [out,in], fused MHA ``in_proj_weight``), so conversion is pure
renaming — no transposes.

Name map (reference checkpoint → ours):

  backbone.bottom_up.stem.conv1.{weight,norm.*}   → backbone/conv1, bn1
  backbone.bottom_up.res{S}.{i}.conv{k}.*         → backbone/layer{S-1}.{i}/conv{k},bn{k}
  backbone.bottom_up.res{S}.{i}.shortcut.*        → .../downsample_conv, downsample_bn
  backbone.fpn_lateral{L}.*  / fpn_output{L}.*    → fpn/lateral{j}/..., output{j}/...
  head.time_mlp.{1,3}.*                           → head/time_fc{1,2}
  head.head_series.{i}.<sub>                      → head/head{i}/<sub>
  head.head_series_cond.{i}.<sub>                 → head/head_cond{i}/<sub>
  head.global_attention.{i}.0.*                   → head/global_attn{i}
  <sub>: self_attn.{in_proj_weight,in_proj_bias,out_proj.*},
         inst_interact.{dynamic_layer,norm1..3,out_layer}, linear1/2,
         norm1..3, block_time_mlp.1, c_mlp.1, cls_module.{3j}/{3j+1},
         reg_module..., class_logits.{weight,bias} → class_logits_{weight,bias},
         bboxes_delta.*
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree: dict, path: list, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _rcnn_head_path(rest: str):
    """Map one RCNNHead-relative torch name to our (module, param) path."""
    m = re.match(r"self_attn\.(in_proj_weight|in_proj_bias)$", rest)
    if m:
        return ["self_attn", m.group(1)]
    m = re.match(r"self_attn\.out_proj\.(weight|bias)$", rest)
    if m:
        return ["self_attn", "out_proj", m.group(1)]
    m = re.match(r"inst_interact\.(dynamic_layer|out_layer|norm1|norm2|norm3)\.(weight|bias)$", rest)
    if m:
        return ["inst_interact", m.group(1), m.group(2)]
    m = re.match(r"(linear1|linear2|norm1|norm2|norm3|bboxes_delta)\.(weight|bias)$", rest)
    if m:
        return [m.group(1), m.group(2)]
    m = re.match(r"block_time_mlp\.1\.(weight|bias)$", rest)
    if m:
        return ["block_time_mlp", m.group(1)]
    m = re.match(r"c_mlp\.1\.(weight|bias)$", rest)
    if m:
        return ["c_mlp", m.group(1)]
    # cls/reg towers: torch ModuleList [Linear, LayerNorm, ReLU] × n
    m = re.match(r"(cls|reg)_module\.(\d+)\.(weight|bias)$", rest)
    if m:
        kind, idx, p = m.group(1), int(m.group(2)), m.group(3)
        block, slot = divmod(idx, 3)
        if slot == 0:
            return [f"{kind}_module{block}", p]
        if slot == 1:
            return [f"{kind}_norm{block}", p]
        return None
    m = re.match(r"class_logits\.(weight|bias)$", rest)
    if m:
        return [f"class_logits_{m.group(1)}"]
    return None


def convert_torch_state_dict(state: Dict[str, "np.ndarray"],
                             fpn_levels=(3, 4, 5)) -> dict:
    """Convert a torch state dict (names → numpy arrays) to our tree.

    Returns {"params": {...}} matching DiffusionDetArch.  Unknown keys are
    collected under "_unmatched" for inspection.
    """
    params: dict = {}
    unmatched = []
    lvl_index = {l: i for i, l in enumerate(fpn_levels)}

    for name, value in state.items():
        v = np.asarray(value)
        # strip DDP/meta prefixes (model_serialization-style fuzz)
        for pre in ("module.", "model."):
            if name.startswith(pre):
                name = name[len(pre):]

        # ---- backbone ----
        m = re.match(r"backbone\.bottom_up\.stem\.conv1\.(weight|norm\.(.+))$", name)
        if m:
            if m.group(1) == "weight":
                _set(params, ["backbone", "conv1", "weight"], v)
            else:
                _set(params, ["backbone", "bn1", m.group(2)], v)
            continue
        m = re.match(r"backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)\.(weight|norm\.(.+))$", name)
        if m:
            stage, block, conv, tail = int(m.group(1)), m.group(2), m.group(3), m.group(4)
            layer = f"layer{stage - 1}.{block}"
            if conv == "shortcut":
                mod = "downsample_conv" if tail == "weight" else "downsample_bn"
            else:
                mod = conv if tail == "weight" else conv.replace("conv", "bn")
            leaf = "weight" if tail == "weight" else m.group(5)
            _set(params, ["backbone", layer, mod, leaf], v)
            continue
        m = re.match(r"backbone\.fpn_(lateral|output)(\d)\.(weight|bias)$", name)
        if m:
            kind, lvl, leaf = m.group(1), int(m.group(2)), m.group(3)
            j = lvl_index.get(lvl)
            if j is None:
                unmatched.append(name)
                continue
            _set(params, ["fpn", f"{kind}{j}", "Conv_0", leaf], v)
            continue

        # ---- Swin backbone ----
        m = re.match(r"backbone\.bottom_up\.patch_embed\.proj\.(weight|bias)$", name)
        if m:
            _set(params, ["backbone", f"patch_embed_{m.group(1)}"], v)
            continue
        m = re.match(r"backbone\.bottom_up\.patch_embed\.norm\.(weight|bias)$", name)
        if m:
            _set(params, ["backbone", "patch_norm", m.group(1)], v)
            continue
        m = re.match(r"backbone\.bottom_up\.layers\.(\d)\.blocks\.(\d+)\.(.+)$", name)
        if m:
            s_i, b_i, rest = m.group(1), m.group(2), m.group(3)
            block = f"layers{s_i}.blocks{b_i}"
            mm = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
            if mm:
                _set(params, ["backbone", block, mm.group(1), mm.group(2)], v)
                continue
            mm = re.match(r"attn\.qkv\.(weight|bias)$", rest)
            if mm:
                _set(params, ["backbone", block, "attn", f"qkv_{mm.group(1)}"], v)
                continue
            mm = re.match(r"attn\.proj\.(weight|bias)$", rest)
            if mm:
                _set(params, ["backbone", block, "attn", f"proj_{mm.group(1)}"], v)
                continue
            if rest == "attn.relative_position_bias_table":
                _set(params, ["backbone", block, "attn",
                              "relative_position_bias_table"], v)
                continue
            mm = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", rest)
            if mm:
                _set(params, ["backbone", block,
                              f"mlp_{mm.group(1)}_{mm.group(2)}"], v)
                continue
            if rest == "attn.relative_position_index":
                continue  # recomputed, not a parameter
            unmatched.append(name)
            continue
        m = re.match(r"backbone\.bottom_up\.layers\.(\d)\.downsample\.(reduction\.weight|norm\.(weight|bias))$", name)
        if m:
            s_i = m.group(1)
            if m.group(2) == "reduction.weight":
                _set(params, ["backbone", f"layers{s_i}.downsample",
                              "reduction_weight"], v)
            else:
                _set(params, ["backbone", f"layers{s_i}.downsample", "norm",
                              m.group(3)], v)
            continue
        m = re.match(r"backbone\.bottom_up\.norm(\d)\.(weight|bias)$", name)
        if m:
            _set(params, ["backbone", f"norm{m.group(1)}", m.group(2)], v)
            continue

        # ---- time MLP ----
        m = re.match(r"head\.time_mlp\.(1|3)\.(weight|bias)$", name)
        if m:
            fc = "time_fc1" if m.group(1) == "1" else "time_fc2"
            _set(params, ["head", fc, m.group(2)], v)
            continue

        # ---- head stages ----
        m = re.match(r"head\.head_series(_cond)?\.(\d+)\.(.+)$", name)
        if m:
            cond, idx, rest = m.group(1), int(m.group(2)), m.group(3)
            sub = _rcnn_head_path(rest)
            if sub is None:
                unmatched.append(name)
                continue
            mod = f"head_cond{idx}" if cond else f"head{idx}"
            _set(params, ["head", mod] + sub, v)
            continue

        # ---- temporal attention ----
        m = re.match(r"head\.global_attention\.(\d+)\.0\.(in_proj_weight|in_proj_bias)$", name)
        if m:
            _set(params, ["head", f"global_attn{m.group(1)}", m.group(2)], v)
            continue
        m = re.match(r"head\.global_attention\.(\d+)\.0\.out_proj\.(weight|bias)$", name)
        if m:
            _set(params, ["head", f"global_attn{m.group(1)}", "out_proj", m.group(2)], v)
            continue

        unmatched.append(name)

    if unmatched:
        params["_unmatched"] = unmatched
    return {"params": params}


_C2_SUFFIX = {
    "_w": ("conv", "weight"), "_b": ("conv", "bias"),
    "_bn_s": ("bn", "weight"), "_bn_b": ("bn", "bias"),
    "_bn_rm": ("bn", "running_mean"), "_bn_riv": ("bn", "running_var"),
    "_bn_running_mean": ("bn", "running_mean"),
    "_bn_running_var": ("bn", "running_var"),
}


def c2_to_torch_names(state: Dict[str, "np.ndarray"]) -> Dict[str, "np.ndarray"]:
    """Caffe2 blob names → torchvision-style module names (the reference's
    ``c2_model_loading.py:1-219`` renaming: ``res2_0_branch2a_w`` →
    ``layer1.0.conv1.weight`` etc.).  C2 FrozenBN stores only scale/bias
    (stats absorbed) — identity running stats are synthesized so the target
    FrozenBatchNorm computes the same affine."""
    branch_map = {"branch2a": "conv1", "branch2b": "conv2",
                  "branch2c": "conv3", "branch1": "downsample"}
    out: Dict[str, np.ndarray] = {}

    def put_bn_stats(prefix: str, like: np.ndarray):
        out.setdefault(prefix + ".running_mean", np.zeros_like(like))
        out.setdefault(prefix + ".running_var", np.ones_like(like))

    for name, v in state.items():
        v = np.asarray(v)
        suffix = next((s for s in sorted(_C2_SUFFIX, key=len, reverse=True)
                       if name.endswith(s)), None)
        if suffix is None:
            out[name] = v
            continue
        stem_name = name[: -len(suffix)]
        kind, leaf = _C2_SUFFIX[suffix]
        m = re.match(r"res(\d)_(\d+)_(branch\d\w?)$", stem_name)
        if m:
            stage, block, branch = int(m.group(1)), m.group(2), m.group(3)
            mod = branch_map[branch]
            if mod == "downsample":
                tgt = (f"layer{stage - 1}.{block}."
                       + ("downsample_conv" if kind == "conv"
                          else "downsample_bn"))
            else:
                tgt = (f"layer{stage - 1}.{block}."
                       + (mod if kind == "conv" else mod.replace("conv", "bn")))
            out[f"{tgt}.{leaf}"] = v
            if kind == "bn":
                put_bn_stats(tgt, v)
            continue
        if stem_name == "conv1":
            tgt = "conv1" if kind == "conv" else "bn1"
            out[f"{tgt}.{leaf}"] = v
            if kind == "bn":
                put_bn_stats(tgt, v)
            continue
        out[name] = v
    return out


def looks_like_c2(names) -> bool:
    return any(re.match(r"res\d_\d+_branch", n) or n in ("conv1_w", "conv1_bn_s")
               for n in names)


def convert_backbone_only(state: Dict[str, "np.ndarray"]) -> dict:
    """Bare-trunk state dict (torchvision names ``conv1/bn1/layerS.B...``,
    the payload of detectron2 ``torchvision-R-101.pkl`` after its
    ``stem.convN``/``resS.B`` names are normalized) → our backbone subtree."""
    params: dict = {}
    unmatched = []
    for name, v in state.items():
        v = np.asarray(v)
        m = re.match(r"(conv1|bn1)\.(weight|bias|running_mean|running_var)$",
                     name)
        if m:
            _set(params, ["backbone", m.group(1), m.group(2)], v)
            continue
        m = re.match(r"(layer\d\.\d+)\.([\w]+)\.(weight|bias|running_mean|running_var)$", name)
        if m:
            _set(params, ["backbone", m.group(1), m.group(2), m.group(3)], v)
            continue
        if name.endswith("num_batches_tracked") or name.startswith("fc."):
            continue
        unmatched.append(name)
    if unmatched:
        params["_unmatched"] = unmatched
    return {"params": params}


def d2_body_to_torchvision(state: Dict[str, "np.ndarray"]) -> Dict[str, "np.ndarray"]:
    """detectron2 trunk names (``stem.conv1.*``, ``res2.0.conv1.norm.*``)
    → torchvision names (the shape torchvision-R-101.pkl ships in)."""
    out = {}
    for name, v in state.items():
        n = name
        n = re.sub(r"^stem\.conv1\.norm\.", "bn1.", n)
        n = re.sub(r"^stem\.conv1\.", "conv1.", n)
        m = re.match(r"^res(\d)\.(\d+)\.(.+)$", n)
        if m:
            rest = m.group(3)
            rest = re.sub(r"^shortcut\.norm\.", "downsample_bn@.", rest)
            rest = re.sub(r"^shortcut\.", "downsample_conv@.", rest)
            rest = re.sub(r"^conv(\d)\.norm\.", r"bn\1.", rest)
            rest = rest.replace("@.", ".")
            n = f"layer{int(m.group(1)) - 1}.{m.group(2)}.{rest}"
        out[n] = v
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pth`` or a detectron2/Caffe2 ``.pkl`` and convert.

    Handles all the reference WEIGHT formats (``DetectronCheckpointer``
    + ``c2_model_loading.py`` + ``model_serialization.py``):
      * full-model torch state dicts (detectron2-style names);
      * detectron2 ``torchvision-R-101.pkl`` (plain pickle, trunk-only,
        ``stem.*``/``res{2..5}.*`` names);
      * Caffe2 ``R-50/R-101`` pkls (``res2_0_branch2a_w`` blob names);
      * bare torchvision state dicts (``conv1/layer1.0...``).
    """
    if path.endswith(".pkl"):
        import pickle
        with open(path, "rb") as f:
            raw = pickle.load(f, encoding="latin1")
    else:
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw.get("model", raw) if isinstance(raw, dict) else raw
    state_np = {k: (t.numpy() if hasattr(t, "numpy") else np.asarray(t))
                for k, t in state.items()
                if not k.startswith("__") and not isinstance(t, (str, bytes))}

    names = list(state_np.keys())
    if looks_like_c2(names):
        state_np = c2_to_torch_names(state_np)
        names = list(state_np.keys())
    if any(n.startswith(("stem.", "res2.", "res3.")) for n in names):
        state_np = d2_body_to_torchvision(state_np)
        names = list(state_np.keys())
    if any(n.startswith(("backbone.", "head.")) for n in names):
        return convert_torch_state_dict(state_np)
    return convert_backbone_only(state_np)
