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


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pth/.pkl and convert (requires torch, CPU-only)."""
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw.get("model", raw) if isinstance(raw, dict) else raw
    state_np = {k: t.numpy() if hasattr(t, "numpy") else np.asarray(t)
                for k, t in state.items()}
    return convert_torch_state_dict(state_np)
