"""Import selected modules of the reference (/root/reference, the torch
DiffusionVID codebase) under CPU torch, so parity tests can golden-check
the rebuild against the REFERENCE'S OWN code rather than a hand-written
twin (round-3 verdict: "ground parity in the reference's own code").

The reference depends on torchvision / fvcore / detectron2 / timm and a
compiled ``mega_core._C`` CUDA extension, none of which exist in this
image.  This loader registers minimal pure-torch shims for exactly the
symbols the target modules touch, then loads the reference FILES under
their real dotted names via importlib — the algorithmic code that runs
in the oracle is the reference's, byte for byte:

  * ``mega_core.modeling.roi_heads.box_head.loss`` — simOTA matcher
    (``HungarianMatcherDynamicK``), ``SetCriterionDynamicK``, the classic
    ``FastRCNNLossComputation`` chain (loss.py:1-688)
  * ``mega_core.modeling.{matcher,box_coder,utils,
    balanced_positive_negative_sampler}`` — real files
  * ``mega_core.structures.{bounding_box,boxlist_ops,image_list}`` —
    real files (boxlist_nms gets a pure-torch NMS)
  * ``mega_core.modeling.detector.diffusion_det`` — for the DDIM
    schedule math (cosine_beta_schedule, extract, default helpers);
    the heavyweight model classes import but are never instantiated
  * ``seq_nms`` (repo root) and
    ``mega_core.data.datasets.evaluation.vid.vid_eval`` — real files

Everything is lazy: call ``load()`` once and read modules off the
returned namespace.  If the reference tree is absent, importing raises
``FileNotFoundError`` — tests should ``pytest.importorskip`` via
``ref_available()``.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF = "/root/reference"


def ref_available() -> bool:
    return os.path.isdir(os.path.join(REF, "mega_core"))


# ---------------------------------------------------------------- shims

def _mod(name: str, is_pkg: bool = False) -> types.ModuleType:
    m = types.ModuleType(name)
    if is_pkg:
        m.__path__ = []  # mark as package so submodule imports resolve
    sys.modules[name] = m
    return m


def _load_file(dotted: str, path: str) -> types.ModuleType:
    spec = importlib.util.spec_from_file_location(dotted, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = m
    spec.loader.exec_module(m)
    # attach to parent so `from pkg import child` works
    parent, _, child = dotted.rpartition(".")
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], child, m)
    return m


def _install_torchvision(torch):
    """torchvision.ops.{box_iou,nms} + ops.boxes.box_area, pure torch.

    Semantics match torchvision's documented behavior (xyxy IoU with
    +0-convention areas; score-descending greedy NMS)."""
    tv = _mod("torchvision", is_pkg=True)
    ops = _mod("torchvision.ops", is_pkg=True)
    boxes_mod = _mod("torchvision.ops.boxes")

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def box_iou(a, b):
        area1, area2 = box_area(a), box_area(b)
        lt = torch.max(a[:, None, :2], b[:, :2])
        rb = torch.min(a[:, None, 2:], b[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        return inter / (area1[:, None] + area2 - inter)

    def nms(b, scores, iou_threshold):
        order = scores.argsort(descending=True)
        keep = []
        suppressed = torch.zeros(len(b), dtype=torch.bool)
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            iou = box_iou(b[i:i + 1], b)[0]
            suppressed |= iou > iou_threshold
        return torch.as_tensor(keep, dtype=torch.int64)

    boxes_mod.box_area = box_area
    boxes_mod.box_iou = box_iou
    ops.box_iou = box_iou
    ops.nms = nms
    ops.box_area = box_area
    ops.boxes = boxes_mod
    tv.ops = ops


def _install_fvcore(torch):
    """fvcore.nn.sigmoid_focal_loss_jit — the standard focal-loss formula
    (fvcore/nn/focal_loss.py public API)."""
    import torch.nn.functional as F
    fv = _mod("fvcore", is_pkg=True)
    fvnn = _mod("fvcore.nn", is_pkg=True)

    def sigmoid_focal_loss(inputs, targets, alpha=-1.0, gamma=2.0,
                           reduction="none"):
        p = torch.sigmoid(inputs)
        ce = F.binary_cross_entropy_with_logits(inputs, targets,
                                                reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    fvnn.sigmoid_focal_loss = sigmoid_focal_loss
    fvnn.sigmoid_focal_loss_jit = sigmoid_focal_loss
    fv.nn = fvnn


def _install_detectron2(torch):
    """The handful of detectron2 symbols diffusion_det.py imports at module
    scope.  None are exercised by the schedule-math oracle."""
    d2 = _mod("detectron2", is_pkg=True)
    modeling = _mod("detectron2.modeling", is_pkg=True)
    structures = _mod("detectron2.structures", is_pkg=True)
    layers = _mod("detectron2.layers", is_pkg=True)
    poolers = _mod("detectron2.modeling.poolers")

    class _Registry:
        def register(self, *a, **k):
            def deco(cls):
                return cls
            return deco(*a) if a and isinstance(a[0], type) else deco

    class _Stub:
        def __init__(self, *a, **k):
            raise RuntimeError("detectron2 stub: not usable in the oracle")

    modeling.META_ARCH_REGISTRY = _Registry()
    modeling.build_backbone = lambda *a, **k: None
    modeling.detector_postprocess = lambda *a, **k: None
    poolers.ROIPooler = _Stub
    modeling.poolers = poolers
    structures.Boxes = _Stub
    structures.ImageList = _Stub
    structures.Instances = _Stub
    layers.batched_nms = lambda *a, **k: None
    d2.modeling = modeling
    d2.structures = structures
    d2.layers = layers


def _install_yacs():
    """yacs.config.CfgNode — attr-access dict, enough for the
    add_diffusiondet_config default-population in diffusion_det.py."""
    yacs = _mod("yacs", is_pkg=True)
    config = _mod("yacs.config")

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    config.CfgNode = CfgNode
    yacs.config = config


def _install_timm(torch):
    import torch.nn as nn
    timm = _mod("timm", is_pkg=True)
    models = _mod("timm.models", is_pkg=True)
    layers = _mod("timm.models.layers")

    class Mlp(nn.Module):
        """timm.models.layers.Mlp: fc1 -> act -> drop -> fc2 -> drop."""
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    layers.Mlp = Mlp
    models.layers = layers
    timm.models = models


_NS = None


def load():
    """Build the shim environment and load the reference modules.  Returns
    a namespace with .loss, .matcher, .box_coder, .seq_nms, .vid_eval,
    .diffusion_det, .bounding_box, .boxlist_ops.  Idempotent."""
    global _NS
    if _NS is not None:
        return _NS
    if not ref_available():
        raise FileNotFoundError(REF)

    import torch

    _install_torchvision(torch)
    _install_fvcore(torch)
    _install_detectron2(torch)
    _install_yacs()
    _install_timm(torch)

    # stub package skeleton for mega_core (its real __init__ chain pulls in
    # the compiled _C extension, so we bypass it and load leaf files)
    for name in ("mega_core", "mega_core.modeling",
                 "mega_core.modeling.roi_heads",
                 "mega_core.modeling.roi_heads.box_head",
                 "mega_core.modeling.detector",
                 "mega_core.structures", "mega_core.utils",
                 "mega_core.data", "mega_core.data.datasets",
                 "mega_core.data.datasets.evaluation",
                 "mega_core.data.datasets.evaluation.vid"):
        _mod(name, is_pkg=True)

    mc = os.path.join(REF, "mega_core")
    comm = _load_file("mega_core.utils.comm", os.path.join(mc, "utils/comm.py"))

    # mega_core.layers: real smooth_l1_loss file + pure-torch nms/fps shims
    layers = _mod("mega_core.layers", is_pkg=True)
    sl1 = _load_file("mega_core.layers.smooth_l1_loss",
                     os.path.join(mc, "layers/smooth_l1_loss.py"))
    layers.smooth_l1_loss = sl1.smooth_l1_loss
    layers.nms = sys.modules["torchvision.ops"].nms
    layers.fps = lambda *a, **k: None  # only reachable from model forwards
    sys.modules["mega_core"].layers = layers
    sys.modules["mega_core"].utils = sys.modules["mega_core.utils"]

    bounding_box = _load_file("mega_core.structures.bounding_box",
                              os.path.join(mc, "structures/bounding_box.py"))
    boxlist_ops = _load_file("mega_core.structures.boxlist_ops",
                             os.path.join(mc, "structures/boxlist_ops.py"))
    image_list = _load_file("mega_core.structures.image_list",
                            os.path.join(mc, "structures/image_list.py"))
    matcher = _load_file("mega_core.modeling.matcher",
                         os.path.join(mc, "modeling/matcher.py"))
    box_coder = _load_file("mega_core.modeling.box_coder",
                           os.path.join(mc, "modeling/box_coder.py"))
    _load_file("mega_core.modeling.utils",
               os.path.join(mc, "modeling/utils.py"))
    _load_file("mega_core.modeling.balanced_positive_negative_sampler",
               os.path.join(mc, "modeling/balanced_positive_negative_sampler.py"))

    loss = _load_file("mega_core.modeling.roi_heads.box_head.loss",
                      os.path.join(mc, "modeling/roi_heads/box_head/loss.py"))

    # diffusion_det.py needs two more sibling fakes at import time
    vid_mega = _mod("mega_core.data.datasets.vid_mega")
    vid_mega.view_image_with_boxes = lambda *a, **k: None
    bh = _mod("mega_core.modeling.roi_heads.box_head.box_head")

    class _DynamicHeadStub:
        def __init__(self, *a, **k):
            raise RuntimeError("DynamicHead stub: oracle covers schedule "
                               "math only")

    bh.DynamicHead = _DynamicHeadStub
    backbone_pkg = _mod("mega_core.modeling.backbone", is_pkg=True)
    backbone_pkg.build_backbone = lambda *a, **k: None

    diffusion_det = _load_file(
        "mega_core.modeling.detector.diffusion_det",
        os.path.join(mc, "modeling/detector/diffusion_det.py"))

    seq_nms = _load_file("ref_seq_nms", os.path.join(REF, "seq_nms.py"))
    vid_eval = _load_file(
        "mega_core.data.datasets.evaluation.vid.vid_eval",
        os.path.join(mc, "data/datasets/evaluation/vid/vid_eval.py"))

    _NS = types.SimpleNamespace(
        loss=loss, matcher=matcher, box_coder=box_coder,
        bounding_box=bounding_box, boxlist_ops=boxlist_ops,
        image_list=image_list, comm=comm,
        diffusion_det=diffusion_det, seq_nms=seq_nms, vid_eval=vid_eval)
    return _NS
