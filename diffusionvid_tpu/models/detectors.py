"""Meta-architecture dispatch.

Equivalent of the reference's detector factory
(``mega_core/modeling/detector/detectors.py:11-22``): config →
meta-architecture instance.  The VID METHOD selects the video variant
exactly as the reference's dataset/method pairing does
(``config/paths_catalog.py:232-255``).
"""

from __future__ import annotations

import jax.numpy as jnp


def build_detection_model(cfg, dtype=None):
    """cfg → flax module for the configured meta-architecture."""
    arch = cfg.MODEL.META_ARCHITECTURE
    method = cfg.MODEL.VID.METHOD
    dt = dtype if dtype is not None else (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32)

    if arch == "DiffusionDet" or method == "diffusion":
        from .diffusion_det import DiffusionDetArch
        return DiffusionDetArch.from_config(cfg, dtype=dt)

    depth = cfg.MODEL.RESNETS.DEPTH
    ncls = cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES

    if method == "base":
        from .rcnn import GeneralizedRCNN
        return GeneralizedRCNN(depth=depth, num_classes=ncls, dtype=dt)
    if method == "dff":
        from .video_archs import DFFArch
        return DFFArch(depth=depth, num_classes=ncls,
                       key_frame_duration=cfg.MODEL.VID.DFF.KEY_FRAME_DURATION,
                       dtype=dt)
    if method == "fgfa":
        from .video_archs import FGFAArch
        return FGFAArch(depth=depth, num_classes=ncls, dtype=dt)
    if method == "rdn":
        from .video_archs import RDNArch
        return RDNArch(depth=depth, num_classes=ncls, dtype=dt)
    if method == "mega":
        from .video_archs import MEGAArch
        return MEGAArch(depth=depth, num_classes=ncls,
                        memory_size=cfg.MODEL.VID.MEGA.MEMORY_MANAGEMENT_SIZE_TEST,
                        dtype=dt)
    if method == "dafa":
        from .dafa import SparseRCNNDAFA
        return SparseRCNNDAFA(depth=depth,
                              num_classes=cfg.MODEL.DiffusionDet.NUM_CLASSES,
                              num_proposals=cfg.MODEL.DiffusionDet.NUM_PROPOSALS,
                              dtype=dt)
    raise ValueError(f"unknown META_ARCHITECTURE={arch} / VID.METHOD={method}")
