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

    if cfg.MODEL.RETINANET_ON or arch == "RetinaNet":
        from .retinanet import RetinaNet
        r = cfg.MODEL.RETINANET
        return RetinaNet(
            depth=cfg.MODEL.RESNETS.DEPTH, num_classes=r.NUM_CLASSES,
            anchor_sizes=tuple(r.ANCHOR_SIZES),
            aspect_ratios=tuple(r.ASPECT_RATIOS),
            strides=tuple(r.ANCHOR_STRIDES),
            scales_per_octave=r.SCALES_PER_OCTAVE, octave=r.OCTAVE,
            fg_iou=r.FG_IOU_THRESHOLD, bg_iou=r.BG_IOU_THRESHOLD,
            loss_alpha=r.LOSS_ALPHA, loss_gamma=r.LOSS_GAMMA,
            reg_beta=r.BBOX_REG_BETA, reg_weight=r.BBOX_REG_WEIGHT,
            pre_nms_top_n=r.PRE_NMS_TOP_N, score_thresh=r.INFERENCE_TH,
            nms_thresh=r.NMS_TH, dtype=dt)

    depth = cfg.MODEL.RESNETS.DEPTH
    ncls = cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES
    dil = cfg.MODEL.RESNETS.RES5_DILATION
    rpn = cfg.MODEL.RPN
    nms_kw = dict(pre_nms=rpn.PRE_NMS_TOP_N_TEST,
                  post_nms=rpn.POST_NMS_TOP_N_TEST,
                  pre_nms_train=rpn.PRE_NMS_TOP_N_TRAIN,
                  post_nms_train=rpn.POST_NMS_TOP_N_TRAIN,
                  num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
                  width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP)

    if method == "base":
        from .rcnn import GeneralizedRCNN
        return GeneralizedRCNN(depth=depth, num_classes=ncls,
                               pre_nms_test=nms_kw["pre_nms"],
                               post_nms_test=nms_kw["post_nms"],
                               pre_nms_train=nms_kw["pre_nms_train"],
                               post_nms_train=nms_kw["post_nms_train"],
                               anchor_sizes=tuple(rpn.ANCHOR_SIZES),
                               num_groups=nms_kw["num_groups"],
                               width_per_group=nms_kw["width_per_group"],
                               res5_dilation=dil,
                               mask_on=bool(cfg.MODEL.MASK_ON),
                               keypoint_on=bool(cfg.MODEL.KEYPOINT_ON),
                               num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES,
                               dtype=dt)
    if method == "dff":
        from .video_archs import DFFArch
        return DFFArch(depth=depth, num_classes=ncls,
                       key_frame_duration=cfg.MODEL.VID.DFF.KEY_FRAME_DURATION,
                       res5_dilation=dil, dtype=dt, **nms_kw)
    if method == "fgfa":
        from .video_archs import FGFAArch
        return FGFAArch(depth=depth, num_classes=ncls, res5_dilation=dil,
                        dtype=dt, **nms_kw)
    # relation-attention structure (roi_box_feature_extractors.py:333-337):
    # base_stage = ATTENTION.STAGE, advanced stage count + distill width
    # from ADVANCED_STAGE / RDN.RATIO · REF_POST_NMS_TOP_N
    attn = cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION
    ref_post = cfg.MODEL.VID.RPN.REF_POST_NMS_TOP_N
    # local_box_enable = ATTENTION.ENABLE and STAGE > 0
    # (generalized_rcnn_mega.py:57-58; the extractor builds attention
    # weights only under ENABLE, roi_box_feature_extractors.py:328):
    # ENABLE off → zero relation stages, which is also what arms the
    # pixel path's replacement semantics (video_archs.pixel_replaces_box)
    attn_kw = dict(relation_stages=attn.STAGE if attn.ENABLE else 0,
                   advanced_stages=attn.ADVANCED_STAGE,
                   advanced_num=int(ref_post * cfg.MODEL.VID.RDN.RATIO),
                   ref_post_nms=ref_post)

    if method == "rdn":
        from .video_archs import RDNArch
        return RDNArch(depth=depth, num_classes=ncls, res5_dilation=dil,
                       dtype=dt, **nms_kw, **attn_kw)
    if method == "mega":
        from .video_archs import MEGAArch
        mega = cfg.MODEL.VID.MEGA
        return MEGAArch(depth=depth, num_classes=ncls, res5_dilation=dil,
                        memory_size=mega.MEMORY_MANAGEMENT_SIZE_TEST,
                        use_stage_mem=mega.MEMORY.ENABLE,
                        mem_frames=mega.MEMORY.SIZE,
                        pixel_attend_local=mega.LOCAL.PIXEL_ATTEND,
                        pixel_attend_global=mega.GLOBAL.PIXEL_ATTEND,
                        pixel_mem_size=mega.MEMORY_MANAGEMENT_SIZE_PIXEL_TEST,
                        dtype=dt, **nms_kw, **attn_kw)
    if method == "dafa":
        from .dafa import SparseRCNNDAFA
        mega = cfg.MODEL.VID.MEGA
        return SparseRCNNDAFA(depth=depth,
                              num_classes=cfg.MODEL.DiffusionDet.NUM_CLASSES,
                              num_proposals=cfg.MODEL.DiffusionDet.NUM_PROPOSALS,
                              memory_size=mega.MEMORY_MANAGEMENT_SIZE_TEST,
                              res_stage=mega.GLOBAL.RES_STAGE,
                              dtype=dt)
    raise ValueError(f"unknown META_ARCHITECTURE={arch} / VID.METHOD={method}")
