"""Config system: defaults + loading the reference's YAML experiment files."""

import os

import pytest

from diffusionvid_tpu.config import get_default_cfg, load_config

REF_CONFIGS = "/root/reference/configs"


def test_defaults_tree():
    c = get_default_cfg()
    assert c.MODEL.DiffusionDet.NUM_PROPOSALS == 300
    assert c.MODEL.VID.MEGA.MEMORY_MANAGEMENT_SIZE_TEST == 750
    assert c.SOLVER.BACKBONE_MULTIPLIER == 0.1


def test_merge_and_freeze():
    c = get_default_cfg()
    c.merge_from_list(["MODEL.DiffusionDet.SAMPLE_STEP", "4",
                       "SOLVER.BASE_LR", "0.001"])
    assert c.MODEL.DiffusionDet.SAMPLE_STEP == 4
    assert c.SOLVER.BASE_LR == 0.001
    c.freeze()
    with pytest.raises(AttributeError):
        c.SOLVER.BASE_LR = 1.0
    c.defrost()
    c.SOLVER.BASE_LR = 1.0


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference absent")
def test_loads_reference_flagship_yaml():
    c = load_config(os.path.join(REF_CONFIGS, "vid_R_101_DiffusionVID.yaml"))
    assert c.MODEL.META_ARCHITECTURE == "DiffusionDet"
    assert c.MODEL.DiffusionDet.NUM_CLASSES == 30
    assert c.MODEL.DiffusionDet.NUM_HEADS == 3
    assert c.MODEL.DiffusionDet.NUM_HEADS_LOCAL == 1
    assert c.MODEL.VID.METHOD == "diffusion"
    assert c.MODEL.VID.MEGA.ALL_FRAME_INTERVAL == 8
    assert c.MODEL.VID.MEGA.MEMORY_MANAGEMENT_SIZE_TEST == 900
    assert c.INPUT.INFER_BATCH == 8
    assert tuple(c.MODEL.ROI_HEADS.IN_FEATURES) == ("p3", "p4", "p5")


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference absent")
def test_loads_all_reference_vid_yamls():
    import glob
    files = sorted(glob.glob(os.path.join(REF_CONFIGS, "*.yaml")))
    assert files
    for f in files:
        c = load_config(f)
        assert "MODEL" in c, f
