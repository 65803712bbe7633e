"""Shipped experiment configs: every YAML loads, BASE: chains resolve, and
the meta-architecture dispatcher builds a model for each (the reference's
config sweep idea, tests/test_detectors.py, actually pointed at the
configs this repo ships)."""

import glob

import pytest

from diffusionvid_tpu.config import load_config
from diffusionvid_tpu.models.detectors import build_detection_model

CONFIGS = sorted(glob.glob("configs/**/*.yaml", recursive=True))
LEAF_CONFIGS = [c for c in CONFIGS if "BASE_RCNN" not in c]


def test_all_configs_found():
    # the reference ships 17 configs (configs/ + DFF/ FGFA/ MEGA/ RDN/)
    assert len(CONFIGS) >= 17


@pytest.mark.parametrize("path", CONFIGS)
def test_config_loads(path):
    cfg = load_config(path)
    assert cfg.MODEL.META_ARCHITECTURE


@pytest.mark.parametrize("path", LEAF_CONFIGS)
def test_dispatcher_builds_model(path):
    cfg = load_config(path)
    model = build_detection_model(cfg)
    assert model is not None


def test_base_chain_values():
    cfg = load_config("configs/BASE_RCNN_8gpu.yaml")
    # linear-scaling rule applied on top of the 1gpu base
    assert cfg.SOLVER.BASE_LR == 0.002
    assert cfg.SOLVER.IMS_PER_BATCH == 8
    assert cfg.MODEL.RPN.ANCHOR_SIZES == (64, 128, 256, 512)  # inherited
    cfg4 = load_config("configs/BASE_RCNN_4gpu.yaml")
    assert cfg4.SOLVER.BASE_LR == 0.001 and cfg4.SOLVER.IMS_PER_BATCH == 4


def test_flagship_values_match_reference():
    cfg = load_config("configs/vid_R_101_DiffusionVID.yaml")
    d = cfg.MODEL.DiffusionDet
    assert (d.NUM_PROPOSALS, d.NUM_HEADS, d.NUM_HEADS_LOCAL) == (300, 3, 1)
    assert cfg.MODEL.VID.MEGA.MEMORY_MANAGEMENT_SIZE_TEST == 900
    assert cfg.INPUT.INFER_BATCH == 8
    swin = load_config("configs/vid_Swin_B_DiffusionVID.yaml")
    assert swin.INPUT.INFER_BATCH == 4
    assert swin.MODEL.VID.MEGA.ALL_FRAME_INTERVAL == 4
    assert swin.MODEL.SWIN.SIZE == "B-22k"
    det = load_config("configs/vid_R_101_DiffusionDET.yaml")
    assert (det.MODEL.DiffusionDet.NUM_HEADS,
            det.MODEL.DiffusionDet.NUM_HEADS_LOCAL) == (4, 0)
    assert det.MODEL.VID.MEGA.GLOBAL.ENABLE is False


def test_base_cycle_raises(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("BASE: b.yaml\nOUTPUT_DIR: x\n")
    b.write_text("BASE: a.yaml\nOUTPUT_DIR: y\n")
    with pytest.raises(ValueError, match="cycle"):
        load_config(str(a))
