"""Checkpoint round-trip + torch-name conversion tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.utils import (
    save_checkpoint, load_checkpoint, last_checkpoint, merge_pretrained,
    convert_torch_state_dict,
)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)},
              "b": {"bias": jnp.ones((4,))}}
    out = str(tmp_path / "ckpt")
    p = save_checkpoint(out, 120, params)
    assert last_checkpoint(out) == p
    loaded = load_checkpoint(p)
    np.testing.assert_allclose(np.asarray(loaded["params"]["a"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(loaded["step"]) == 120

    # newer checkpoint moves the pointer
    p2 = save_checkpoint(out, 240, params)
    assert last_checkpoint(out) == p2


def test_merge_pretrained_skips_class_head():
    target = {"head": {"head0": {"class_logits_weight": jnp.zeros((5, 8)),
                                 "linear1": {"weight": jnp.zeros((8, 8))}}}}
    loaded = {"head": {"head0": {"class_logits_weight": jnp.ones((5, 8)),
                                 "linear1": {"weight": jnp.ones((8, 8))}}}}
    merged, n = merge_pretrained(target, loaded, skip_keys=("class_logits",))
    assert n == 1
    assert np.all(np.asarray(merged["head"]["head0"]["linear1"]["weight"]) == 1)
    assert np.all(np.asarray(merged["head"]["head0"]["class_logits_weight"]) == 0)


def test_torch_name_conversion():
    sd = {
        "backbone.bottom_up.stem.conv1.weight": np.zeros((64, 3, 7, 7)),
        "backbone.bottom_up.stem.conv1.norm.weight": np.zeros(64),
        "backbone.bottom_up.stem.conv1.norm.running_mean": np.zeros(64),
        "backbone.bottom_up.res2.0.conv1.weight": np.zeros((64, 64, 1, 1)),
        "backbone.bottom_up.res2.0.conv1.norm.bias": np.zeros(64),
        "backbone.bottom_up.res2.0.shortcut.weight": np.zeros((256, 64, 1, 1)),
        "backbone.bottom_up.res2.0.shortcut.norm.running_var": np.zeros(256),
        "backbone.fpn_lateral3.weight": np.zeros((256, 512, 1, 1)),
        "backbone.fpn_output5.bias": np.zeros(256),
        "head.time_mlp.1.weight": np.zeros((1024, 256)),
        "head.time_mlp.3.bias": np.zeros(1024),
        "head.head_series.0.self_attn.in_proj_weight": np.zeros((768, 256)),
        "head.head_series.0.self_attn.out_proj.weight": np.zeros((256, 256)),
        "head.head_series.0.inst_interact.dynamic_layer.weight": np.zeros((32768, 256)),
        "head.head_series.0.cls_module.0.weight": np.zeros((256, 256)),
        "head.head_series.0.cls_module.1.weight": np.zeros(256),
        "head.head_series.0.reg_module.3.weight": np.zeros((256, 256)),
        "head.head_series.0.reg_module.4.bias": np.zeros(256),
        "head.head_series.0.class_logits.weight": np.zeros((30, 256)),
        "head.head_series.0.bboxes_delta.bias": np.zeros(4),
        "head.head_series_cond.0.c_mlp.1.weight": np.zeros((256, 256)),
        "head.head_series_cond.0.block_time_mlp.1.weight": np.zeros((256, 1024)),
        "head.global_attention.0.0.in_proj_bias": np.zeros(768),
        "head.global_attention.0.0.out_proj.bias": np.zeros(256),
    }
    tree = convert_torch_state_dict(sd)["params"]
    assert "_unmatched" not in tree, tree.get("_unmatched")
    assert tree["backbone"]["conv1"]["weight"].shape == (64, 3, 7, 7)
    assert "running_mean" in tree["backbone"]["bn1"]
    assert tree["backbone"]["layer1.0"]["conv1"]["weight"].shape == (64, 64, 1, 1)
    assert "bias" in tree["backbone"]["layer1.0"]["bn1"]
    assert tree["backbone"]["layer1.0"]["downsample_conv"]["weight"].shape == (256, 64, 1, 1)
    assert "running_var" in tree["backbone"]["layer1.0"]["downsample_bn"]
    assert tree["fpn"]["lateral0"]["Conv_0"]["weight"].shape == (256, 512, 1, 1)
    assert "bias" in tree["fpn"]["output2"]["Conv_0"]
    assert tree["head"]["time_fc1"]["weight"].shape == (1024, 256)
    h0 = tree["head"]["head0"]
    assert h0["self_attn"]["in_proj_weight"].shape == (768, 256)
    assert h0["self_attn"]["out_proj"]["weight"].shape == (256, 256)
    assert h0["inst_interact"]["dynamic_layer"]["weight"].shape == (32768, 256)
    assert h0["cls_module0"]["weight"].shape == (256, 256)
    assert h0["cls_norm0"]["weight"].shape == (256,)
    assert h0["reg_module1"]["weight"].shape == (256, 256)
    assert "bias" in h0["reg_norm1"]
    assert h0["class_logits_weight"].shape == (30, 256)
    assert h0["bboxes_delta"]["bias"].shape == (4,)
    hc = tree["head"]["head_cond0"]
    assert hc["c_mlp"]["weight"].shape == (256, 256)
    assert hc["block_time_mlp"]["weight"].shape == (256, 1024)
    assert tree["head"]["global_attn0"]["in_proj_bias"].shape == (768,)


@pytest.mark.slow  # full model init: ~40 s on this 1-CPU host
def test_conversion_covers_model_tree():
    """Every converted name must exist in the real model tree (no orphans)."""
    from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch
    model = DiffusionDetArch(depth=50, num_classes=5, num_proposals=8,
                             num_heads=1, num_heads_local=1,
                             compute_dtype=jnp.float32)
    b, h, w = 2, 64, 96
    noisy = jnp.tile(jnp.asarray([8.0, 8.0, 60.0, 40.0]), (b, 8, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        jnp.zeros((b, h, w, 3)), noisy, jnp.zeros((b,), jnp.int32),
        num_global=1, train=True)
    params = variables["params"]

    # Build a fake torch state dict from the model's own shapes for a
    # couple of representative modules, convert, and merge: every entry
    # must land.
    sd = {
        "head.head_series.0.linear1.weight":
            np.ones_like(params["head"]["head0"]["linear1"]["weight"]),
        "head.time_mlp.1.weight":
            np.ones_like(params["head"]["time_fc1"]["weight"]),
        "backbone.bottom_up.stem.conv1.weight":
            np.ones_like(params["backbone"]["conv1"]["weight"]),
    }
    conv = convert_torch_state_dict(sd)["params"]
    merged, n = merge_pretrained(params, conv, skip_keys=())
    assert n == 3
    assert np.all(np.asarray(merged["head"]["head0"]["linear1"]["weight"]) == 1)


def test_resolve_weight_catalog_and_paths(tmp_path, monkeypatch):
    """MODEL.WEIGHT resolution (reference paths_catalog.py ModelCatalog):
    local paths pass through; catalog:// maps to the public URL and looks
    up a local cache; anything unresolvable raises with the URL named."""
    import pytest
    from diffusionvid_tpu.utils import resolve_weight

    assert resolve_weight("") is None
    f = tmp_path / "w.pkl"
    f.write_bytes(b"x")
    assert resolve_weight(str(f)) == str(f)

    # catalog entry with a cached copy under $DIFFUSIONVID_WEIGHTS
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "R-101.pkl").write_bytes(b"x")
    monkeypatch.setenv("DIFFUSIONVID_WEIGHTS", str(cache))
    got = resolve_weight("catalog://ImageNetPretrained/MSRA/R-101")
    assert got == str(cache / "R-101.pkl")

    with pytest.raises(FileNotFoundError, match="dl.fbaipublicfiles"):
        resolve_weight("catalog://ImageNetPretrained/MSRA/R-50")
    with pytest.raises(FileNotFoundError, match="catalog entry"):
        resolve_weight("catalog://ImageNetPretrained/NOPE/X")
    with pytest.raises(FileNotFoundError, match="does not exist"):
        resolve_weight("/no/such/file.pkl")
