"""Torch-weight parity harness (SURVEY.md hard part (e)).

Builds reference-shaped torch modules with RANDOM weights, converts their
state dicts through utils/torch_convert, and asserts the JAX forward
reproduces the torch forward — catching any layout/name/numerics
regression that would break ingestion of the released checkpoints
(torchvision-R-101.pkl / Caffe2 R-50/R-101, reference
``c2_model_loading.py``, ``model_serialization.py``).
"""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusionvid_tpu.models.resnet import ResNet  # noqa: E402
from diffusionvid_tpu.utils.checkpoint import merge_pretrained  # noqa: E402
from diffusionvid_tpu.utils.torch_convert import (  # noqa: E402
    c2_to_torch_names, convert_backbone_only, d2_body_to_torchvision,
    load_torch_checkpoint)

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


# ---------------------------------------------------------------------------
# torch-side reference ResNet (torchvision layout: stride in the 3x3,
# which is what STRIDE_IN_1X1=False / "R-101-torchvision" means)
# ---------------------------------------------------------------------------

class TorchBottleneck(tnn.Module):
    def __init__(self, cin, mid, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample_conv = None
        if stride != 1 or cin != cout:
            self.downsample_conv = tnn.Conv2d(cin, cout, 1, stride=stride,
                                              bias=False)
            self.downsample_bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        idt = x
        y = self.bn1(self.conv1(x)).relu()
        y = self.bn2(self.conv2(y)).relu()
        y = self.bn3(self.conv3(y))
        if self.downsample_conv is not None:
            idt = self.downsample_bn(self.downsample_conv(x))
        return (y + idt).relu()


class TorchResNet50(tnn.Module):
    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cin, mid, cout = 64, 64, 256
        for s, n in enumerate(blocks):
            layer = tnn.Sequential(*[
                TorchBottleneck(cin if b == 0 else cout, mid, cout,
                                stride=(1 if s == 0 else 2) if b == 0 else 1)
                for b in range(n)])
            self.add_module(f"layer{s + 1}", layer)
            cin, mid, cout = cout, mid * 2, cout * 2

    def forward(self, x):
        x = self.bn1(self.conv1(x)).relu()
        x = self.maxpool(x)
        outs = {}
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
            outs[f"res{s + 1}"] = x
        return outs


def _randomize_bn_stats(model, rng):
    """Random running stats so FrozenBN folding is actually exercised."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            f = m.num_features
            m.running_mean.copy_(torch.tensor(rng.normal(0, 0.5, f),
                                              dtype=torch.float32))
            m.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, f),
                                             dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(rng.normal(1, 0.2, f),
                                             dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(rng.normal(0, 0.2, f),
                                           dtype=torch.float32))


def _torchvision_names(state):
    """Our TorchBottleneck registers downsample_conv/bn directly, which is
    already this repo's naming; keys are torchvision-like otherwise."""
    return {k: v.numpy() for k, v in state.items()
            if "num_batches_tracked" not in k}


@pytest.fixture(scope="module")
def torch_resnet():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    model = TorchResNet50().eval()
    _randomize_bn_stats(model, rng)
    return model


@pytest.mark.slow
def test_resnet50_forward_parity(torch_resnet):
    """Converted torchvision-layout weights reproduce the torch forward on
    all four stages (fp32, FrozenBN folding vs eval-mode BN)."""
    x = np.random.RandomState(1).normal(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = torch_resnet(torch.from_numpy(x))

    state = _torchvision_names(torch_resnet.state_dict())
    conv = convert_backbone_only(state)
    assert "_unmatched" not in conv["params"], conv["params"].get("_unmatched")

    model = ResNet(depth=50, out_features=("res2", "res3", "res4", "res5"),
                   dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3)))
    merged, n = merge_pretrained(variables["params"],
                                 conv["params"]["backbone"], skip_keys=())
    # every backbone tensor must have been copied
    n_leaves = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n == n_leaves, f"copied {n}/{n_leaves}"

    out = model.apply({"params": merged},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    for k in ("res2", "res3", "res4", "res5"):
        got = np.asarray(out[k]).transpose(0, 3, 1, 2)
        want = ref[k].numpy()
        assert got.shape == want.shape, (k, got.shape, want.shape)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        assert err < 2e-4, f"{k}: rel err {err}"


@pytest.mark.slow
def test_d2_pkl_ingestion_roundtrip(torch_resnet, tmp_path):
    """A detectron2-style trunk .pkl (plain pickle, stem./resN. names)
    loads through load_torch_checkpoint and reproduces the torch forward —
    the flagship config's WEIGHT format (torchvision-R-101.pkl)."""
    state = _torchvision_names(torch_resnet.state_dict())
    d2 = {}
    for k, v in state.items():
        n = k
        if n.startswith("conv1."):
            n = "stem." + n
        elif n.startswith("bn1."):
            n = "stem.conv1.norm." + n.split(".", 1)[1]
        else:
            import re
            m = re.match(r"layer(\d)\.(\d+)\.(.+)$", n)
            rest = m.group(3)
            rest = rest.replace("downsample_conv.", "shortcut.")
            rest = rest.replace("downsample_bn.", "shortcut.norm.")
            rest = re.sub(r"^bn(\d)\.", r"conv\1.norm.", rest)
            n = f"res{int(m.group(1)) + 1}.{m.group(2)}.{rest}"
        d2[n] = v
    path = tmp_path / "torchvision-R-50.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": d2, "__author__": "torchvision"}, f)

    conv = load_torch_checkpoint(str(path))
    assert "_unmatched" not in conv["params"], conv["params"].get("_unmatched")

    x = np.random.RandomState(2).normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = torch_resnet(torch.from_numpy(x))
    model = ResNet(depth=50, out_features=("res5",), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    merged, n = merge_pretrained(variables["params"],
                                 conv["params"]["backbone"], skip_keys=())
    n_leaves = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n == n_leaves
    out = model.apply({"params": merged}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(out["res5"]).transpose(0, 3, 1, 2)
    err = np.abs(got - ref["res5"].numpy()).max() / np.abs(ref["res5"].numpy()).max()
    assert err < 2e-4


def test_c2_name_conversion():
    """Caffe2 blob names map to torchvision names with identity BN stats
    (c2_model_loading.py renaming)."""
    state = {
        "conv1_w": np.zeros((64, 3, 7, 7)),
        "conv1_bn_s": np.ones((64,)), "conv1_bn_b": np.zeros((64,)),
        "res2_0_branch2a_w": np.zeros((64, 64, 1, 1)),
        "res2_0_branch2a_bn_s": np.ones((64,)),
        "res2_0_branch2a_bn_b": np.zeros((64,)),
        "res3_1_branch1_w": np.zeros((512, 256, 1, 1)),
        "res3_1_branch1_bn_s": np.ones((512,)),
        "res3_1_branch1_bn_b": np.zeros((512,)),
    }
    out = c2_to_torch_names(state)
    assert "conv1.weight" in out and "bn1.weight" in out
    assert "layer1.0.conv1.weight" in out and "layer1.0.bn1.weight" in out
    assert "layer2.1.downsample_conv.weight" in out
    assert "layer2.1.downsample_bn.weight" in out
    # synthesized identity stats
    assert np.all(out["bn1.running_mean"] == 0)
    assert np.all(out["bn1.running_var"] == 1)
    assert np.all(out["layer1.0.bn1.running_var"] == 1)

    conv = convert_backbone_only(out)
    assert "_unmatched" not in conv["params"]
    bk = conv["params"]["backbone"]
    assert "layer1.0" in bk and "conv1" in bk["layer1.0"]


def test_d2_body_renaming():
    state = {"stem.conv1.weight": np.zeros((64, 3, 7, 7)),
             "stem.conv1.norm.weight": np.ones((64,)),
             "res2.0.conv2.norm.running_mean": np.zeros((64,)),
             "res4.5.shortcut.weight": np.zeros((1024, 512, 1, 1)),
             "res4.5.shortcut.norm.bias": np.zeros((1024,))}
    out = d2_body_to_torchvision(state)
    assert "conv1.weight" in out
    assert "bn1.weight" in out
    assert "layer1.0.bn2.running_mean" in out
    assert "layer3.5.downsample_conv.weight" in out
    assert "layer3.5.downsample_bn.bias" in out


def _reference_checkpoint_names(blocks=(3, 4, 6, 3), fpn_levels=(3, 4, 5),
                                num_heads=1, num_heads_local=1,
                                num_cls=1, num_reg=3):
    """Enumerate the tensor names a released DiffusionVID checkpoint uses
    (detectron2 module naming: backbone.bottom_up/stem/resN + fpn_lateral/
    output, head.time_mlp/head_series/head_series_cond/global_attention —
    see utils/torch_convert.py docstring and the reference box_head.py)."""
    names = []
    bn = ["weight", "norm.weight", "norm.bias", "norm.running_mean",
          "norm.running_var"]
    for leaf in bn:
        names.append(f"backbone.bottom_up.stem.conv1.{leaf}")
    for s, n in zip(range(2, 6), blocks):
        for b in range(n):
            for conv in ("conv1", "conv2", "conv3"):
                for leaf in bn:
                    names.append(f"backbone.bottom_up.res{s}.{b}.{conv}.{leaf}")
            if b == 0:
                for leaf in bn:
                    names.append(f"backbone.bottom_up.res{s}.{b}.shortcut.{leaf}")
    for l in fpn_levels:
        for kind in ("lateral", "output"):
            for leaf in ("weight", "bias"):
                names.append(f"backbone.fpn_{kind}{l}.{leaf}")
    for i in (1, 3):
        for leaf in ("weight", "bias"):
            names.append(f"head.time_mlp.{i}.{leaf}")

    def rcnn_head(prefix, cond):
        out = []
        for leaf in ("in_proj_weight", "in_proj_bias"):
            out.append(f"{prefix}.self_attn.{leaf}")
        for leaf in ("weight", "bias"):
            out.append(f"{prefix}.self_attn.out_proj.{leaf}")
            for m in ("dynamic_layer", "norm1", "norm2", "norm3",
                      "out_layer"):
                out.append(f"{prefix}.inst_interact.{m}.{leaf}")
            for m in ("linear1", "linear2", "norm1", "norm2", "norm3",
                      "class_logits", "bboxes_delta"):
                out.append(f"{prefix}.{m}.{leaf}")
            out.append(f"{prefix}.block_time_mlp.1.{leaf}")
            for j in range(num_cls):
                # tower Linears are bias-free (nn.Linear(d, d, False),
                # reference box_head.py:470,479); the LayerNorms have both
                if leaf == "weight":
                    out.append(f"{prefix}.cls_module.{3 * j}.weight")
                out.append(f"{prefix}.cls_module.{3 * j + 1}.{leaf}")
            for j in range(num_reg):
                if leaf == "weight":
                    out.append(f"{prefix}.reg_module.{3 * j}.weight")
                out.append(f"{prefix}.reg_module.{3 * j + 1}.{leaf}")
            if cond:
                out.append(f"{prefix}.c_mlp.1.{leaf}")
        return out

    for i in range(num_heads):
        names.extend(rcnn_head(f"head.head_series.{i}", cond=False))
    for i in range(num_heads_local):
        names.extend(rcnn_head(f"head.head_series_cond.{i}", cond=True))
        for leaf in ("in_proj_weight", "in_proj_bias"):
            names.append(f"head.global_attention.{i}.0.{leaf}")
        for leaf in ("weight", "bias"):
            names.append(f"head.global_attention.{i}.0.out_proj.{leaf}")
    return names


@pytest.mark.slow
def test_full_flagship_checkpoint_coverage():
    """Every tensor of a reference-shaped full-model state dict maps onto
    our DiffusionDetArch tree, and every one of our parameters receives a
    value — catching name-map or layout drift in either direction."""
    from diffusionvid_tpu.models.diffusion_det import (
        DiffusionDetArch, signal_to_boxes)
    from diffusionvid_tpu.utils.torch_convert import convert_torch_state_dict

    model = DiffusionDetArch(depth=50, num_classes=7, num_proposals=16,
                             hidden_dim=256, num_heads=1, num_heads_local=1,
                             compute_dtype=jnp.float32)
    h, w, f = 64, 96, 1
    whwh = jnp.asarray([w, h, w, h], jnp.float32)
    boxes = signal_to_boxes(
        jax.random.normal(jax.random.PRNGKey(0), (f, 16, 4)), whwh, 2.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        jnp.zeros((f, h, w, 3)), boxes, jnp.zeros((f,), jnp.int32),
        num_global=1, train=False)
    params = variables["params"]

    names = _reference_checkpoint_names(num_heads=1, num_heads_local=1)
    # learn the name -> tree path mapping with dummies, then re-run with
    # the real shapes pulled from our tree
    dummy = convert_torch_state_dict({n: np.zeros((1,)) for n in names})
    assert "_unmatched" not in dummy["params"], dummy["params"]["_unmatched"]

    flat_ours = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    # rebuild with correct shapes: map each checkpoint name to its tree
    # path (converting it alone), then pull the target shape from our tree
    assert len(jax.tree_util.tree_flatten_with_path(dummy["params"])[0]) \
        == len(names)
    state = {}
    dummy_single = {n: convert_torch_state_dict({n: np.zeros((1,))})
                    for n in names}
    for n in names:
        paths = jax.tree_util.tree_flatten_with_path(
            dummy_single[n]["params"])[0]
        assert len(paths) == 1, (n, paths)
        path = paths[0][0]
        assert path in flat_ours, (n, path)
        state[n] = np.asarray(jax.random.normal(
            jax.random.PRNGKey(hash(n) % (2 ** 31)),
            np.shape(flat_ours[path])))

    conv = convert_torch_state_dict(state)
    assert "_unmatched" not in conv["params"]
    merged, n_copied = merge_pretrained(params, conv["params"], skip_keys=())
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert n_copied == n_leaves, f"copied {n_copied}/{n_leaves}"
