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
