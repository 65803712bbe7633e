"""Swin torch-parity oracle (VERDICT r2 item #4a).

A hand-written torch Swin (from the published algorithm: window attention
with relative-position-bias table, shifted windows + block masks, patch
merging, patch embed — reference
``mega_core/modeling/backbone/swintransformer.py:86-752``) is named with
released-checkpoint keys, converted through ``convert_torch_state_dict``,
and our flax SwinTransformer must reproduce its stage outputs in fp32.
This covers the places Swin ports break silently: the bias-table
indexing, the qkv head split, the shift masks, and the 2×2 merge order.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusionvid_tpu.models.swin import SwinTransformer  # noqa: E402
from diffusionvid_tpu.utils.checkpoint import merge_pretrained  # noqa: E402
from diffusionvid_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402

pytestmark = pytest.mark.slow

WIN = 7
EMBED = 32
DEPTHS = (2, 2)
HEADS = (2, 4)


class TorchWindowAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.zeros((2 * WIN - 1) ** 2, heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(WIN), torch.arange(WIN), indexing="ij"))
        flat = coords.flatten(1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += WIN - 1
        rel[:, :, 1] += WIN - 1
        rel[:, :, 0] *= 2 * WIN - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):
        nb, n, c = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(nb, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, h)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(nb // nw, nw, h, n, n) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(nb, n, c)
        return self.proj(out)


def t_window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.view(b, h // w, w, wd // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def t_window_reverse(x, w, b, h, wd):
    c = x.shape[-1]
    x = x.view(b, h // w, wd // w, w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, shift):
        super().__init__()
        self.shift = shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):
        """x [B, H, W, C]."""
        b, h, wd, c = x.shape
        hp = -(-h // WIN) * WIN
        wp = -(-wd // WIN) * WIN
        shift = self.shift if min(hp, wp) > WIN else 0
        shortcut = x
        y = self.norm1(x)
        y = F.pad(y, (0, 0, 0, wp - wd, 0, hp - h))
        if shift > 0:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            img = torch.zeros(1, hp, wp, 1)
            cnt = 0
            for hs in (slice(0, -WIN), slice(-WIN, -shift), slice(-shift, None)):
                for ws in (slice(0, -WIN), slice(-WIN, -shift), slice(-shift, None)):
                    img[:, hs, ws] = cnt
                    cnt += 1
            mw = t_window_partition(img, WIN).view(-1, WIN * WIN)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
        else:
            mask = None
        y = t_window_partition(y, WIN)
        y = self.attn(y, mask)
        y = t_window_reverse(y, WIN, b, hp, wp)
        if shift > 0:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = shortcut + y[:, :h, :wd]
        z = self.norm2(x)
        z = self.mlp.fc2(F.gelu(self.mlp.fc1(z)))
        return x + z


class TorchPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        """x [B, H, W, C] (H, W even here)."""
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class TorchSwin(tnn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = tnn.Sequential()
        self.patch_embed.proj = tnn.Conv2d(3, EMBED, 4, stride=4)
        self.patch_embed.norm = tnn.LayerNorm(EMBED)
        self.layers = tnn.ModuleList()
        for s, depth in enumerate(DEPTHS):
            dim = EMBED * 2 ** s
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList([
                TorchSwinBlock(dim, HEADS[s], 0 if i % 2 == 0 else WIN // 2)
                for i in range(depth)])
            if s < len(DEPTHS) - 1:
                layer.downsample = TorchPatchMerging(dim)
            self.layers.append(layer)
            self.add_module(f"norm{s}", tnn.LayerNorm(dim))

    def forward(self, x):
        """x [B, 3, H, W] → dict of NCHW stage outputs."""
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        outs = {}
        for s, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x)
            outs[f"swin{s}"] = getattr(self, f"norm{s}")(x).permute(0, 3, 1, 2)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x)
        return outs


@pytest.mark.slow
@pytest.mark.parametrize("size", [(56, 56), (64, 96)])
def test_swin_forward_parity(size):
    """(64, 96) hits the pad path at every stage (16×24 → 21×28,
    8×12 → 14×14) WITH shifted windows — the torch oracle pads per block
    (the reference strategy) while our trunk pads per stage with a
    re-zeroed attention input, and the outputs must agree exactly."""
    torch.manual_seed(0)
    dec = TorchSwin().eval()
    with torch.no_grad():
        for m in dec.modules():
            if isinstance(m, TorchWindowAttention):
                m.relative_position_bias_table.normal_(0, 0.5)
            if isinstance(m, tnn.LayerNorm):
                m.weight.add_(torch.rand_like(m.weight) * 0.2 - 0.1)
                m.bias.add_(torch.rand_like(m.bias) * 0.1)

    state = {f"backbone.bottom_up.{k}": v.detach().numpy().copy()
             for k, v in dec.state_dict().items()
             if "relative_position_index" not in k}
    conv = convert_torch_state_dict(state)
    assert "_unmatched" not in conv["params"], conv["params"].get("_unmatched")

    model = SwinTransformer(embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
                            window=WIN, out_indices=(0, 1),
                            dtype=jnp.float32)
    x = np.random.RandomState(1).normal(0, 1, (2, *size, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    merged, n = merge_pretrained(variables["params"],
                                 conv["params"]["backbone"], skip_keys=())
    n_leaves = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n == n_leaves, f"copied {n}/{n_leaves}"

    with torch.no_grad():
        want = dec(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    got = model.apply({"params": merged}, jnp.asarray(x))
    for k in ("swin0", "swin1"):
        g = np.asarray(got[k]).transpose(0, 3, 1, 2)
        wv = want[k].numpy()
        assert g.shape == wv.shape, (k, g.shape, wv.shape)
        err = np.abs(g - wv).max() / max(np.abs(wv).max(), 1e-6)
        assert err < 1e-4, f"{k}: rel err {err}"


def test_swin_checkpoint_name_coverage():
    """Every tensor name a released Swin-B checkpoint uses maps into our
    tree, and every backbone parameter receives a value (both directions),
    including relative_position_bias_table and stage norms."""
    torch.manual_seed(0)
    dec = TorchSwin()
    names = [f"backbone.bottom_up.{k}" for k, _ in dec.state_dict().items()
             if "relative_position_index" not in k]
    assert any("relative_position_bias_table" in n for n in names)
    assert any("downsample.reduction" in n for n in names)
    state = {f"backbone.bottom_up.{k}": v.detach().numpy().copy()
             for k, v in dec.state_dict().items()
             if "relative_position_index" not in k}
    conv = convert_torch_state_dict(state)
    assert "_unmatched" not in conv["params"], conv["params"].get("_unmatched")
    model = SwinTransformer(embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
                            window=WIN, out_indices=(0, 1),
                            dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 28, 28, 3)))
    merged, n = merge_pretrained(variables["params"],
                                 conv["params"]["backbone"], skip_keys=())
    assert n == len(jax.tree_util.tree_leaves(variables["params"]))
