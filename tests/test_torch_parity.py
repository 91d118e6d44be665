"""Golden-activation parity vs torch mirror models.

The reference runs on timm pretrained towers; with zero egress we validate
architecture + converter correctness against randomly-initialized torch
mirrors written here (torchvision/timm ResNet-50 layout and OpenAI CLIP's
ModifiedResNet layout), per SURVEY.md §4's parity-test strategy.  If our
NHWC Flax towers reproduce a random torch network bit-for-bit (to fp32
tolerance) through the converter, pretrained checkpoints convert
identically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from collections import OrderedDict  # noqa: E402

from srsem.backbones.resnet import ClipResNet50, ImageNetResNet50  # noqa: E402
from srsem.utils.convert import (  # noqa: E402
    convert_clip_resnet50,
    convert_torch_resnet50,
)


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if stride != 1 or cin != width * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4))

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        sc = self.downsample(x) if self.downsample is not None else x
        return self.relu(h + sc)


class TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for s, (blocks, width) in enumerate(
                zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1):
            layers = []
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 1) else 1
                layers.append(TorchBottleneck(cin, width, stride))
                cin = width * 4
            setattr(self, f"layer{s}", tnn.Sequential(*layers))

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        taps = {}
        for s in range(1, 5):
            layer = getattr(self, f"layer{s}")
            for b, block in enumerate(layer):
                h = block(h)
                if b == 2:
                    taps[f"layer{s}.2.act3"] = h
        return h.mean(dim=(2, 3)), taps


class TorchClipBottleneck(tnn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if stride > 1 or cin != width * 4:
            self.downsample = tnn.Sequential(OrderedDict([
                ("-1", tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()),
                ("0", tnn.Conv2d(cin, width * 4, 1, bias=False)),
                ("1", tnn.BatchNorm2d(width * 4)),
            ]))

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.avgpool(h)
        h = self.bn3(self.conv3(h))
        sc = self.downsample(x) if self.downsample is not None else x
        return self.relu(h + sc)


class TorchAttentionPool(tnn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = tnn.Linear(embed_dim, embed_dim)
        self.q_proj = tnn.Linear(embed_dim, embed_dim)
        self.v_proj = tnn.Linear(embed_dim, embed_dim)
        self.c_proj = tnn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # (HW, N, C)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = tnn.functional.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight, k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight, in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight, out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False)
        return out.squeeze(0)


class TorchClipResNet50(tnn.Module):
    def __init__(self, image_size=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(32)
        self.conv2 = tnn.Conv2d(32, 32, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(32)
        self.conv3 = tnn.Conv2d(32, 64, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(64)
        self.avgpool = tnn.AvgPool2d(2)
        self.relu = tnn.ReLU()
        cin = 64
        for s, (blocks, width) in enumerate(
                zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1):
            layers = []
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 1) else 1
                layers.append(TorchClipBottleneck(cin, width, stride))
                cin = width * 4
            setattr(self, f"layer{s}", tnn.Sequential(*layers))
        self.attnpool = TorchAttentionPool(image_size // 32, 2048, 32, 1024)

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.relu(self.bn3(self.conv3(h)))
        taps = {"stem.conv3": h}
        h = self.avgpool(h)
        for s in range(1, 5):
            for b, block in enumerate(getattr(self, f"layer{s}")):
                h = block(h)
                if b == 2:
                    taps[f"stages.{s - 1}.2.act"] = h
        return self.attnpool(h), taps


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def test_imagenet_resnet50_matches_torch(np_rng):
    tm = TorchResNet50().eval()
    _randomize_bn(tm)
    params = convert_torch_resnet50(tm.state_dict())

    x = np_rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_pooled, t_taps = tm(_nchw(x))

    jm = ImageNetResNet50(dtype=np.float32)
    pooled, taps = jm.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(pooled), t_pooled.numpy(), rtol=1e-4, atol=1e-4)
    for name in ("layer1.2.act3", "layer4.2.act3"):
        np.testing.assert_allclose(
            np.asarray(taps[name]),
            t_taps[name].permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_clip_resnet50_matches_torch(np_rng):
    tm = TorchClipResNet50(image_size=64).eval()
    _randomize_bn(tm)
    params = convert_clip_resnet50(tm.state_dict(), image_size=64)

    x = np_rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_emb, t_taps = tm(_nchw(x))

    jm = ClipResNet50(dtype=np.float32, image_size=64)
    emb, taps = jm.apply({"params": params}, x)
    for name in ("stem.conv3", "stages.0.2.act", "stages.3.2.act"):
        np.testing.assert_allclose(
            np.asarray(taps[name]),
            t_taps[name].permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(emb), t_emb.numpy(), rtol=1e-3, atol=1e-3)


class TorchViTBlock(tnn.Module):
    def __init__(self, width=768, heads=12):
        super().__init__()
        self.norm1 = tnn.LayerNorm(width, eps=1e-5)
        self.qkv = tnn.Linear(width, 3 * width)
        self.proj = tnn.Linear(width, width)
        self.norm2 = tnn.LayerNorm(width, eps=1e-5)
        self.fc1 = tnn.Linear(width, 4 * width)
        self.fc2 = tnn.Linear(4 * width, width)
        self.heads = heads

    def forward(self, x):
        n, t, c = x.shape
        hd = c // self.heads
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(n, t, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("nqhd,nkhd->nhqk", q, k) / hd ** 0.5
        attn = attn.softmax(dim=-1)
        h = torch.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, c)
        x = x + self.proj(h)
        branch = self.fc2(tnn.functional.gelu(self.fc1(self.norm2(x))))
        return x + branch, branch


class TorchClipViT(tnn.Module):
    def __init__(self, width=96, heads=4, depth=3, patch=8):
        super().__init__()
        # state-dict keys must match timm naming for the converter
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, width, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, width) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 17, width) * 0.02)
        self.norm_pre = tnn.LayerNorm(width, eps=1e-5)
        self.blocks = tnn.ModuleList(
            [TorchViTBlock(width, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(width, eps=1e-5)

    def forward(self, x):
        n = x.shape[0]
        p = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(n, -1, -1), p], dim=1)
        x = self.norm_pre(x + self.pos_embed)
        taps = {}
        for i, blk in enumerate(self.blocks):
            x, branch = blk(x)
            taps[f"blocks.{i}.ls2"] = branch
        return self.norm(x)[:, 0], taps


def test_clip_vit_matches_torch(np_rng):
    from srsem.backbones.vit import ClipViT
    from srsem.utils.convert import convert_clip_vit

    tm = TorchClipViT().eval()
    # flatten blocks.N names like timm ("blocks.0.norm1.weight", ...)
    sd = {k.replace("blocks.", "blocks.").replace(".qkv.", ".attn.qkv.")
           .replace(".proj.weight", ".proj.weight")
           .replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2."): v
          for k, v in tm.state_dict().items()}
    # block proj → attn.proj (but not patch_embed.proj)
    sd = {(k.replace(".proj.", ".attn.proj.")
           if k.startswith("blocks.") and ".attn." not in k and ".mlp." not in k
           and ".proj." in k else k): v
          for k, v in sd.items()}
    params = convert_clip_vit(sd)

    x = np_rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_emb, t_taps = tm(_nchw(x))

    jm = ClipViT(patch=8, width=96, depth=3, heads=4, dtype=np.float32, pos_grid=4)
    emb, taps = jm.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(emb), t_emb.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(taps["blocks.2.ls2"]),
                               t_taps["blocks.2.ls2"].numpy(),
                               rtol=1e-4, atol=1e-4)


class TorchStagesCnnHead(tnn.Module):
    """The reference's per-stage scoring head + aggregation
    (models/global_eval_models.py:336,379-395), over the CLIP mirror."""

    def __init__(self, backbone, depth=3):
        super().__init__()
        self.backbone = backbone
        self.depth = depth
        # reference: range(3-depth, 4) → depth+1 heads
        self.w_layers = tnn.ModuleList(
            [tnn.Conv2d(256 * (2 ** s), 1, kernel_size=1)
             for s in range(3 - depth, 4)])

    def forward(self, a, b):
        with torch.no_grad():
            _, taps_a = self.backbone(a)
            _, taps_b = self.backbone(b)
        names = [f"stages.{s}.2.act" for s in range(3 - self.depth, 4)]
        scores = []
        for conv, name in zip(self.w_layers, names):
            diff = (taps_a[name] - taps_b[name]) ** 2
            w = conv(diff).squeeze(1)
            scores.append(w.mean(dim=(-1, -2)))
        s = torch.stack(scores).mean(dim=0)
        return torch.relu(s)


def test_full_global_scoring_pipeline_matches_torch(np_rng):
    """End-to-end score parity: backbone → squared diffs → 1x1-conv heads →
    spatial/layer mean → ReLU. This is the path the SRCC-within-0.005
    north star rides on (BASELINE.md)."""
    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.models.global_models import make_global_model
    from flax import traverse_util

    depth = 3
    tbb = TorchClipResNet50(image_size=64).eval()
    _randomize_bn(tbb)
    tmodel = TorchStagesCnnHead(tbb, depth=depth).eval()

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=depth)
    jmodel = make_global_model(cfg)

    backbone_params = convert_clip_resnet50(tbb.state_dict(), image_size=64)
    head_flat = {}
    for j, conv in enumerate(tmodel.w_layers):
        head_flat[(f"w_layers.{j}", "kernel")] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(-1, 1))
        head_flat[(f"w_layers.{j}", "bias")] = conv.bias.detach().numpy()
    params = {"backbone": backbone_params,
              "aggregator": traverse_util.unflatten_dict(head_flat)}

    a = np_rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    b = (a + 0.3 * np_rng.standard_normal(a.shape)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(_nchw(a), _nchw(b)).numpy()
    got = np.asarray(jmodel.apply({"params": params}, a, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # The Pallas fused path must agree with both.
    from srsem.backbones.resnet import ClipResNet50
    from srsem.models.global_models import stage_taps_for
    from srsem.ops.fused_head import fused_global_score

    jbb = ClipResNet50(dtype=np.float32, image_size=64)
    import jax.numpy as jnp

    _, taps = jbb.apply({"params": backbone_params},
                        jnp.concatenate([a, b], axis=0))
    names = stage_taps_for("resnet50_clip", depth)
    fused = np.asarray(fused_global_score(
        {k: taps[k][:2] for k in names}, {k: taps[k][2:] for k in names},
        params["aggregator"], names, interpret=True))
    np.testing.assert_allclose(fused, want, rtol=1e-4, atol=1e-4)
