"""ALBEF tower converter parity (reference: albef/model_wrapper.py:57-72).

convert_albef must reproduce the reference's checkpoint surgery end to end:
deit-style ViT (fused qkv, eps-1e-6 LayerNorms, NO pre-norm) with
load-time BICUBIC pos-embed interpolation (albef/vit.py:178-202), biased
vision/text projections + F.normalize (model_wrapper.py:93-110), BERT text
tower in CLS-pool mode with cross-attention weights dropped (mode='text'),
and momentum (*_m) copies ignored.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from srsem.explain.dual_encoders import AlbefDualEncoder  # noqa: E402
from srsem.utils.convert import convert_albef  # noqa: E402


class TorchDeitBlock(tnn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(width, eps=1e-6)
        self.qkv = tnn.Linear(width, 3 * width)
        self.proj = tnn.Linear(width, width)
        self.norm2 = tnn.LayerNorm(width, eps=1e-6)
        self.fc1 = tnn.Linear(width, 4 * width)
        self.fc2 = tnn.Linear(4 * width, width)
        self.heads = heads

    def forward(self, x):
        n, t, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(self.norm1(x)).reshape(n, t, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = (torch.einsum("nqhd,nkhd->nhqk", q, k) / hd ** 0.5).softmax(-1)
        h = torch.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, c)
        x = x + self.proj(h)
        return x + self.fc2(tnn.functional.gelu(self.fc1(self.norm2(x))))


class TorchDeit(tnn.Module):
    """ALBEF visual encoder mirror (reference albef/vit.py:97-176):
    timm naming, no norm_pre, pos table added WITHOUT re-interpolation —
    load-time interpolation is the converter's job."""

    def __init__(self, width=96, heads=4, depth=3, patch=8, grid=4):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, width, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, width) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, grid * grid + 1, width) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchDeitBlock(width, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(width, eps=1e-6)

    def forward(self, x):
        n = x.shape[0]
        p = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(n, -1, -1), p], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def _timm_keys(sd):
    out = {}
    for k, v in sd.items():
        k = k.replace(".qkv.", ".attn.qkv.")
        k = (k.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
             if k.startswith("blocks.") else k)
        if (k.startswith("blocks.") and ".proj." in k
                and ".attn." not in k and ".mlp." not in k):
            k = k.replace(".proj.", ".attn.proj.")
        out[k] = v
    return out


def _reference_interpolate(pos, new_side):
    """The reference's interpolate_pos_embed (albef/vit.py:178-202)."""
    width = pos.shape[-1]
    old = int(round(float(pos.shape[1] - 1) ** 0.5))
    grid = pos[:, 1:].reshape(1, old, old, width).permute(0, 3, 1, 2)
    grid = tnn.functional.interpolate(grid, size=(new_side, new_side),
                                      mode="bicubic", align_corners=False)
    grid = grid.permute(0, 2, 3, 1).reshape(1, new_side * new_side, width)
    return torch.cat([pos[:, :1], grid], dim=1)


def _albef_checkpoint(np_rng, tvit, bert_layers=2):
    """Assemble a reference-shaped ALBEF state dict around the mirror."""
    transformers = pytest.importorskip("transformers")

    config = transformers.BertConfig(
        vocab_size=200, hidden_size=48, num_hidden_layers=bert_layers,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    hf = transformers.BertModel(config).eval()

    sd = {}
    for k, v in _timm_keys(tvit.state_dict()).items():
        sd[f"visual_encoder.{k}"] = v
        sd[f"visual_encoder_m.{k}"] = torch.zeros_like(v)  # momentum copy
    for k, v in hf.state_dict().items():
        if k.startswith("pooler."):
            continue
        sd[f"text_encoder.bert.{k}"] = v
        sd[f"text_encoder_m.bert.{k}"] = torch.zeros_like(v)
    # fake upper-layer cross-attention entries — mode='text' skips them
    sd["text_encoder.bert.encoder.layer.1.crossattention.self.query.weight"] = (
        torch.randn(48, 48))
    tvp = tnn.Linear(96, 24)
    ttp = tnn.Linear(48, 24)
    sd.update({f"vision_proj.{k}": v for k, v in tvp.state_dict().items()})
    sd.update({f"text_proj.{k}": v for k, v in ttp.state_dict().items()})
    return sd, hf, tvp, ttp


def test_convert_albef_image_text_parity(np_rng):
    """Same-resolution load: embeddings from AlbefDualEncoder match the
    reference wrapper's normalize(proj(cls)) on both modalities."""
    from srsem.backbones.vit import ClipViT
    from srsem.pseudo.text_embed import MiniLMEncoder

    torch.manual_seed(3)
    tvit = TorchDeit(grid=4).eval()
    sd, hf, tvp, ttp = _albef_checkpoint(np_rng, tvit)
    tree = convert_albef(sd, image_size=32, patch=8)
    assert set(tree) == {"vit", "vision_proj", "text", "text_proj"}
    # momentum copies and cross-attention must not leak through
    assert "crossattention" not in str(
        sorted(tree["text"]["encoder.layer.1"].keys()))

    ids = np_rng.integers(0, 200, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 5:] = 0

    def tokenizer(texts):
        return {"input_ids": ids, "attention_mask": mask}

    enc = AlbefDualEncoder(
        {"params": tree["vit"]}, tree["vision_proj"],
        bert_variables=tree["text"], text_proj=tree["text_proj"],
        tokenizer=tokenizer,
        vit=ClipViT(patch=8, width=96, depth=3, heads=4, dtype=jnp.float32,
                    pos_grid=4, use_norm_pre=False, ln_eps=1e-6),
        bert=MiniLMEncoder(vocab_size=200, hidden=48, layers=2, heads=4,
                           intermediate=96, max_position=64, pool="cls"))

    x = np_rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        cls = tvit(torch.from_numpy(x.transpose(0, 3, 1, 2)))[:, 0]
        want_img = tnn.functional.normalize(tvp(cls), dim=-1).numpy()
        hidden = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                    attention_mask=torch.from_numpy(mask.astype(np.int64))
                    ).last_hidden_state
        want_txt = tnn.functional.normalize(ttp(hidden[:, 0]), dim=-1).numpy()

    np.testing.assert_allclose(np.asarray(enc.encode_image(x)), want_img,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(enc.encode_text(["a", "b"])),
                               want_txt, rtol=1e-4, atol=1e-4)


def test_convert_albef_pos_embed_interpolation(np_rng):
    """Resolution change (grid 4 → 6): the converter's load-time bicubic
    interpolation matches the reference's interpolate_pos_embed exactly,
    and the tower then runs at the new resolution without apply-time
    resizing."""
    from srsem.backbones.vit import ClipViT

    torch.manual_seed(4)
    tvit = TorchDeit(grid=4).eval()
    sd = {f"visual_encoder.{k}": v
          for k, v in _timm_keys(tvit.state_dict()).items()}
    tree = convert_albef(sd, image_size=48, patch=8)
    got_pos = tree["vit"]["pos_embed"]
    assert got_pos.shape == (1, 37, 96)
    with torch.no_grad():
        want_pos = _reference_interpolate(tvit.pos_embed, 6).numpy()
    np.testing.assert_allclose(got_pos, want_pos, rtol=1e-5, atol=1e-6)

    # forward at 48px: torch mirror with the interpolated table loaded
    with torch.no_grad():
        tvit.pos_embed = tnn.Parameter(torch.from_numpy(want_pos))
        x = np_rng.standard_normal((1, 48, 48, 3)).astype(np.float32)
        want = tvit(torch.from_numpy(x.transpose(0, 3, 1, 2)))[:, 0].numpy()
    vit = ClipViT(patch=8, width=96, depth=3, heads=4, dtype=jnp.float32,
                  pos_grid=6, use_norm_pre=False, ln_eps=1e-6)
    got, _ = vit.apply({"params": tree["vit"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_convert_albef_cli_roundtrip(np_rng, tmp_path):
    """`srsem convert --kind albef` wiring: full checkpoint in, msgpack
    tree out, loadable and structurally complete."""
    from flax import serialization

    from srsem.cli.main import main

    torch.manual_seed(5)
    tvit = TorchDeit(grid=4).eval()
    sd, _hf, _tvp, _ttp = _albef_checkpoint(np_rng, tvit)
    ckpt = tmp_path / "albef.pth"
    torch.save(sd, ckpt)
    out = tmp_path / "albef.msgpack"
    rc = main(["convert", str(ckpt), "--kind", "albef",
               "--image-size", "32", "--out", str(out)])
    assert rc == 0
    with open(out, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    assert set(tree) == {"vit", "vision_proj", "text", "text_proj"}
    # checkpoint grid is 4 (64px at patch 16); --image-size 32 → grid 2,
    # so the CLI path exercises the load-time pos-embed interpolation:
    # 1 cls + 2*2 patches.
    assert tree["vit"]["pos_embed"].shape == (1, 5, 96)

    # --patch declares the checkpoint's patch size: at patch 8 the same
    # 32px target lands back on the native grid 4 — no interpolation.
    rc = main(["convert", str(ckpt), "--kind", "albef",
               "--image-size", "32", "--patch", "8", "--out", str(out)])
    assert rc == 0
    with open(out, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    assert tree["vit"]["pos_embed"].shape == (1, 17, 96)
