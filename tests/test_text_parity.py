"""Text-tower parity: MiniLM encoder vs HF BertModel (random init) and the
CLIP text encoder vs a torch mirror — pins the C2C/C2I embedding math."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from srsem.pseudo.text_embed import MiniLMEncoder, convert_hf_minilm  # noqa: E402
from srsem.pseudo.clip_text import ClipTextEncoder  # noqa: E402
from srsem.utils.convert import convert_clip_text  # noqa: E402


def test_minilm_matches_hf_bert(np_rng):
    transformers = pytest.importorskip("transformers")

    config = transformers.BertConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    hf = transformers.BertModel(config).eval()

    params = convert_hf_minilm(hf.state_dict())
    model = MiniLMEncoder(vocab_size=200, hidden=32, layers=2, heads=4,
                          intermediate=64, max_position=64)

    ids = np_rng.integers(0, 200, (3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[1, 6:] = 0  # padded row

    with torch.no_grad():
        hidden = hf(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)).last_hidden_state
        m = torch.from_numpy(mask).unsqueeze(-1).float()
        pooled = (hidden * m).sum(1) / m.sum(1)
        want = torch.nn.functional.normalize(pooled, dim=-1).numpy()

    got = np.asarray(model.apply({"params": params},
                                 ids.astype(np.int32), mask.astype(np.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TorchClipTextBlock(torch.nn.Module):
    def __init__(self, width=32, heads=4):
        super().__init__()
        tnn = torch.nn
        self.ln_1 = tnn.LayerNorm(width, eps=1e-5)
        self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(width, eps=1e-5)
        self.mlp = tnn.ModuleDict({
            "c_fc": tnn.Linear(width, 4 * width),
            "c_proj": tnn.Linear(4 * width, width)})

    def forward(self, x, mask):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + a
        h = self.ln_2(x)
        h = self.mlp["c_fc"](h)
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.mlp["c_proj"](h)


class TorchClipText(torch.nn.Module):
    def __init__(self, vocab=100, width=32, layers=2, heads=4, ctx=16,
                 embed_dim=24):
        super().__init__()
        tnn = torch.nn
        self.token_embedding = tnn.Embedding(vocab, width)
        self.positional_embedding = tnn.Parameter(torch.randn(ctx, width) * 0.01)
        self.blocks = tnn.ModuleList(
            [TorchClipTextBlock(width, heads) for _ in range(layers)])
        self.ln_final = tnn.LayerNorm(width, eps=1e-5)
        self.text_projection = tnn.Parameter(torch.randn(width, embed_dim) * 0.02)

    def forward(self, ids):
        t = ids.shape[1]
        x = self.token_embedding(ids) + self.positional_embedding[:t]
        mask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
        for blk in self.blocks:
            x = blk(x, mask)
        x = self.ln_final(x)
        eot = ids.argmax(dim=-1)
        feats = x[torch.arange(ids.shape[0]), eot]
        return feats @ self.text_projection

    def state_dict_openai(self):
        """Rename to the OpenAI-CLIP layout convert_clip_text expects."""
        sd = {}
        sd["token_embedding.weight"] = self.token_embedding.weight
        sd["positional_embedding"] = self.positional_embedding
        sd["text_projection"] = self.text_projection
        sd["ln_final.weight"] = self.ln_final.weight
        sd["ln_final.bias"] = self.ln_final.bias
        for i, blk in enumerate(self.blocks):
            p = f"transformer.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = blk.attn.in_proj_weight
            sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias
            sd[f"{p}.attn.out_proj.weight"] = blk.attn.out_proj.weight
            sd[f"{p}.attn.out_proj.bias"] = blk.attn.out_proj.bias
            for ln in ("ln_1", "ln_2"):
                sd[f"{p}.{ln}.weight"] = getattr(blk, ln).weight
                sd[f"{p}.{ln}.bias"] = getattr(blk, ln).bias
            for lin in ("c_fc", "c_proj"):
                sd[f"{p}.mlp.{lin}.weight"] = blk.mlp[lin].weight
                sd[f"{p}.mlp.{lin}.bias"] = blk.mlp[lin].bias
        return sd


def test_clip_text_encoder_matches_torch(np_rng):
    tm = TorchClipText().eval()
    params = convert_clip_text(tm.state_dict_openai())
    model = ClipTextEncoder(vocab_size=100, width=32, layers=2, heads=4,
                            context=16, embed_dim=24)
    ids = np_rng.integers(1, 100, (2, 12)).astype(np.int64)
    ids[:, -1] = 99  # EOT = argmax token
    with torch.no_grad():
        want = tm(torch.from_numpy(ids)).numpy()
    got = np.asarray(model.apply({"params": params}, ids.astype(np.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_hf_clip_text_converter_matches_transformers(np_rng):
    transformers = pytest.importorskip("transformers")

    cfg = transformers.CLIPTextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, projection_dim=24,
        attention_dropout=0.0)
    hf = transformers.CLIPTextModelWithProjection(cfg).eval()

    from srsem.utils.convert import convert_hf_clip_text

    params = convert_hf_clip_text(hf.state_dict())
    model = ClipTextEncoder(vocab_size=120, width=32, layers=2, heads=4,
                            context=16, embed_dim=24)
    ids = np_rng.integers(1, 100, (2, 12)).astype(np.int64)
    ids[:, -1] = 119  # EOT = argmax token
    with torch.no_grad():
        hidden = hf.text_model(
            input_ids=torch.from_numpy(ids)).last_hidden_state
        eot = torch.from_numpy(ids).argmax(dim=-1)
        feats = hidden[torch.arange(2), eot]
        want = hf.text_projection(feats).numpy()
    got = np.asarray(model.apply({"params": params}, ids.astype(np.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_hf_clip_vit_converter_matches_transformers(np_rng):
    transformers = pytest.importorskip("transformers")

    from srsem.backbones.vit import ClipViT
    from srsem.utils.convert import convert_hf_clip_vit

    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        attention_dropout=0.0)
    hf = transformers.CLIPVisionModel(cfg).eval()

    params = convert_hf_clip_vit(hf.state_dict())
    model = ClipViT(patch=8, width=32, depth=2, heads=4,
                    dtype=np.float32, pos_grid=4, act="quick_gelu")
    x = np_rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        want = out.pooler_output.numpy()  # post_layernorm(cls)
    emb, _ = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-4, atol=1e-4)


def test_slip_converter_composes_and_matches_torch(np_rng):
    """convert_slip: a SLIP-layout checkpoint (timm ViT under visual. +
    OpenAI text transformer + projection matrices) drives SlipDualEncoder
    to torch-identical embeddings."""
    from tests.test_torch_parity import TorchClipViT, _nchw

    from srsem.backbones.vit import ClipViT
    from srsem.explain.dual_encoders import SlipDualEncoder
    from srsem.pseudo.clip_text import ClipTextEncoder
    from srsem.utils.convert import convert_slip

    tvit = TorchClipViT().eval()  # timm-ish naming, width 96, patch 8
    ttext = TorchClipText(vocab=100, width=32, layers=2, heads=4, ctx=16,
                          embed_dim=24).eval()
    img_proj = torch.randn(96, 24) * 0.05

    sd = {}
    for k, v in tvit.state_dict().items():
        k = (k.replace(".qkv.", ".attn.qkv.")
              .replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2."))
        if k.startswith("blocks.") and ".attn." not in k and ".mlp." not in k \
                and ".proj." in k:
            k = k.replace(".proj.", ".attn.proj.")
        sd["visual." + k] = v
    sd.update({k: v for k, v in ttext.state_dict_openai().items()})
    sd["image_projection"] = img_proj
    # SLIP's text_projection goes width→embed; reuse the torch mirror's.
    parts = convert_slip(sd)

    vit = ClipViT(patch=8, width=96, depth=3, heads=4, dtype=np.float32,
                  pos_grid=4)
    enc = SlipDualEncoder(
        {"params": parts["vit"]}, parts["image_projection"], vit=vit,
        text_encoder=ClipTextEncoder(vocab_size=100, width=32, layers=2,
                                     heads=4, context=16, embed_dim=24),
        text_variables={"params": parts["text"]},
        tokenizer=lambda texts: np.array([[1, 5, 99] + [0] * 13]))

    x = np_rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        cls, _ = tvit(_nchw(x))
        want_img = (cls @ img_proj).numpy()
    got_img = np.asarray(enc.encode_image(x))
    np.testing.assert_allclose(got_img, want_img, rtol=1e-4, atol=1e-4)

    ids = np.array([[1, 5, 99] + [0] * 13])
    with torch.no_grad():
        want_txt = ttext(torch.from_numpy(ids)).numpy()
    got_txt = np.asarray(enc.encode_text(["anything"]))
    np.testing.assert_allclose(got_txt, want_txt, rtol=1e-4, atol=1e-4)
