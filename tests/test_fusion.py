"""ALBEF fusion encoder parity vs a torch mirror.

Pins the native multimodal BERT (self-attn → cross-attn to image states →
FFN, post-LN) + ITM head against a randomly initialized torch mirror of the
reference's xbert BertLayer semantics
(reference: additional_approaches/src/albef/xbert.py — BertLayer with
add_cross_attention; model_retrieval.py itm_head), through
``convert_albef_fusion``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from srsem.explain.fusion import (  # noqa: E402
    AlbefFusionEncoder,
    AlbefItmScorer,
    convert_albef_fusion,
)

H, HEADS, LAYERS, INTER, VOCAB, FUSE = 32, 4, 4, 64, 50, 2


class TorchAttn(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self = tnn.ModuleDict({
            "query": tnn.Linear(H, H), "key": tnn.Linear(H, H),
            "value": tnn.Linear(H, H)})
        self.output = tnn.ModuleDict({
            "dense": tnn.Linear(H, H),
            "LayerNorm": tnn.LayerNorm(H, eps=1e-12)})

    def forward(self, x, kv, mask):
        n, tq, _ = x.shape
        hd = H // HEADS
        q = self.self["query"](x).view(n, tq, HEADS, hd)
        k = self.self["key"](kv).view(n, kv.shape[1], HEADS, hd)
        v = self.self["value"](kv).view(n, kv.shape[1], HEADS, hd)
        s = torch.einsum("nqhd,nkhd->nhqk", q, k) / (hd ** 0.5)
        s = s + torch.where(mask[:, None, None, :] > 0,
                            torch.zeros(()), torch.full((), -1e9))
        a = torch.softmax(s, dim=-1)
        ctx = torch.einsum("nhqk,nkhd->nqhd", a, v).reshape(n, tq, H)
        return self.output["LayerNorm"](x + self.output["dense"](ctx))


class TorchFusionLayer(tnn.Module):
    def __init__(self, cross):
        super().__init__()
        self.attention = TorchAttn()
        self.crossattention = TorchAttn() if cross else None
        self.intermediate = tnn.ModuleDict({"dense": tnn.Linear(H, INTER)})
        self.output = tnn.ModuleDict({
            "dense": tnn.Linear(INTER, H),
            "LayerNorm": tnn.LayerNorm(H, eps=1e-12)})

    def forward(self, x, mask, img, img_mask):
        x = self.attention(x, x, mask)
        if self.crossattention is not None:
            x = self.crossattention(x, img, img_mask)
        h = torch.nn.functional.gelu(self.intermediate["dense"](x))
        return self.output["LayerNorm"](x + self.output["dense"](h))


class TorchFusionBert(tnn.Module):
    def __init__(self):
        super().__init__()
        self.word = tnn.Embedding(VOCAB, H)
        self.pos = tnn.Embedding(64, H)
        self.typ = tnn.Embedding(2, H)
        self.ln = tnn.LayerNorm(H, eps=1e-12)
        self.layers = tnn.ModuleList(
            [TorchFusionLayer(i >= FUSE) for i in range(LAYERS)])
        self.itm = tnn.Linear(H, 2)

    def forward(self, ids, mask, img, img_mask):
        n, t = ids.shape
        x = self.ln(self.word(ids)
                    + self.pos(torch.arange(t).expand(n, t))
                    + self.typ(torch.zeros_like(ids)))
        for layer in self.layers:
            x = layer(x, mask, img, img_mask)
        return x, self.itm(x[:, 0])


def _state_dict(m: TorchFusionBert):
    sd = {
        "embeddings.word_embeddings.weight": m.word.weight,
        "embeddings.position_embeddings.weight": m.pos.weight,
        "embeddings.token_type_embeddings.weight": m.typ.weight,
        "embeddings.LayerNorm.weight": m.ln.weight,
        "embeddings.LayerNorm.bias": m.ln.bias,
    }
    for i, layer in enumerate(m.layers):
        p = f"encoder.layer.{i}"
        blocks = {"attention": layer.attention}
        if layer.crossattention is not None:
            blocks["crossattention"] = layer.crossattention
        for bname, blk in blocks.items():
            for proj in ("query", "key", "value"):
                sd[f"{p}.{bname}.self.{proj}.weight"] = blk.self[proj].weight
                sd[f"{p}.{bname}.self.{proj}.bias"] = blk.self[proj].bias
            sd[f"{p}.{bname}.output.dense.weight"] = blk.output["dense"].weight
            sd[f"{p}.{bname}.output.dense.bias"] = blk.output["dense"].bias
            sd[f"{p}.{bname}.output.LayerNorm.weight"] = blk.output["LayerNorm"].weight
            sd[f"{p}.{bname}.output.LayerNorm.bias"] = blk.output["LayerNorm"].bias
        sd[f"{p}.intermediate.dense.weight"] = layer.intermediate["dense"].weight
        sd[f"{p}.intermediate.dense.bias"] = layer.intermediate["dense"].bias
        sd[f"{p}.output.dense.weight"] = layer.output["dense"].weight
        sd[f"{p}.output.dense.bias"] = layer.output["dense"].bias
        sd[f"{p}.output.LayerNorm.weight"] = layer.output["LayerNorm"].weight
        sd[f"{p}.output.LayerNorm.bias"] = layer.output["LayerNorm"].bias
    return sd, {"weight": m.itm.weight, "bias": m.itm.bias}


@torch.no_grad()
def test_fusion_parity():
    torch.manual_seed(0)
    mirror = TorchFusionBert().eval()
    sd, itm_sd = _state_dict(mirror)
    params = convert_albef_fusion(sd, itm_sd)

    encoder = AlbefFusionEncoder(
        vocab_size=VOCAB, hidden=H, layers=LAYERS, heads=HEADS,
        intermediate=INTER, fusion_start=FUSE, max_position=64)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, (3, 9))
    mask = np.ones((3, 9), np.int64)
    mask[1, 6:] = 0
    img = rng.normal(size=(3, 5, H)).astype(np.float32)
    img_mask = np.ones((3, 5), np.int64)

    want_seq, want_itm = mirror(
        torch.as_tensor(ids), torch.as_tensor(mask),
        torch.as_tensor(img), torch.as_tensor(img_mask))

    got_seq, got_itm = encoder.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(img), jnp.asarray(img_mask))
    np.testing.assert_allclose(np.asarray(got_seq), want_seq.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_itm), want_itm.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_itm_scorer_end_to_end():
    import jax

    encoder = AlbefFusionEncoder(
        vocab_size=VOCAB, hidden=H, layers=2, heads=HEADS,
        intermediate=INTER, fusion_start=1, max_position=64)
    ids = jnp.zeros((1, 6), jnp.int32)
    img = jnp.zeros((1, 5, H), jnp.float32)
    variables = encoder.init(jax.random.PRNGKey(0), ids,
                             jnp.ones((1, 6), jnp.int32), img)

    def fake_tokenizer(texts):
        n = len(texts)
        return {"input_ids": np.ones((n, 6), np.int32),
                "attention_mask": np.ones((n, 6), np.int32)}

    scorer = AlbefItmScorer(
        encoder, variables,
        vit_tokens_fn=lambda px: np.ones((1, 5, H), np.float32),
        tokenizer=fake_tokenizer)
    p = scorer(np.zeros((1, 8, 8, 3)), ["a cat", "a dog"])
    assert p.shape == (2,)
    assert np.all((p >= 0) & (p <= 1))
