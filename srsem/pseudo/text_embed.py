"""Text embedders for C2C scoring.

The reference embeds captions with sentence-transformers MiniLM-L6-v2, one
pair at a time (reference: datasets/SRdatasetPseudolabelGen/
qwen_caps_embedding_script.py:11-12,119-135).  Here the encoder is a native
Flax BERT (6 layers, hidden 384, mean-pool + L2 normalize — the
all-MiniLM-L6-v2 recipe), weight-convertible from the HF torch checkpoint,
and batched over the device mesh.

Because this environment has no network access, the embedder is pluggable:

* ``MiniLMEmbedder`` — the real model; needs converted weights + a
  WordPiece tokenizer (from a local HF cache or exported files);
* ``HashingTextEmbedder`` — deterministic, dependency-free fallback
  (token/char-n-gram feature hashing) so pipelines, tests and benchmarks
  run offline.  NOT semantically meaningful, but preserves the exact
  dataflow and shapes.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class BertLayer(nn.Module):
    """Post-LN transformer encoder layer (BERT)."""

    hidden: int = 384
    heads: int = 12
    intermediate: int = 1536

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        n, t, c = x.shape
        head_dim = c // self.heads
        dense = lambda name, feats: nn.Dense(feats, param_dtype=jnp.float32, name=name)  # noqa: E731

        q = dense("attention.self.query", c)(x).reshape(n, t, self.heads, head_dim)
        k = dense("attention.self.key", c)(x).reshape(n, t, self.heads, head_dim)
        v = dense("attention.self.value", c)(x).reshape(n, t, self.heads, head_dim)
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(head_dim)
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
        attn = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, c)
        x = nn.LayerNorm(epsilon=1e-12, name="attention.output.LayerNorm")(
            x + dense("attention.output.dense", c)(ctx))
        h = nn.gelu(dense("intermediate.dense", self.intermediate)(x),
                    approximate=False)
        return nn.LayerNorm(epsilon=1e-12, name="output.LayerNorm")(
            x + dense("output.dense", c)(h))


class MiniLMEncoder(nn.Module):
    """all-MiniLM-L6-v2: BERT-small encoder + masked mean-pool + L2 norm."""

    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    intermediate: int = 1536
    max_position: int = 512
    # "mean": MiniLM's masked mean-pool + L2 norm.  "cls": the raw [CLS]
    # hidden state — BERT-base towers that project/normalize downstream
    # (ALBEF text_feat[:, 0, :], reference albef/model_wrapper.py:93-97).
    pool: str = "mean"

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array) -> Array:
        n, t = input_ids.shape
        emb = nn.Embed(self.vocab_size, self.hidden,
                       name="embeddings.word_embeddings")(input_ids)
        pos = nn.Embed(self.max_position, self.hidden,
                       name="embeddings.position_embeddings")(
            jnp.broadcast_to(jnp.arange(t), (n, t)))
        typ = nn.Embed(2, self.hidden,
                       name="embeddings.token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=1e-12, name="embeddings.LayerNorm")(
            emb + pos + typ)
        for i in range(self.layers):
            x = BertLayer(self.hidden, self.heads, self.intermediate,
                          name=f"encoder.layer.{i}")(x, attention_mask)
        if self.pool == "cls":
            return x[:, 0]
        m = attention_mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1e-9)
        return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


class MiniLMEmbedder:
    """Batched device-side caption embedder."""

    def __init__(self, params, tokenizer, max_length: int = 128,
                 batch_size: int = 256):
        self.model = MiniLMEncoder()
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self._encode = jax.jit(
            lambda p, ids, mask: self.model.apply({"params": p}, ids, mask))

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        outs = []
        for i in range(0, len(texts), self.batch_size):
            chunk = list(texts[i: i + self.batch_size])
            # Pad the final chunk to the static batch size for one jit shape.
            n = len(chunk)
            chunk += [""] * (self.batch_size - n)
            tok = self.tokenizer(
                chunk, padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="np")
            emb = self._encode(self.params,
                               jnp.asarray(tok["input_ids"]),
                               jnp.asarray(tok["attention_mask"]))
            outs.append(np.asarray(emb)[:n])
        return np.concatenate(outs, axis=0) if outs else np.zeros((0, 384))


class HashingTextEmbedder:
    """Deterministic offline fallback: word + char-trigram feature hashing
    into ``dim`` buckets, L2-normalized.  Similar texts get similar
    embeddings (shared n-grams), so pipeline smoke tests behave sanely."""

    def __init__(self, dim: int = 384):
        self.dim = dim

    def _features(self, text: str) -> List[str]:
        words = re.findall(r"[a-z0-9]+", text.lower())
        grams = [w[i: i + 3] for w in words for i in range(max(1, len(w) - 2))]
        return words + grams

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for row, text in enumerate(texts):
            for feat in self._features(text):
                h = int.from_bytes(
                    hashlib.blake2s(feat.encode(), digest_size=8).digest(), "little")
                out[row, h % self.dim] += 1.0 if (h >> 63) else -1.0
        norms = np.linalg.norm(out, axis=-1, keepdims=True)
        return out / np.clip(norms, 1e-9, None)


def convert_hf_minilm(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """HF torch ``sentence-transformers/all-MiniLM-L6-v2`` state dict →
    MiniLMEncoder params.  Tensors may be torch tensors or numpy arrays."""
    from flax import traverse_util

    def np_of(v):
        return np.asarray(getattr(v, "numpy", lambda: v)())

    # Flax path layout mirrors HF names verbatim (module names contain dots
    # on purpose): top level "embeddings.*" / "encoder.layer.N", and inside
    # a layer "attention.self.query" etc.
    flat: Dict[tuple, np.ndarray] = {}
    layer_re = re.compile(r"^encoder\.layer\.(\d+)\.(.+)$")
    for key, value in state_dict.items():
        key = key.replace("bert.", "").replace("model.", "")
        if key.startswith("pooler.") or key.endswith("position_ids"):
            continue
        arr = np_of(value)
        module, leaf = key.rsplit(".", 1)
        m = layer_re.match(module)
        path = (f"encoder.layer.{m.group(1)}", m.group(2)) if m else (module,)
        if leaf == "weight":
            if module.endswith("LayerNorm"):
                flat[path + ("scale",)] = arr
            elif "embeddings" in module:
                flat[path + ("embedding",)] = arr
            else:
                flat[path + ("kernel",)] = arr.T
        elif leaf == "bias":
            flat[path + ("bias",)] = arr
    return traverse_util.unflatten_dict(flat)
