"""Zero-shot tagger tests — the native RAM-equivalent backend
(reference: additional_approaches/src/ram/model_wrapper.py:9-31)."""

import numpy as np

from srsem.explain.tagger import ClipTagger


class StubDualEncoder:
    """Text embedding = one-hot by vocabulary index; image embedding points
    at a chosen tag's direction — makes tag ranking fully deterministic."""

    def __init__(self, vocab, hot=0, dim=None):
        self.vocab = list(vocab)
        self.dim = dim or len(vocab)
        self.hot = hot

    def encode_text(self, texts):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for j, v in enumerate(self.vocab):
                if v in t:
                    out[i, j] = 1.0
        return out

    def encode_image(self, image):
        e = np.zeros((self.dim,), np.float32)
        e[self.hot] = 1.0
        e[(self.hot + 1) % self.dim] = 0.5
        return e


def test_clip_tagger_ranks_and_thresholds():
    vocab = ["dog", "cat", "tree", "car"]
    enc = StubDualEncoder(vocab, hot=1)  # image is mostly "cat", some "tree"
    tagger = ClipTagger(enc, load_img=lambda p: p, vocabulary=vocab,
                        threshold=0.3, top_k=3)
    tags = tagger("ignored" if False else np.zeros((1,)))
    assert tags[0] == "cat"
    assert "tree" in tags
    assert "dog" not in tags  # score 0 < threshold

    s = tagger.scores(np.zeros((1,)))
    assert s.shape == (4,)
    assert np.argmax(s) == 1


def test_clip_tagger_top_k_caps():
    vocab = [f"tag{i}" for i in range(8)]

    class AllEqual(StubDualEncoder):
        def encode_image(self, image):
            return np.ones((self.dim,), np.float32)

    tagger = ClipTagger(AllEqual(vocab), load_img=lambda p: p,
                        vocabulary=vocab, threshold=0.0, top_k=5)
    assert len(tagger(np.zeros((1,)))) == 5


def test_clip_tagger_feeds_focus_flow():
    """Tags → cluster_concepts → focus embedding: the reference's
    focus_embedding_similarity front end (embedding_approaches.py:46-62)."""
    from srsem.eval.approaches import cluster_concepts
    from srsem.pseudo.text_embed import HashingTextEmbedder

    vocab = ["dog", "cat", "tree", "car", "sky"]
    tagger = ClipTagger(StubDualEncoder(vocab, hot=0), load_img=lambda p: p,
                        vocabulary=vocab, threshold=0.0, top_k=4)
    tags = tagger(np.zeros((1,)))
    text = HashingTextEmbedder(dim=16)
    concepts = cluster_concepts(
        lambda ts: text.encode(list(ts)), tags, n_clusters=2)
    assert 1 <= len(concepts) <= 2
    assert set(concepts) <= set(tags)
