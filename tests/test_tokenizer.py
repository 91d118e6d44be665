"""Native tokenizer tests (CLIP byte-BPE + WordPiece) on toy vocab files."""

import gzip

import numpy as np
import pytest

from srsem.pseudo.tokenizer import (
    ClipBpeTokenizer,
    WordPieceTokenizer,
    bytes_to_unicode,
)


def test_bytes_to_unicode_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


@pytest.fixture()
def clip_tok(tmp_path):
    # Toy merges file: header line then merge rules.
    merges = "#version: toy\nh e\nhe l\nhel l\nhell o</w>\nl o</w>\n"
    path = tmp_path / "merges.txt"
    path.write_text(merges)
    return ClipBpeTokenizer(str(path), context=12)


def test_clip_bpe_merges_apply(clip_tok):
    # "hello" should merge h+e → he, he+l → hel, hel+l → hell, hell+o</w>
    assert clip_tok.bpe("hello") == "hello</w>"
    # unknown word falls back to char pieces ending in </w>
    pieces = clip_tok.bpe("hi").split(" ")
    assert pieces[-1].endswith("</w>")


def test_clip_tokenizer_output_shape_and_specials(clip_tok):
    ids = clip_tok(["hello hello", "x"])
    assert ids.shape == (2, 12)
    assert ids[0, 0] == clip_tok.sot
    assert clip_tok.eot in ids[0]
    # deterministic
    np.testing.assert_array_equal(ids, clip_tok(["hello hello", "x"]))


def test_wordpiece(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of", "dog",
             "##s", "un", "##related"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(path), max_length=10)
    out = tok(["a photo of dogs", "unrelated zzz"])
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == (2, 10)
    v = {t: i for i, t in enumerate(vocab)}
    # "dogs" → dog + ##s
    row0 = ids[0][mask[0] == 1].tolist()
    assert row0 == [v["[CLS]"], v["a"], v["photo"], v["of"], v["dog"],
                    v["##s"], v["[SEP]"]]
    # "unrelated" → un + ##related; zzz → UNK
    row1 = ids[1][mask[1] == 1].tolist()
    assert row1 == [v["[CLS]"], v["un"], v["##related"], v["[UNK]"],
                    v["[SEP]"]]
