"""Native tokenizer tests (CLIP byte-BPE + WordPiece) on toy vocab files.

Includes golden word-split parity: frozen (string -> word pieces) pairs
derived from the reference tokenizer's exact pattern
``<|startoftext|>|<|endoftext|>|'s|'t|'re|'ve|'m|'ll|'d|[\\p{L}]+|[\\p{N}]|
[^\\s\\p{L}\\p{N}]+`` with ftfy.fix_text + double html.unescape cleanup
(reference: additional_approaches/src/slip/tokenizer.py:13-14,59-75) —
including the non-ASCII, mojibake, contraction, underscore, and
Unicode-number cases where a naive stdlib ``\\w`` fallback diverges.
"""

import gzip

import numpy as np
import pytest

from srsem.pseudo.tokenizer import (
    ClipBpeTokenizer,
    WordPieceTokenizer,
    _basic_clean,
    _whitespace_clean,
    bytes_to_unicode,
    clip_word_split,
)


# Hand-derived from the reference pattern's regex-engine semantics:
# alternation tried in order at each scan position, greedy classes,
# whitespace skipped, text already cleaned + lowercased.
WORD_SPLIT_GOLDENS = [
    ("that's what i'll do, isn't it?",
     ["that", "'s", "what", "i", "'ll", "do", ",", "isn", "'t", "it", "?"]),
    ("we've 'd'd they're i'm",
     ["we", "'ve", "'d", "'d", "they", "'re", "i", "'m"]),
    # underscore is NOT \p{L}/\p{N} -> punctuation run (stdlib \w would
    # glue foo_bar into one word).
    ("foo_bar", ["foo", "_", "bar"]),
    # every \p{N} is a single token.
    ("123 images", ["1", "2", "3", "images"]),
    # superscript two is \p{N} (category No) — a number, not a letter
    # (Python's [^\W\d_] fallback wrongly treats it as a letter).
    ("x²", ["x", "²"]),
    ("café naïve", ["café", "naïve"]),
    # CJK letters form one \p{L}+ run.
    ("日本語 photo", ["日本語", "photo"]),
    ("wow!!!", ["wow", "!!!"]),
    # greedy punct run swallows the apostrophe when no contraction matches.
    ("!!!'s", ["!!!'", "s"]),
    ("'x", ["'", "x"]),
    ("<|startoftext|>hello<|endoftext|>",
     ["<|startoftext|>", "hello", "<|endoftext|>"]),
    ("a-b c/d", ["a", "-", "b", "c", "/", "d"]),
]


def test_clip_word_split_goldens():
    for text, want in WORD_SPLIT_GOLDENS:
        assert clip_word_split(text) == want, text


# (raw caption text -> cleaned+lowercased+split) through the FULL cleanup:
# fix_text (ftfy equivalent) + double unescape + whitespace collapse + lower.
CLEAN_SPLIT_GOLDENS = [
    # curly apostrophe U+2019 must uncurl so the contraction rule fires
    # (ftfy uncurl_quotes).
    ("don’t stop", ["don", "'t", "stop"]),
    # UTF-8-as-latin1 mojibake repaired before splitting.
    ("The cafÃ© is nice", ["the", "café", "is", "nice"]),
    # double-escaped HTML entity (reference unescapes twice).
    ("a &amp;amp; b", ["a", "&", "b"]),
    # ligature + fullwidth folding.
    ("ﬁre！", ["fire", "!"]),
    ("  lots\tof\nwhitespace  ", ["lots", "of", "whitespace"]),
]


def test_clean_then_split_goldens():
    for text, want in CLEAN_SPLIT_GOLDENS:
        cleaned = _whitespace_clean(_basic_clean(text)).lower()
        assert clip_word_split(cleaned) == want, (text, cleaned)


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


def test_wordpiece_strips_accents(tmp_path):
    """BERT-uncased lowercasing implies accent stripping (NFD + drop Mn):
    'Café' must tokenize as 'cafe', not [UNK] — HF MiniLM parity
    (review r4)."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "cafe", "uber"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(path), max_length=8)
    out = tok(["Café Über"])
    ids, mask = out["input_ids"], out["attention_mask"]
    v = {t: i for i, t in enumerate(vocab)}
    assert ids[0][mask[0] == 1].tolist() == [
        v["[CLS]"], v["cafe"], v["uber"], v["[SEP]"]]
