"""Tokenizer parity vs HuggingFace implementations on shared local vocabs.

The reference's retrieval quality depends on exact token-id parity with the
HF tokenizers that produced the published checkpoints (SURVEY.md §7 "hard
parts"). These tests build small vocab files, load them through BOTH the
in-repo tokenizers and the installed ``transformers`` classes, and require
identical ids (no network: everything loads from the tmp dir).
"""

import json
import os

import pytest

transformers = pytest.importorskip("transformers")

from convdr_tpu.data.tokenizers import (
    ByteLevelBPETokenizer,
    WordPieceTokenizer,
    bytes_to_unicode,
)

SENTENCES = [
    "hello world",
    "The Quick, Brown Fox! Jumps over 42 lazy dogs?",
    "what is a physician's assistant",
    "trailing space ",
    "  double  spaces  and\ttabs",
    "unicode café 你好 mixed",
    "hyphen-ated and under_scored tokens",
]


@pytest.fixture(scope="module")
def bpe_vocab_dir(tmp_path_factory):
    """A small byte-BPE vocab with real merges over common fragments."""
    d = tmp_path_factory.mktemp("bpe")
    alphabet = sorted(set(bytes_to_unicode().values()))
    space = "Ġ"  # byte-level space marker
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
        ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d"),
        (space, "t"), ("Ġt", "h"), ("Ġth", "e"),
        ("i", "s"), ("a", "n"), ("an", "d"), ("o", "v"), ("e", "r"),
        ("q", "u"), ("qu", "i"), ("c", "k"),
    ]
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {t: i for i, t in enumerate(specials + alphabet)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    with open(d / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(d / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


@pytest.fixture(scope="module")
def wp_vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wp")
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    digits = [str(i) for i in range(10)]
    punct = list(".,?!'\"-_:;()")
    words = ["the", "quick", "brown", "fox", "hello", "world", "over",
             "what", "is", "and", "##s", "##ed", "##ing", "##ly", "##er"]
    conts = ["##" + c for c in chars + digits]
    vocab = specials + words + chars + digits + punct + conts
    with open(os.path.join(d, "vocab.txt"), "w", encoding="utf-8") as f:
        for t in vocab:
            f.write(t + "\n")
    return str(d)


def test_byte_bpe_matches_hf_roberta(bpe_vocab_dir):
    ours = ByteLevelBPETokenizer.from_pretrained(bpe_vocab_dir)
    theirs = transformers.RobertaTokenizer(
        vocab_file=os.path.join(bpe_vocab_dir, "vocab.json"),
        merges_file=os.path.join(bpe_vocab_dir, "merges.txt"),
    )
    for text in SENTENCES:
        ref = theirs.encode(text, add_special_tokens=True)
        got = ours.encode(text, add_special_tokens=True)
        assert got == ref, (text, got, ref)


def test_byte_bpe_pair_matches_hf(bpe_vocab_dir):
    ours = ByteLevelBPETokenizer.from_pretrained(bpe_vocab_dir)
    theirs = transformers.RobertaTokenizer(
        vocab_file=os.path.join(bpe_vocab_dir, "vocab.json"),
        merges_file=os.path.join(bpe_vocab_dir, "merges.txt"),
    )
    ref = theirs.encode("hello world", "the quick", add_special_tokens=True)
    got = ours.encode("hello world", text_pair="the quick",
                      add_special_tokens=True)
    assert got == ref


def test_wordpiece_matches_hf_bert(wp_vocab_dir):
    ours = WordPieceTokenizer.from_pretrained(wp_vocab_dir)
    theirs = transformers.BertTokenizer(
        vocab_file=os.path.join(wp_vocab_dir, "vocab.txt"),
        do_lower_case=True,
    )
    for text in SENTENCES:
        ref = theirs.encode(text, add_special_tokens=True)
        got = ours.encode(text, add_special_tokens=True)
        assert got == ref, (text, got, ref)


def test_wordpiece_pair_matches_hf(wp_vocab_dir):
    ours = WordPieceTokenizer.from_pretrained(wp_vocab_dir)
    theirs = transformers.BertTokenizer(
        vocab_file=os.path.join(wp_vocab_dir, "vocab.txt"),
        do_lower_case=True,
    )
    ref = theirs.encode("hello world", "the quick", add_special_tokens=True)
    got = ours.encode("hello world", text_pair="the quick",
                      add_special_tokens=True)
    assert got == ref


def test_pair_truncation_longest_first_matches_hf(bpe_vocab_dir, wp_vocab_dir):
    """Long title + short text must truncate like HF (longest_first)."""
    ours_r = ByteLevelBPETokenizer.from_pretrained(bpe_vocab_dir)
    theirs_r = transformers.RobertaTokenizer(
        vocab_file=os.path.join(bpe_vocab_dir, "vocab.json"),
        merges_file=os.path.join(bpe_vocab_dir, "merges.txt"),
    )
    long_title = "hello world " * 10
    short_text = "the quick"
    ref = theirs_r.encode(long_title, short_text, add_special_tokens=True,
                          max_length=20, truncation="longest_first")
    got = ours_r.encode(long_title, text_pair=short_text,
                        add_special_tokens=True, max_length=20)
    assert got == ref

    ours_w = WordPieceTokenizer.from_pretrained(wp_vocab_dir)
    theirs_w = transformers.BertTokenizer(
        vocab_file=os.path.join(wp_vocab_dir, "vocab.txt"), do_lower_case=True
    )
    ref = theirs_w.encode(long_title, short_text, add_special_tokens=True,
                          max_length=20, truncation="longest_first")
    got = ours_w.encode(long_title, text_pair=short_text,
                        add_special_tokens=True, max_length=20)
    assert got == ref


def test_control_chars_match_hf(wp_vocab_dir):
    """HF strips control/zero-width chars before WordPiece."""
    ours = WordPieceTokenizer.from_pretrained(wp_vocab_dir)
    theirs = transformers.BertTokenizer(
        vocab_file=os.path.join(wp_vocab_dir, "vocab.txt"), do_lower_case=True
    )
    for text in ("foo​bar", "foo\x01bar", "a\x00b"):
        assert ours.encode(text) == theirs.encode(text), repr(text)
