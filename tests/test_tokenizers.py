import pytest

from convdr_tpu.data.tokenizers import (
    ByteLevelBPETokenizer,
    WordPieceTokenizer,
    load_tokenizer,
)


class TestByteLevelBPE:
    def setup_method(self):
        self.tok = ByteLevelBPETokenizer.tiny()

    def test_specials(self):
        assert self.tok.cls_token_id == 0
        assert self.tok.pad_token_id == 1
        assert self.tok.sep_token_id == 2

    def test_roundtrip_tokens(self):
        toks = self.tok.tokenize("hello world")
        ids = self.tok.convert_tokens_to_ids(toks)
        assert self.tok.convert_ids_to_tokens(ids) == toks

    def test_encode_special_layout(self):
        ids = self.tok.encode("hi", add_special_tokens=True)
        assert ids[0] == self.tok.cls_token_id
        assert ids[-1] == self.tok.sep_token_id

    def test_pair_layout(self):
        """RoBERTa pair: <s> A </s> </s> B </s>."""
        ids = self.tok.encode("a", text_pair="b", add_special_tokens=True)
        sep = self.tok.sep_token_id
        assert ids.count(sep) == 3
        assert ids[0] == self.tok.cls_token_id

    def test_max_length(self):
        ids = self.tok.encode("abcdefghijklmnop", max_length=8)
        assert len(ids) == 8
        assert ids[-1] == self.tok.sep_token_id

    def test_add_tokens(self):
        base = len(self.tok)
        added = self.tok.add_tokens(["<response>"])
        assert added == 1 and len(self.tok) == base + 1
        rid = self.tok.convert_tokens_to_ids(["<response>"])[0]
        assert rid == base
        # Added token survives inside running text.
        toks = self.tok._tokenize_with_added("x <response> y")
        assert "<response>" in toks

    def test_save_load(self, tmp_path):
        self.tok.add_tokens(["<response>"])
        self.tok.save_pretrained(str(tmp_path))
        tok2 = ByteLevelBPETokenizer.from_pretrained(str(tmp_path))
        assert len(tok2) == len(self.tok)
        assert tok2.encode("hello world") == self.tok.encode("hello world")

    def test_merges_applied(self):
        vocab = {t: i for i, t in enumerate(["<s>", "<pad>", "</s>", "<unk>"])}
        for ch in ["h", "e", "l", "o", "he", "ll", "hell", "hello"]:
            vocab[ch] = len(vocab)
        merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
        tok = ByteLevelBPETokenizer(vocab, merges)
        assert tok.tokenize("hello") == ["hello"]


class TestWordPiece:
    def setup_method(self):
        self.tok = WordPieceTokenizer.tiny()

    def test_lowercase_and_split(self):
        toks = self.tok.tokenize("Cat dog!")
        assert toks[0] == "c"
        assert "!" in toks

    def test_greedy_longest_match(self):
        vocab = {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##able", "##a", "##b",
             "##l", "##e", "a", "b", "l", "e", "u", "n"]
        )}
        tok = WordPieceTokenizer(vocab)
        assert tok.tokenize("unable") == ["un", "##able"]

    def test_unknown_word(self):
        vocab = {t: i for i, t in enumerate(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a"])}
        tok = WordPieceTokenizer(vocab)
        assert tok.tokenize("zzz") == ["[UNK]"]

    def test_pair_layout(self):
        """BERT pair: [CLS] A [SEP] B [SEP]."""
        ids = self.tok.encode("ab", text_pair="cd", add_special_tokens=True)
        assert ids[0] == self.tok.cls_token_id
        assert ids.count(self.tok.sep_token_id) == 2

    def test_save_load(self, tmp_path):
        self.tok.save_pretrained(str(tmp_path))
        tok2 = WordPieceTokenizer.from_pretrained(str(tmp_path))
        assert tok2.encode("hello") == self.tok.encode("hello")


def test_factory():
    assert isinstance(load_tokenizer("roberta"), ByteLevelBPETokenizer)
    assert isinstance(load_tokenizer("bert"), WordPieceTokenizer)
