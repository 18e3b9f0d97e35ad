"""Generate the frozen "realistic" tokenizer fixtures (run once, check in).

The round-1 parity tests used ~20-merge toy vocabs, which never exercise
merge-rank conflicts, deep merge chains, or contraction merges. The real
RoBERTa ``merges.txt`` is not obtainable in this zero-egress image, so this
script produces the honest nearest thing: a byte-level BPE vocabulary
**trained with the actual GPT-2 training algorithm** (greedy most-frequent
pair merging over the GPT-2 pre-tokenization, /root/reference has no
tokenizer code; the algorithm is the public one from the GPT-2 paper) on a
deterministic English corpus — yielding organic merge ranks with the same
structural properties as the published file (contraction merges, Ġ-prefixed
chains, rank conflicts between overlapping pairs, multi-byte unicode
merges). The WordPiece fixture mirrors BERT-base's shape: specials, unused
slots, single chars incl. CJK/accents, whole words, and ##-continuations
with overlapping prefixes to stress greedy longest-match.

Determinism: no RNG; frequency ties break lexicographically. Re-running this
script must reproduce the checked-in fixtures byte-for-byte.

Usage:  python tests/fixtures/gen_realistic_vocab.py
"""

from __future__ import annotations

import collections
import json
import os

from convdr_tpu.data.tokenizers import _BPE_PAT, bytes_to_unicode

HERE = os.path.dirname(os.path.abspath(__file__))

# Deterministic training corpus: English prose with contractions, numbers,
# punctuation runs, accented words, and CJK so the byte-alphabet tail and
# multi-byte sequences appear with realistic frequencies.
CORPUS = """
Conversational dense retrieval answers a question by searching a collection
of passages with learned embeddings. The retriever encodes the conversation
history and the current question into one vector, then finds the nearest
passages by inner product. It's fast because the heavy work happened ahead
of time: every passage in the collection was encoded once and stored.

The quick brown fox jumps over the lazy dog. She said she'd seen the
results, but she couldn't believe they weren't reproducible. We're going to
re-run the experiments; they'll finish in about 42 minutes, or maybe 1,337
seconds if the cache is warm. Don't forget the edge cases: hyphen-ated
words, under_scored identifiers, CamelCase names, and file.names.with.dots.

In 2021 the system retrieved the top 100 passages for each of 38,000,000
documents. The model's embedding head projects 768 dimensions through a
layer norm. Training uses knowledge distillation: the student mimics the
teacher's embedding of a manually rewritten query. A ranking task adds
hard negatives sampled from a first-stage run.

The café on the corner serves naïve tourists and jaded locals alike; its
façade is painted in ochre and the menu costs €12 or £10. Zürich and
São Paulo appear in the place-name list, as do 北京 and 上海 and 東京.
Questions often start with what, who, when, where, why, and how: what is
throughput, who wrote the paper, when was it published, where is the code,
why does the test fail, how does the merge work?

Numbers and units show up everywhere: 8 blocks of 524288 rows, 16 GB of
HBM, a 31 ms round trip, 0.466 NDCG at 3, 83,000 queries per second. The
tokenizer must handle it all the same way every time, byte for byte,
including    runs of spaces and
newlines and tabs\tlike this one. Punctuation!!! Ellipses... "Quoted
strings," (parentheticals), [brackets], {braces}, and <angle-tags> are all
ordinary text to a byte-level model.

playing played plays player replaying misplayed playful playground
walking walked walks walker rewalking sidewalk walkway
encoding encoded encodes encoder re-encoding unencoded encodings
retrieval retrieve retrieves retrieved retriever retrieving
question questions questioning questioned questionable

A dense retriever is trained in three stages. First, the corpus is
tokenized into a binary cache of fixed-length records; second, every
record is encoded into an embedding and written to block files; third,
the query encoder is distilled from a teacher that reads the manual
rewrite of each conversational turn. At inference time the framework
streams the block files through the accelerator, computes exact inner
products against the query embeddings, and keeps a running list of the
hundred best passages per query. Because the scores are compared in full
precision, the final ranking matches the brute-force oracle exactly.

It was the best of times, it was the worst of times, it was the age of
wisdom, it was the age of foolishness, it was the epoch of belief, it was
the epoch of incredulity, it was the season of light, it was the season
of darkness, it was the spring of hope, it was the winter of despair.
We had everything before us, we had nothing before us, we were all going
direct to heaven, we were all going direct the other way.

Measurements were taken each morning and each evening over thirty days.
The throughput rose from eighty thousand to ninety thousand queries per
second after the selection kernel was tuned, while the latency per batch
fell below five milliseconds. Nothing about the workload changed except
the grouping factor; the matrix multiplication itself had never been the
bottleneck. These results were written to the benchmark file together
with the hardware description and the software versions, so that anyone
repeating the measurement could compare their numbers against ours line
by line and byte by byte.
"""

BPE_SPECIALS = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
NUM_MERGES = 400


def train_bpe(corpus: str, num_merges: int):
    """Greedy pair-merge BPE training over GPT-2 pre-tokens."""
    byte_enc = bytes_to_unicode()
    # word (tuple of symbols) -> count
    words = collections.Counter()
    for tok in _BPE_PAT.findall(corpus):
        sym = tuple(byte_enc[b] for b in tok.encode("utf-8"))
        words[sym] += 1
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # most frequent pair; ties broken lexicographically for determinism
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = collections.Counter()
        for sym, cnt in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += cnt
        words = new_words
    return merges


def write_bpe_fixture():
    out_dir = os.path.join(HERE, "bpe_realistic")
    os.makedirs(out_dir, exist_ok=True)
    merges = train_bpe(CORPUS, NUM_MERGES)
    alphabet = sorted(set(bytes_to_unicode().values()))
    vocab = {t: i for i, t in enumerate(BPE_SPECIALS + alphabet)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    with open(os.path.join(out_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0)
    with open(os.path.join(out_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"bpe_realistic: {len(merges)} merges, vocab {len(vocab)}")


def write_wordpiece_fixture():
    out_dir = os.path.join(HERE, "wordpiece_realistic")
    os.makedirs(out_dir, exist_ok=True)
    specials = ["[PAD]"] + [f"[unused{i}]" for i in range(10)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]"
    ]
    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    digits = [str(d) for d in range(10)]
    punct = sorted(set(".,?!'\"-_:;()[]{}<>/\\@#$%^&*+=~`|€£"))
    accents = list("éïçãüöèá")
    cjk = list("北京上海東")
    # Whole words with overlapping prefixes + suffix continuations so greedy
    # longest-match has real decisions to make (BERT-base's key property).
    words = sorted(set("""
        the a an and or of to in is was for on with as by at it he she they
        what who when where why how question questions answer answers
        play playing played player plays walk walking walked walker
        encode encoding encoded encoder retrieval retrieve retrieved
        passage passages embedding embeddings vector vectors model models
        train training test tests search searching merge merges token
        tokens tokenize tokenizer dense sparse index query queries
        fast slow top rank ranking first last second
        cafe naive zurich sao paulo don couldn weren
    """.split()))
    conts = sorted(set(
        ["##" + c for c in chars + digits]
        + ["##s", "##ed", "##ing", "##er", "##est", "##ly", "##al", "##able",
           "##tion", "##ment", "##ness", "##ful", "##less", "##ize", "##ized",
           "##izer", "##ical", "##ity", "##ies", "##ier", "##iest",
           "##e", "##es", "##en", "##on", "##ion", "##ations", "##ation",
           "##ground", "##way", "##walk", "##t", "##d", "##re", "##ve",
           "##ll", "##m"]
    ))
    vocab = list(
        dict.fromkeys(specials + chars + digits + punct + accents + cjk + words + conts)
    )
    with open(os.path.join(out_dir, "vocab.txt"), "w", encoding="utf-8") as f:
        for t in vocab:
            f.write(t + "\n")
    print(f"wordpiece_realistic: vocab {len(vocab)}")


if __name__ == "__main__":
    write_bpe_fixture()
    write_wordpiece_fixture()
