"""Minimum end-to-end slice (SURVEY.md §7): collection -> token cache ->
embedding blocks -> exact search -> TREC run -> metrics, plus KD training
moving the student toward the teacher."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convdr_tpu.core.config import (
    EncoderArchConfig,
    ModelConfig,
    SearchConfig,
    TrainConfig,
)
from convdr_tpu.data.collection import load_collection, load_qrels
from convdr_tpu.data.conv_dataset import ConvSearchDataset
from convdr_tpu.data.token_cache import (
    TokenCache,
    TokenCacheWriter,
    load_offset2pid,
    save_id_maps,
)
from convdr_tpu.data.tokenizers import ByteLevelBPETokenizer
from convdr_tpu.evaluation.metrics import evaluate_run, mean_metrics
from convdr_tpu.models.encoders import AnceEncoder
from convdr_tpu.retrieval.embed_corpus import generate_embeddings
from convdr_tpu.retrieval.run_writer import write_run_outputs
from convdr_tpu.retrieval.searcher import BlockedSearcher
from convdr_tpu.train.trainer import (
    create_train_state,
    make_query_encode_fn,
    make_train_step,
)

N_PASSAGES = 40


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Build the tiny corpus artifacts once."""
    work = tmp_path_factory.mktemp("e2e")
    raw = work / "raw"
    processed = work / "processed"
    embeddings = work / "embeddings"
    os.makedirs(raw)
    os.makedirs(processed)

    tok = ByteLevelBPETokenizer.tiny()
    topics = ["cats", "dogs", "fish", "birds"]
    # collection: 10 passages per topic
    with open(raw / "collection.tsv", "w") as f:
        for pid in range(N_PASSAGES):
            topic = topics[pid % 4]
            f.write(f"{pid}\tall about {topic} number {pid}\n")

    # queries + topics jsonl: one conversation per topic
    with open(raw / "queries.raw.tsv", "w") as f:
        for t, topic in enumerate(topics):
            f.write(f"{t + 1}_1\ttell me about {topic}\n")
    with open(raw / "eval_topics.jsonl", "w") as f:
        for t, topic in enumerate(topics):
            f.write(
                json.dumps(
                    {
                        "topic_number": t + 1,
                        "query_number": 1,
                        "input": [f"tell me about {topic}"],
                        "target": f"tell me about {topic}",
                    }
                )
                + "\n"
            )
    # qrels: passages of the topic are relevant
    with open(raw / "qrels.tsv", "w") as f:
        for t, topic in enumerate(topics):
            for pid in range(N_PASSAGES):
                if pid % 4 == t:
                    f.write(f"{t + 1}_1\t0\t{pid}\t1\n")

    # tokenize collection -> cache (pids shuffled to exercise offset maps)
    order = np.random.RandomState(0).permutation(N_PASSAGES)
    offset2pid = []
    with TokenCacheWriter(str(processed / "passages"), max_seq_length=32) as w:
        for pid in order:
            text = f"all about {topics[pid % 4]} number {pid}"
            w.write(tok.encode(text, add_special_tokens=True, max_length=32))
            offset2pid.append(int(pid))
    save_id_maps(str(processed), offset2pid)

    cfg = ModelConfig(
        name="rdot_nll",
        arch=EncoderArchConfig.tiny(vocab_size=len(tok) + 2),
        embedding_dim=32,
    )
    model = AnceEncoder(config=cfg)
    ids0 = jnp.ones((1, 32), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))

    def apply_fn(p, i, m, is_query):
        method = model.query_emb if is_query else model.body_emb
        return model.apply(p, i, m, method=method)

    # embed corpus into 2 blocks
    cache = TokenCache(str(processed / "passages"))
    rows = generate_embeddings(
        apply_fn, params, cache, str(embeddings), batch_size=8, num_blocks=2
    )
    assert rows == N_PASSAGES

    return {
        "work": work,
        "raw": raw,
        "processed": processed,
        "embeddings": embeddings,
        "tok": tok,
        "model": model,
        "cfg": cfg,
        "params": params,
        "apply_fn": apply_fn,
    }


def test_full_inference_pipeline(pipeline):
    tok = pipeline["tok"]
    apply_fn = pipeline["apply_fn"]
    params = pipeline["params"]

    ds = ConvSearchDataset(
        [str(pipeline["raw"] / "eval_topics.jsonl")],
        tok,
        mode="inference",
        query_mode="no_res",
        max_concat_length=48,
    )
    encode = make_query_encode_fn(apply_fn)
    qids, embs, raws = [], [], {}
    for batch in ds.batches(2):
        out = encode(
            params,
            jnp.asarray(batch["concat_ids"]),
            jnp.asarray(batch["concat_mask"]),
        )
        embs.append(np.asarray(out))
        qids.extend(batch["qid"])
        for qid, seq in zip(batch["qid"], batch["history_utterances"]):
            raws[qid] = seq
    query_embs = np.concatenate(embs, axis=0)

    searcher = BlockedSearcher(SearchConfig(passage_block_size=32))
    scores, offsets = searcher.search_blocks(
        str(pipeline["embeddings"]), query_embs, 10
    )
    offset2pid = load_offset2pid(str(pipeline["processed"]))
    qrels = load_qrels(str(pipeline["raw"] / "qrels.tsv"))
    queries = {}
    with open(pipeline["raw"] / "queries.raw.tsv") as f:
        for line in f:
            qid, text = line.strip().split("\t")
            queries[qid] = text
    collection = load_collection(str(pipeline["raw"] / "collection.tsv"))

    trec = str(pipeline["work"] / "run.trec")
    om = str(pipeline["work"] / "run.jsonl")
    run = write_run_outputs(
        qids, scores, offsets, offset2pid, 10,
        output_trec_file=trec, output_file=om,
        queries=queries, collection=collection, qrels=qrels,
        raw_sequences=raws,
    )
    assert len(run) == 4
    assert os.path.exists(trec) and os.path.exists(om)
    per_q = evaluate_run(run, qrels, ndcg_cuts=(3,), recall_cuts=(10,))
    means = mean_metrics(per_q)
    # random model: metrics defined and in range
    assert 0.0 <= means["ndcg_cut_3"] <= 1.0
    assert 0.0 <= means["recall_10"] <= 1.0
    # every line of the OpenMatch output carries a label field
    for line in open(om):
        assert "label" in json.loads(line)


def test_search_exactness_against_oracle(pipeline):
    """Blocked search over the generated blocks == oracle over the full
    embedding matrix: the 'recall@k bit-equal' requirement of BASELINE.md."""
    from convdr_tpu.ops.exact_search import topk_oracle
    from convdr_tpu.retrieval.blocks import iter_embedding_blocks

    rows = {}
    for _b, emb, off in iter_embedding_blocks(str(pipeline["embeddings"])):
        for e, o in zip(emb, off):
            rows[int(o)] = e
    full = np.stack([rows[i] for i in range(N_PASSAGES)])

    q = np.random.RandomState(1).randn(3, full.shape[1]).astype(np.float32)
    searcher = BlockedSearcher(SearchConfig(passage_block_size=16))
    s, offsets = searcher.search_blocks(str(pipeline["embeddings"]), q, 15)
    os_, oi = topk_oracle(q, full, 15)
    np.testing.assert_array_equal(offsets, oi.astype(np.int64))
    np.testing.assert_allclose(s, os_, rtol=1e-5)


def test_kd_training_moves_student_to_teacher(pipeline):
    tok = pipeline["tok"]
    model = pipeline["model"]
    apply_fn = pipeline["apply_fn"]
    teacher_params = pipeline["params"]

    ds = ConvSearchDataset(
        [str(pipeline["raw"] / "eval_topics.jsonl")],
        tok,
        mode="train",
        query_mode="no_res",
        max_concat_length=48,
        max_query_length=48,
    )
    batch = next(ds.batches(4))
    dev_batch = {
        "concat_ids": jnp.asarray(batch["concat_ids"]),
        "concat_mask": jnp.asarray(batch["concat_mask"]),
        "target_ids": jnp.asarray(batch["target_ids"]),
        "target_mask": jnp.asarray(batch["target_mask"]),
    }
    student_params = model.init(
        jax.random.PRNGKey(7), dev_batch["concat_ids"], dev_batch["concat_mask"]
    )
    tcfg = TrainConfig(learning_rate=5e-3)
    state, tx = create_train_state(student_params, tcfg, total_steps=30)
    step = make_train_step(apply_fn, apply_fn, tx, tcfg)
    losses = []
    for _ in range(30):
        state, metrics = step(state, teacher_params, dev_batch)
        losses.append(float(metrics["mse_loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_embed_pipeline_mesh_path(pipeline):
    """generate_embeddings with a data mesh produces identical blocks."""
    import jax

    from convdr_tpu.parallel.mesh import get_mesh
    from convdr_tpu.retrieval.blocks import load_embedding_block

    mesh = get_mesh(("data",))
    out = str(pipeline["work"] / "mesh_embeddings")
    cache = TokenCache(str(pipeline["processed"] / "passages"))
    rows = generate_embeddings(
        pipeline["apply_fn"], pipeline["params"], cache, out,
        batch_size=8, num_blocks=1, mesh=mesh,
    )
    assert rows == N_PASSAGES
    mesh_emb, mesh_ids = load_embedding_block(out, 0)
    ref_emb0, ref_ids0 = load_embedding_block(str(pipeline["embeddings"]), 0)
    ref_emb1, ref_ids1 = load_embedding_block(str(pipeline["embeddings"]), 1)
    # single block vs two blocks: same row set keyed by offset
    by_offset = {int(i): e for e, i in zip(mesh_emb, mesh_ids)}
    for emb, ids in ((ref_emb0, ref_ids0), (ref_emb1, ref_ids1)):
        for e, i in zip(emb, ids):
            np.testing.assert_allclose(by_offset[int(i)], e, atol=1e-5)


def test_embed_pipeline_length_buckets(pipeline):
    """Bucketed encode matches full-padded encode row-for-row by offset."""
    from convdr_tpu.retrieval.blocks import load_embedding_block
    from convdr_tpu.retrieval.embed_corpus import default_length_buckets

    cache = TokenCache(str(pipeline["processed"] / "passages"))
    out = str(pipeline["work"] / "bucket_embeddings")
    buckets = default_length_buckets(cache.max_seq_length)
    assert buckets[-1] == cache.max_seq_length
    rows = generate_embeddings(
        pipeline["apply_fn"], pipeline["params"], cache, out,
        batch_size=8, num_blocks=1, length_buckets=buckets,
    )
    assert rows == N_PASSAGES
    b_emb, b_ids = load_embedding_block(out, 0)
    assert sorted(int(i) for i in b_ids) == list(range(N_PASSAGES))
    by_offset = {int(i): e for e, i in zip(b_emb, b_ids)}
    for block in (0, 1):
        emb, ids = load_embedding_block(str(pipeline["embeddings"]), block)
        for e, i in zip(emb, ids):
            np.testing.assert_allclose(by_offset[int(i)], e, atol=1e-5)


def test_length_buckets_validation(pipeline):
    cache = TokenCache(str(pipeline["processed"] / "passages"))
    with pytest.raises(ValueError, match="truncated"):
        generate_embeddings(
            pipeline["apply_fn"], pipeline["params"], cache,
            str(pipeline["work"] / "bad_buckets"),
            batch_size=8, length_buckets=(8,),
        )


def test_bucket_buffer_routing():
    from convdr_tpu.retrieval.embed_corpus import _BucketBuffer

    rng = np.random.RandomState(0)
    n, width = 53, 32
    ids = rng.randint(1, 99, size=(n, width)).astype(np.int32)
    lens = rng.randint(1, width + 1, size=n)
    offsets = np.arange(n, dtype=np.int64)
    buf = _BucketBuffer((8, 16, 32), batch_size=4)
    seen = {}
    batches = list(buf.add(ids, lens, offsets)) + list(buf.flush())
    for bucket, bids, blens, boffs in batches:
        # constant token budget: shorter rungs carry more rows per batch
        assert bids.shape == (4 * (32 // bucket), bucket)
        for row, ln, off in zip(bids, blens, boffs):
            if off < 0:
                continue  # flush padding
            assert ln <= bucket
            np.testing.assert_array_equal(row, ids[off, :bucket])
            seen[int(off)] = True
    assert sorted(seen) == list(range(n))


def test_embed_multi_chunk_length_buckets(tmp_path):
    """Chunk-rung buckets skip empty chunks; kept rows match unbucketed."""
    from convdr_tpu.core.config import EncoderArchConfig, ModelConfig
    from convdr_tpu.core.loading import make_apply_fn
    from convdr_tpu.data.token_cache import TokenCacheWriter
    from convdr_tpu.models.encoders import build_model
    from convdr_tpu.retrieval.blocks import load_embedding_block

    chunk_len, n_chunks = 16, 4
    record_len = chunk_len * n_chunks
    work = str(tmp_path)
    rng = np.random.RandomState(3)
    writer = TokenCacheWriter(os.path.join(work, "passages"), record_len)
    lens = [5, 16, 20, 40, 64, 33, 7, 50, 12, 17]
    for ln in lens:
        writer.write(rng.randint(4, 60, size=ln), length=ln)
    writer.close()
    cache = TokenCache(os.path.join(work, "passages"))

    cfg = ModelConfig(
        name="mc", arch=EncoderArchConfig.tiny(vocab_size=64),
        embedding_dim=16, multi_chunk=True, chunk_len=chunk_len,
    )
    model = build_model(cfg)
    ids = jnp.ones((1, record_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))
    apply_fn = make_apply_fn(model)

    full_dir = os.path.join(work, "full")
    generate_embeddings(apply_fn, params, cache, full_dir, batch_size=4)
    buckets = tuple(chunk_len * c for c in range(1, n_chunks + 1))
    bdir = os.path.join(work, "bucketed")
    generate_embeddings(apply_fn, params, cache, bdir, batch_size=4,
                        length_buckets=buckets)

    f_emb, f_ids = load_embedding_block(full_dir, 0)
    b_emb, b_ids = load_embedding_block(bdir, 0)
    # full: every record emits n_chunks rows; bucketed: only valid chunks
    assert len(f_ids) == len(lens) * n_chunks
    expected = sum(-(-ln // chunk_len) for ln in lens)
    assert len(b_ids) == expected
    # every bucketed row must equal one full-path row with the same offset
    full_rows = {}
    for e, off in zip(f_emb, f_ids):
        full_rows.setdefault(int(off), []).append(e)
    for e, off in zip(b_emb, b_ids):
        assert any(
            np.allclose(e, cand, atol=1e-5) for cand in full_rows[int(off)]
        ), f"bucketed row for offset {off} not found in full encode"

    # sparse ladder: a 5-token doc lands in the 2-chunk rung but still emits
    # only its one valid chunk (no all-pad garbage row inside the rung)
    sdir = os.path.join(work, "sparse")
    generate_embeddings(apply_fn, params, cache, sdir, batch_size=4,
                        length_buckets=(2 * chunk_len, record_len))
    s_emb, s_ids = load_embedding_block(sdir, 0)
    assert len(s_ids) == expected, (len(s_ids), expected)


def test_embed_pipeline_bf16_storage(pipeline):
    """Capacity mode: bf16 blocks on disk, f32-accumulated search; the
    recall set matches a bf16-rounded numpy oracle exactly."""
    import ml_dtypes

    from convdr_tpu.core.config import SearchConfig
    from convdr_tpu.retrieval.blocks import load_embedding_block
    from convdr_tpu.retrieval.searcher import BlockedSearcher

    cache = TokenCache(str(pipeline["processed"] / "passages"))
    out = str(pipeline["work"] / "bf16_embeddings")
    rows = generate_embeddings(
        pipeline["apply_fn"], pipeline["params"], cache, out,
        batch_size=8, num_blocks=2, storage_dtype="bfloat16",
    )
    assert rows == N_PASSAGES
    emb, ids = load_embedding_block(out, 0)
    assert emb.dtype == ml_dtypes.bfloat16

    q = np.random.RandomState(5).randn(4, emb.shape[1]).astype(np.float32)
    searcher = BlockedSearcher(SearchConfig(top_n=8, storage_dtype="bfloat16"))
    s, offs = searcher.search_blocks(out, q, 8)

    emb1, ids1 = load_embedding_block(out, 1)
    all_emb = np.concatenate([emb, emb1]).astype(np.float32)
    all_ids = np.concatenate([ids, ids1])
    oracle = q @ all_emb.T
    top = np.argsort(-oracle, axis=1, kind="stable")[:, :8]
    for r in range(4):
        assert set(offs[r]) == set(all_ids[top[r]]), r
