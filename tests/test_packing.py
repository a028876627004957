"""Sequence-packing invariants (operators/packing.py)."""

import pyspark.sql.functions as F
import pytest

from s2geography_spark.operators.packing import chunk_manifest, pack_chunks


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range((i * 37) % 23)))
            for i in range(200)]  # includes zero-token docs (i*37%23 == 0)
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_covers_every_token_exactly_once(spark, docs):
    packed = pack_chunks(docs, capacity=16, n_shards=4).collect()
    # per-doc: the chunk slices tile the doc's token count
    per_doc = {}
    for r in packed:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        total = sum(r.tok_end - r.tok_start for r in rows)
        assert total == rows[0].n_tokens
        # contiguous both in stream coords and chunk ids
        for a, b in zip(rows, rows[1:]):
            assert b.tok_start == a.tok_end
            assert b.chunk_id == a.chunk_id + 1
        assert rows[0].doc_off == 0


def test_pack_chunks_full_except_shard_tail(spark, docs):
    cap = 16
    packed = pack_chunks(docs, capacity=cap, n_shards=4)
    man = chunk_manifest(packed).collect()
    by_shard = {}
    for m in man:
        by_shard.setdefault(m.shard, []).append(m)
    for shard, chunks in by_shard.items():
        chunks.sort(key=lambda m: m.chunk_id)
        # chunk ids are 0..k contiguous; every chunk but the last is full
        assert [m.chunk_id for m in chunks] == list(range(len(chunks)))
        for m in chunks[:-1]:
            assert m.n_tokens == cap
        assert 0 < chunks[-1].n_tokens <= cap
        # stream positions tile [0, shard_total)
        for m in chunks:
            assert m.tok_start == m.chunk_id * cap


def test_pack_zero_token_docs_absent_and_shards_partition(spark, docs):
    packed = pack_chunks(docs, capacity=16, n_shards=4)
    got_ids = {r.doc_id for r in packed.select("doc_id").distinct().collect()}
    empty = {r.doc_id for r in docs.where(
        F.length(F.trim("text")) == 0).collect()}
    assert empty and got_ids.isdisjoint(empty)
    all_ids = {r.doc_id for r in docs.collect()}
    assert got_ids == all_ids - empty
    # derived shard is doc_id % n_shards
    for r in packed.select("doc_id", "shard").distinct().collect():
        assert r.shard == r.doc_id % 4


def test_pack_respects_existing_shard_col(spark, docs):
    d = docs.withColumn("sh", (F.col("doc_id") % 3).cast("long"))
    packed = pack_chunks(d, capacity=32, shard_col="sh")
    for r in packed.select("doc_id", "shard").distinct().collect():
        assert r.shard == r.doc_id % 3


def test_pack_rejects_bad_capacity(spark, docs):
    with pytest.raises(ValueError):
        pack_chunks(docs, capacity=0)
