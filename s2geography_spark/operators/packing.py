"""Sequence packing for LLM pretraining data: concat-and-chunk.

The standard pretraining data layout concatenates documents (in a fixed
order, with a separator) into one token stream and slices it into
fixed-capacity training sequences ("chunks"); a document can span a chunk
boundary, and a chunk usually holds several short documents.  This module
computes that doc -> chunk assignment DECLARATIVELY:

  * token counts are a pure Column (whitespace or BPE-ish regex — see
    operators/textstats.py),
  * per-shard prefix sums come from a window ordered by the document key
    and PARTITIONED BY THE SHARD column — there is deliberately no
    global-order variant, because a global prefix sum is a total sort (one
    partition owns the order) and does not exist at 100 TB.  Real
    pipelines pack per shard/file anyway: each shard's stream is
    independent, readers consume shards in parallel, and the only
    cross-shard effect is <capacity tokens of padding at each shard tail.
  * the doc's chunk span is closed-form from its prefix-sum interval:
    chunks floor(start/C) .. floor((end-1)/C) — an explode of a sequence,
    no iteration, no state.

Everything is Catalyst Columns (codegen); no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import token_count


def pack_chunks(df: DataFrame, *, text: str = "text",
                id_col: str = "doc_id", shard_col: str = None,
                capacity: int = 2048,
                n_shards: int = 16) -> DataFrame:
    """Assign each document its span in the per-shard concat-and-chunk
    token stream.

    shard_col: existing shard assignment column; None derives a
    deterministic shard as pmod(hash-free) `id_col % n_shards` so the
    result is reproducible and oracle-checkable (a production pipeline
    would use its ingest file/bucket id).

    Returns one row per (document, chunk it overlaps):
      id_col, shard, n_tokens,
      chunk_id    — 0-based chunk index within the shard,
      tok_start   — the document's first token position in this chunk
                    (stream coordinates),
      tok_end     — one past its last token position in this chunk,
      doc_off     — tok_start in document-local coordinates.

    Zero-token documents emit no rows (they contribute nothing to the
    stream).  sum(tok_end - tok_start) over a document's rows == its
    token count; sum over a (shard, chunk) == capacity except the shard's
    final chunk.
    """
    cap = int(capacity)
    if cap <= 0:
        raise ValueError(f"capacity must be positive (got {capacity})")
    shard = F.col(shard_col) if shard_col else \
        (F.col(id_col) % F.lit(int(n_shards))).cast("long")
    d = df.withColumn("_shard", shard) \
          .withColumn("_n", token_count(text))
    # ROWS frame, not the default RANGE frame: with duplicate id_col values
    # in a shard, RANGE gives ties identical cumulative sums — overlapping
    # token intervals, tokens double-assigned to chunks (r5 ADVICE).  The
    # documented contract is a total order per shard; ROWS makes ties
    # deterministic-per-partition-order instead of silently corrupting the
    # packing.  id_col is unique in every supported input (doc ids), where
    # ROWS == RANGE exactly.
    w = Window.partitionBy("_shard").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = d.withColumn("_end", F.sum("_n").over(w)) \
         .withColumn("_start", F.col("_end") - F.col("_n")) \
         .where(F.col("_n") > 0)
    first_chunk = F.floor(F.col("_start") / cap)
    last_chunk = F.floor((F.col("_end") - 1) / cap)
    d = d.withColumn("chunk_id", F.explode(F.sequence(first_chunk,
                                                      last_chunk)))
    tok_start = F.greatest(F.col("_start"), F.col("chunk_id") * cap)
    tok_end = F.least(F.col("_end"), (F.col("chunk_id") + 1) * cap)
    return (d.select(
        F.col(id_col),
        F.col("_shard").alias("shard"),
        F.col("_n").alias("n_tokens"),
        F.col("chunk_id"),
        tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
        (tok_start - F.col("_start")).alias("doc_off")))


def chunk_manifest(packed: DataFrame) -> DataFrame:
    """Roll the packing up to one row per (shard, chunk): how many docs it
    holds and how full it is — the training-shard manifest a reader uses.
    Pure aggregation over pack_chunks output."""
    return (packed.groupBy("shard", "chunk_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("tok_end") - F.col("tok_start"))
                 .alias("n_tokens"),
                 F.min("tok_start").alias("tok_start"),
                 F.max("tok_end").alias("tok_end")))
