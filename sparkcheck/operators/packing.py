"""Sequence packing — the last step between a cleaned corpus and a
training run: documents are concatenated in a deterministic order and the
token stream is chunked into fixed-length training sequences (the GPT-style
"concat and chunk" loader). The per-document placement — global start
offset, first/last sequence index, how many sequences the document spans —
is what a data pipeline materializes so the loader can seek, and what you
audit to bound cross-document attention contamination (a document spanning
many sequences shares context windows with its neighbours).

Everything is exact integer arithmetic over token counts, so Spark and the
DuckDB oracle agree byte-for-byte.

Scale design — the distributed prefix sum: the placement needs a GLOBAL
running sum of token counts in doc_id order, and the naive formulation
(one window, ORDER BY doc_id, no PARTITION BY — exactly what the oracle
states) moves the whole corpus into a single partition. Instead the
classic two-phase scan:

  phase 1: docs are bucketed by doc_id range (bucket = doc_id DIV width);
           per-bucket token sums are a map-side-combining aggregate, one
           row per bucket;
  phase 2: the running offset OVER buckets is a window over that tiny
           O(n/width) frame (10^12 docs at width 2^20 -> ~10^6 rows — one
           partition of bucket SUMMARIES, never of corpus rows), broadcast
           back; the intra-bucket running sum is a window partitioned by
           bucket, bounded by `width` rows per partition regardless of
           corpus size.

No corpus-sized window partition exists anywhere in the plan; the only
corpus shuffle is the hash exchange into the per-bucket windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PACK_BUCKET_WIDTH = 1 << 20  # docs per prefix-sum bucket at full scale


def pack_sequences(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text",
                   bucket_width: int = PACK_BUCKET_WIDTH) -> DataFrame:
    """Per-document placement in the packed token stream.

    Documents ordered by `id_col` (unique bigint), token count =
    whitespace-split size (the corpus-wide convention shared with
    source_mix / gopher). Output, one row per non-null-text document:

      (doc_id, n_tokens, start_off, first_seq, last_seq, spans)

    where start_off is the document's 0-based offset in the concatenated
    token stream, first_seq/last_seq the 0-based indices of the training
    sequences of length `seq_len` that contain its first/last token, and
    spans = last_seq - first_seq + 1 (spans > 1 ⇔ the document crosses a
    sequence boundary).

    CONTRACT (ADVICE r6): the two-phase prefix sum buckets by
    `doc_id DIV bucket_width`, so the "tiny" bucket-summary frame is tiny
    only when doc_ids are reasonably DENSE (sequential or near-sequential
    — the shape shard ids and this repo's corpus have). Sparse/hashed
    64-bit ids put ~1 doc per bucket, making the summary frame, its
    single-partition window, and the broadcast all corpus-sized. For
    hashed ids, first densify (`row_number` is itself a global window, so
    do it once at ingest and store the dense id) or widen `bucket_width`
    to ~id_range/target_buckets.
    """
    toks = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("doc_id"),
                      F.size(F.split(F.col(text_col), " "))
                       .cast("bigint").alias("n_tokens"))
              .withColumn("_b", F.expr(f"doc_id DIV {int(bucket_width)}")))
    # phase 1: one row per bucket
    bsum = toks.groupBy("_b").agg(F.sum("n_tokens").alias("_bs"))
    # phase 2a: running offset over bucket summaries (tiny frame)
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.select(
        "_b", F.coalesce(F.sum("_bs").over(wb), F.lit(0)).alias("_boff"))
    # phase 2b: intra-bucket running sum, ≤ bucket_width rows per partition
    wi = Window.partitionBy("_b").orderBy("doc_id") \
               .rowsBetween(Window.unboundedPreceding, 0)
    placed = (toks.join(F.broadcast(boff), "_b")
                  .withColumn("_end", F.col("_boff")
                              + F.sum("n_tokens").over(wi)))
    start = F.col("_end") - F.col("n_tokens")
    return placed.select(
        "doc_id", "n_tokens", start.alias("start_off"),
        F.expr(f"(_end - n_tokens) DIV {int(seq_len)}").alias("first_seq"),
        F.expr(f"(_end - 1) DIV {int(seq_len)}").alias("last_seq"),
        (F.expr(f"(_end - 1) DIV {int(seq_len)}")
         - F.expr(f"(_end - n_tokens) DIV {int(seq_len)}")
         + F.lit(1)).alias("spans"))
