"""Training-sequence packing: map each document to its token-offset range
in a deterministic concatenate-and-split packing of the corpus.

No reference counterpart (rust-chunking is a chunking library); this is the
step an LLM training pipeline runs after curation: documents are
concatenated in a fixed order and the token stream is cut every ``seq_len``
tokens into training sequences (GPT-style packing — documents may straddle
sequence boundaries). The operator computes, per document, its global token
offset and the first/last sequence index it lands in, from which a writer
can assemble any sequence shard independently.

Determinism and scale shape:

- The packing order is BY VALUE — ``(md5(seed || doc_id), doc_id)`` — so
  the same corpus packs identically under any partitioning, resume, or
  speculative re-execution (same property as the sampling operators).
- The global running offset is computed in TWO PHASES, because a single
  ``SUM() OVER (ORDER BY ...)`` window has an empty partition spec — Spark
  would move the whole corpus through ONE task. Instead the hash's 2-hex
  prefix buckets rows into 256 shards whose order is consistent with the
  global hash order (a prefix of the sort key IS a range partition of it):
  phase 1 runs the running sum inside each shard (balanced by the hash,
  ~n/256 rows per window task); phase 2 adds per-shard base offsets from a
  256-row aggregate (broadcast back). The result is bit-identical to the
  one-task global window, tested against it.

At 100 TB the per-shard window input is corpus/256 — raise ``shard_hex``
to 3 (4096 shards) or 4 (65k) for larger corpora; any prefix length gives
the same output by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import sample_hash


def pack_sequences(docs: DataFrame, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text", seed: str = "pack",
                   shard_hex: int = 2) -> DataFrame:
    """Per-document packing assignment: ``(id, n_tokens, offset_start,
    first_seq, last_seq)`` for a concatenate-and-split packing into
    ``seq_len``-token training sequences.

    ``n_tokens`` is the whitespace token count; ``offset_start`` the
    document's first token's global offset in the concatenated stream;
    ``first_seq``/``last_seq`` the sequence indices of its first and last
    token (inclusive — a document spanning a boundary appears in both).
    Integer division throughout: exact at any corpus size (no float
    offsets).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if not 1 <= shard_hex <= 8:
        raise ValueError(f"shard_hex must be in 1..8, got {shard_hex}")
    h = sample_hash(id_col, seed)
    base = docs.select(
        F.col(id_col).alias("id"), h.alias("__h"),
        F.substring(h, 1, shard_hex).alias("__shard"),
        F.size(F.split(F.col(text_col), " ")).cast("long")
        .alias("n_tokens"))
    # Phase 1: running sum inside each hash-prefix shard (bounded window
    # input, hash-balanced).
    w = (Window.partitionBy("__shard").orderBy("__h", "id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = base.withColumn("__end_in_shard", F.sum("n_tokens").over(w))
    # Phase 2: per-shard base offsets — a skinny aggregate (16^shard_hex
    # rows) whose own running sum is trivially one tiny window task.
    wb = (Window.orderBy("__shard")
          .rowsBetween(Window.unboundedPreceding, -1))
    bases = (base.groupBy("__shard").agg(F.sum("n_tokens").alias("__t"))
             .select("__shard", F.coalesce(F.sum("__t").over(wb),
                                           F.lit(0)).alias("__base")))
    packed = within.join(F.broadcast(bases), "__shard")
    off_end = F.col("__base") + F.col("__end_in_shard")
    return (packed
            .withColumn("__off_end", off_end)
            .select(F.col("id").alias(id_col), "n_tokens",
                    (F.col("__off_end") - F.col("n_tokens"))
                    .alias("offset_start"),
                    F.expr(f"(__off_end - n_tokens) DIV {seq_len}")
                    .alias("first_seq"),
                    F.expr(f"(__off_end - 1) DIV {seq_len}")
                    .alias("last_seq")))


def pack_sequences_sql(table: str, seq_len: int, id_col: str = "doc_id",
                       text_col: str = "text", seed: str = "pack") -> str:
    """ANSI-SQL twin of :func:`pack_sequences` (DuckDB oracle): ONE global
    running-sum window over the same ``(md5, id)`` order — the shard
    decomposition is an execution detail, not part of the spec, because
    the shard key is a prefix of the global sort key."""
    return f"""
      WITH base AS (
        SELECT {id_col} AS id,
               md5('{seed}:' || CAST({id_col} AS VARCHAR)) AS h,
               CAST(len(string_split({text_col}, ' ')) AS BIGINT)
                 AS n_tokens
        FROM {table}),
      off AS (
        -- DuckDB SUM(BIGINT) widens to HUGEINT (float64 via pandas):
        -- cast back so the value-level compare sees integers.
        SELECT id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY h, id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS off_end
        FROM base)
      SELECT id AS {id_col}, n_tokens,
             off_end - n_tokens AS offset_start,
             (off_end - n_tokens) // {seq_len} AS first_seq,
             (off_end - 1) // {seq_len} AS last_seq
      FROM off
    """
