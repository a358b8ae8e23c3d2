"""Sequence packing and corpus sharding for LLM pretraining data prep
(north-star extension; the reference pipeline — ``/root/reference/
translate.py``, ``mapper.py`` — stops at cleaned/enriched tables and has
no training-batch layer at all).

Three operators cover the "cleaned corpus → training batches" gap:

- :func:`shuffle_shard` — deterministic corpus permutation + sharding.
  Training wants documents in a reproducible pseudo-random order, split
  into shards that workers stream independently. ``rand()`` is not
  reproducible across runs/engines; the hash-position trick is (same
  family as ``operators/sampling.py``).
- :func:`chunk_pack` — concat-and-chunk packing: the per-shard token
  stream is cut into fixed-``capacity`` chunks and documents may SPAN
  chunk boundaries (GPT-style pretraining batches). Pure window
  cumulative sum + ``sequence``/``explode`` — no Python, no iteration,
  whole-stage codegen end to end. This is the scale path: one shuffle
  (by shard), then per-row math.
- :func:`next_fit_pack` — whole-document packing: documents are never
  split; each lands fully inside one fixed-``capacity`` sequence,
  opened greedily in reading order (next-fit bin packing). Inherently
  SEQUENTIAL within a shard — bin state carries across rows — so this
  is the documented ``applyInPandas`` case: built-in operators cannot
  express the running reset, and the per-shard group is the unit a
  single worker packs anyway.

Scale notes (100 TB): every operator here shuffles the corpus exactly
once, on the shard/group key. Shard count is the knob that bounds
per-task state: at 100 TB you run ``n_shards`` in the tens of thousands
so a shard (and therefore a ``next_fit_pack`` Arrow batch group or a
``chunk_pack`` window partition) stays executor-sized. Skewed groups
cannot arise from data values — the shard key is a uniform hash.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.portable import md5_i64, tokens_col


def shuffle_shard(
    df: DataFrame, id_col: str, n_shards: int, salt: str = "shuf"
) -> DataFrame:
    """Deterministic corpus shuffle + sharding.

    Every row gets ``pos_hash = md5(salt|id)`` (60-bit, uniform),
    ``shard = pos_hash % n_shards`` and ``pos`` = its rank inside the
    shard by ``(pos_hash, id)`` — a reproducible pseudo-random reading
    order any engine can replay. One hash shuffle on ``shard``; the
    rank sort happens within each shard partition.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = md5_i64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("pos_hash", id_col)
    return (
        df.withColumn("pos_hash", h)
        .withColumn("shard", (F.col("pos_hash") % F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )


def chunk_pack(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    partition_col: str,
) -> DataFrame:
    """Concat-and-chunk packing (documents may span chunk boundaries).

    Within each ``partition_col`` shard, documents are laid end to end
    in ``id_col`` order into one token stream; chunk ``c`` is the slice
    ``[c*capacity, (c+1)*capacity)`` of that stream. A document whose
    tokens occupy stream positions ``[start, end)`` contributes to every
    chunk from ``start // capacity`` through ``(end-1) // capacity`` and
    the output has one row per (document, chunk) with the token
    sub-range ``[tok_from, tok_to)`` of the document that lands in that
    chunk. Zero-length documents are dropped (they occupy no stream
    positions).

    All window + per-row arithmetic + ``explode(sequence(...))`` —
    no UDF, one shuffle on the shard key.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cap = F.lit(capacity)
    start = F.coalesce(F.sum(len_col).over(w), F.lit(0))
    out = (
        df.where(F.col(len_col) > 0)
        .withColumn("__start", start)
        .withColumn("__end", F.col("__start") + F.col(len_col))
        .withColumn(
            "chunk_id",
            # integer DIV, not double division: stream offsets at 100 TB
            # exceed 2^53 and would lose exactness through a double
            F.explode(
                F.sequence(
                    F.expr(f"__start DIV {int(capacity)}"),
                    F.expr(f"(__end - 1) DIV {int(capacity)}"),
                )
            ),
        )
        .withColumn(
            "tok_from", F.greatest(F.col("chunk_id") * cap, F.col("__start")) - F.col("__start")
        )
        .withColumn(
            "tok_to",
            F.least((F.col("chunk_id") + 1) * cap, F.col("__end")) - F.col("__start"),
        )
        .drop("__start", "__end")
    )
    return out


def next_fit_pack(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    len_col: str,
    capacity: int,
) -> DataFrame:
    """Whole-document next-fit packing (documents never split).

    Within each group, documents are visited in ``id_col`` order; a
    document goes into the currently open sequence if it fits, else a
    new sequence opens. A document longer than ``capacity`` occupies a
    sequence of its own (real pipelines truncate upstream; packing must
    still terminate). Emits ``seq_id`` (0-based within the group) and
    ``offset`` (token offset of the document inside its sequence).

    The running fill state makes this genuinely sequential per group —
    the documented ``applyInPandas`` case (see module docstring). The
    group key is the packing unit AND the parallelism unit; shard so
    groups stay executor-sized.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    group_cols = list(group_cols)
    base = df.select(*group_cols, id_col, len_col)
    schema = StructType(
        [base.schema[c] for c in group_cols + [id_col, len_col]]
        + [StructField("seq_id", LongType()), StructField("offset", LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq_ids: list[int] = []
        offsets: list[int] = []
        seq = -1
        fill = capacity + 1  # force a new sequence on the first doc
        for n in pdf[len_col].astype("int64"):
            if fill + n > capacity:
                seq += 1
                offsets.append(0)
                fill = int(n)
            else:
                offsets.append(fill)
                fill += int(n)
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    return base.groupBy(*group_cols).applyInPandas(pack, schema)


def overlap_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG/context-prep chunking: each document's token stream becomes
    overlapping windows of ``chunk_tokens`` tokens advancing by
    ``stride`` (stride < chunk_tokens ⇒ the standard overlap; the last
    window may be short; zero-token docs emit nothing).

    Unlike :func:`chunk_pack` (corpus-wide GPT-style packing, docs span
    chunk boundaries) this is PER-DOCUMENT and boundary-respecting —
    the retrieval-index shape, not the training-batch shape. Pure
    sequence → transform → explode codegen: no Python, no shuffle, no
    state; the explode's fan-out is bounded by n_tokens/stride per row.
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError(
            f"chunk_tokens and stride must be positive, got {chunk_tokens}, {stride}"
        )
    if stride > chunk_tokens:
        # stride past the window silently DROPS the tokens between
        # windows (found by the coverage property test) — that's
        # sampling, not chunking; make the foot-gun impossible
        raise ValueError(
            f"stride ({stride}) > chunk_tokens ({chunk_tokens}) would skip tokens"
        )
    toks = tokens_col(F.col(text_col))
    prepped = df.select(F.col(id_col), toks.alias("__toks")).where(
        F.size(toks) > 0
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("__toks")) - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_no"),
            F.slice(F.col("__toks"), s + 1, chunk_tokens).alias("toks"),
        ),
    )
    ex = prepped.select(F.col(id_col), F.explode(chunks).alias("c"))
    return ex.select(
        F.col(id_col),
        F.col("c.chunk_no").alias("chunk_no"),
        F.size("c.toks").alias("chunk_len"),
        F.array_join("c.toks", " ").alias("chunk_text"),
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Deterministic per-shard output manifest: row count plus an
    ORDER-INSENSITIVE content hash (exact decimal sum of the portable
    md5 over the concatenated value columns). Two runs producing the
    same shard contents produce byte-identical manifests regardless of
    partitioning, task order, or engine — the reproducibility receipt a
    training pipeline stores next to every published shard set, and the
    cheap diff when re-validating delivered data against a rerun.

    One aggregate on the shard key; the decimal(38,0) sum never
    overflows at any shard size. NULLs hash as the empty string, so a
    NULL and '' collide — acceptable for a manifest (flag columns where
    that distinction matters by adding an is-null indicator column).

    Returns ``(shard_col, n_rows, content_hash)``.
    """
    from ..functions.portable import md5_i64

    row_hash = md5_i64(
        F.concat_ws("|", *[F.col(c).cast("string") for c in value_cols])
    ).cast("decimal(38,0)")
    # hash rendered as a STRING: a 38-digit decimal survives every
    # serialization (JSON manifests, pandas, engines without int128)
    # without float coercion mangling the digits
    return df.groupBy(shard_col).agg(
        F.count("*").alias("n_rows"),
        F.sum(row_hash).cast("decimal(38,0)").cast("string").alias("content_hash"),
    )
