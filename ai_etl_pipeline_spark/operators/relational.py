"""Relational operator surface (SURVEY.md §2.4, §2.5, §7 tier 3).

ABSENT in the reference (no joins, no keyed aggregation, no windows, no
sorts, no set ops — SURVEY.md §2.4/§2.5); exposed here as thin idiomatic
wrappers over the DataFrame API so Catalyst owns the physical strategy:

- joins: Catalyst picks broadcast-hash vs shuffled-hash vs sort-merge;
  ``broadcast_hint=True`` forces BHJ for known-small build sides.
- aggregations: map-side partial agg + final agg come free from
  ``groupBy().agg()``; grouping sets / rollup / cube are built-in.
- windows: ``Window.partitionBy().orderBy()`` with rank/lag/frames.
- top-k: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a
  per-partition heap + driver merge, NOT a global sort; the right plan
  at any scale.

Keeping these declarative is the whole point: predicate pushdown, column
pruning, join reordering and AQE re-planning apply to every pipeline
built from them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

JOIN_TYPES = {
    "inner", "left", "right", "full", "left_semi", "left_anti", "cross",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast_hint: bool = False,
) -> DataFrame:
    """Equi/theta join. ``on`` may be column names or a boolean Column
    (theta/range joins: pass an expression like
    ``(l.ts >= r.start) & (l.ts < r.end)``)."""
    if how not in JOIN_TYPES:
        raise ValueError(f"unsupported join type {how!r}")
    r = F.broadcast(right) if broadcast_hint else right
    return left.join(r, on=on, how=how)


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range join of a fact column against a SMALL interval dimension
    (value >= lo AND value < hi).

    Spark's generic plan for this is BroadcastNestedLoopJoin — per-row
    interpreted predicate evaluation, the slowest operator in the engine.
    When the intervals are non-overlapping (the common banding case), the
    join is a function, not a relation: compile it to a codegen'd CASE
    chain — zero join, zero shuffle, scan-speed at any scale. Overlapping
    intervals fall back to the BNLJ (correct, just slower).

    The interval side is collected to the driver — it is a dimension by
    assumption (bands/buckets/tiers), never data-sized.
    """
    rows = intervals.collect()
    other_cols = [c for c in intervals.columns if c not in (lo_col, hi_col)]
    spans = sorted(((r[lo_col], r[hi_col], r) for r in rows), key=lambda x: (x[0], x[1]))
    non_overlapping = all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))
    if not non_overlapping:
        cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        return fact.join(F.broadcast(intervals), cond, "inner")
    v = F.col(value_col)
    out_cols = {}
    for c in other_cols:
        expr = None
        for lo, hi, r in spans:
            branch = F.when((v >= F.lit(lo)) & (v < F.lit(hi)), F.lit(r[c]))
            expr = branch if expr is None else expr.when((v >= F.lit(lo)) & (v < F.lit(hi)), F.lit(r[c]))
        out_cols[c] = expr
    matched = None
    for lo, hi, _ in spans:
        m = (v >= F.lit(lo)) & (v < F.lit(hi))
        matched = m if matched is None else (matched | m)
    out = fact.where(matched)
    for c, expr in out_cols.items():
        out = out.withColumn(c, expr)
    lo_out = None
    hi_out = None
    for lo, hi, _ in spans:
        cnd = (v >= F.lit(lo)) & (v < F.lit(hi))
        lo_out = F.when(cnd, F.lit(lo)) if lo_out is None else lo_out.when(cnd, F.lit(lo))
        hi_out = F.when(cnd, F.lit(hi)) if hi_out is None else hi_out.when(cnd, F.lit(hi))
    return out.withColumn(lo_col, lo_out).withColumn(hi_col, hi_out)


def aggregate(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """Keyed aggregation; ``aggs`` maps output name → agg Column."""
    exprs = [c.alias(name) for name, c in aggs.items()]
    return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)


def rollup_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    return df.rollup(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def cube_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    return df.cube(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def window_rank(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    rank_col: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(rank_col, fn().over(w))


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Grouped top-k via row_number — one shuffle on the group keys, rank
    evaluated streaming within each sorted partition."""
    return (
        window_rank(df, partition_by, order_by, "rn")
        .where(F.col("rn") <= k)
    )


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (heap, no full sort)."""
    return df.orderBy(*order_by).limit(k)


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the (large, possibly skewed) left side
    gets a deterministic salt in [0, n); the (smaller) right side is
    replicated n× with every salt value; the join key becomes
    (key, salt). A hot key's rows now spread over n reducers instead of
    one. Result is EXACTLY the plain join (salt columns are dropped).

    AQE's skew-join split handles mid skew automatically; explicit
    salting is the tool when one key dominates a shuffle partition even
    after splitting, or when AQE is unavailable (streaming joins).
    """
    salt = F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt_buckets))
    l = left.withColumn("__salt", salt.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l.join(r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def pivot_agg(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    values: list[str],
    agg: Column,
    fill=None,
) -> DataFrame:
    """Pivot with an EXPLICIT value list — never the implicit distinct
    scan (which is an extra pass over the data at scale)."""
    out = df.groupBy(group_col).pivot(pivot_col, values).agg(agg)
    if fill is not None:
        out = out.na.fill(fill, subset=values)
    return out


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_expr: Column | None = None,
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` / kdb ``aj`` semantics): for
    every left row, attach the payload of the single right row with the
    largest ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward'
    = smallest right_ts >= left_ts) within the same ``on`` key. Ties
    (right_ts == left_ts) match, like merge_asof's default.

    Spark has no native as-of join; the scalable rendering is the
    UNION + WINDOW idiom, NOT a range join: tag both relations, union,
    and take ``last(payload ignoring nulls)`` over an ordered window per
    key. ONE shuffle on the key, no join explosion, no per-left-row
    range scan — O(n log n) at any scale, and skew only where the key
    itself is skewed (same salting story as any keyed op).

    ``right`` must be unique per (on, right_ts) — pre-aggregate if not
    (the classic merge_asof contract). ``tolerance_expr``: optional
    boolean Column over ``F.col("__t")`` (the left row's timestamp) and
    ``F.col("__asof_ts")`` limiting the match age; out-of-tolerance rows
    keep NULL payloads. Returns all left rows + an ``__asof_ts`` column
    + the right payload columns."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_r"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    u = l.unionByName(r.select(*l.columns))
    asc = direction == "backward"
    # at equal __t the right row must be visible to the left row, so
    # right sorts first: (ts asc, is_r desc) backward / (ts desc, is_r
    # desc) forward
    order = [F.col("__t").asc() if asc else F.col("__t").desc(), F.col("__is_r").desc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
        .withColumn(
            "__asof_ts",
            F.last(F.when(F.col("__is_r") == 1, F.col("__t")), ignorenulls=True).over(w),
        )
        .where(F.col("__is_r") == 0)
    )
    if tolerance_expr is not None:
        matched = matched.withColumn(
            "__m", F.when(tolerance_expr, F.col("__m"))
        ).withColumn("__asof_ts", F.when(tolerance_expr, F.col("__asof_ts")))
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__asof_ts"),
        *[F.col("__m")[c].alias(c) for c in right_cols],
    )


def bloom_filter_build(
    dim: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over ``dim[key_col]`` as a ONE-ROW DataFrame
    with a dense ``array<bigint>`` of ``m_bits/64`` packed words
    (column ``__bf_words``).

    The point at scale: a dimension too big to BROADCAST-HASH-join
    (hundreds of millions of keys = GBs of hash table) still compresses
    to an m_bits/8-byte bit set (1 MiB per 2^23 bits) that CAN be
    broadcast, turning a big-big shuffle join into "prune the fact
    map-side first, then shuffle only probable matches". This is the
    same idea as Spark's runtime bloom-filter rewrite
    (spark.sql.optimizer.runtime.bloomFilter.*), rendered explicitly so
    it applies to any plan shape and any join the optimizer won't
    rewrite.

    Entirely JVM-side: positions come from ``xxhash64`` (the filter is
    internal — never replayed by an oracle, so the portable-md5 contract
    doesn't apply), packing is one ``bit_or`` aggregate over ≤
    ``num_hashes * |dim|`` position rows, densification is a word-index
    range join + sorted-struct collect. No driver collect: the result
    stays a one-row DataFrame. NOTE: do NOT crossJoin this frame onto a
    fact table — BroadcastNestedLoopJoin copies the word array into
    every output row's UnsafeRow (~filter_size × |fact| of memcpy);
    :func:`bloom_prune_join` probes a packed BINARY literal instead.

    Sizing: false-positive rate ≈ (1 - e^(-kn/m))^k; the default
    m=2^20, k=4 gives ~2.4% at n=100k keys. Size m ≈ 10 bits/key for
    ~1% at other scales.
    """
    words = _bloom_sparse_words(dim, key_col, m_bits, num_hashes)
    n_words = m_bits // 64
    # densify by joining the full word-index range and sorting (struct
    # sort = order by first field), NOT by map_from_entries +
    # element_at-per-index: element_at on an ArrayBasedMapData is a
    # LINEAR scan, so that rendering is O(n_words²) inside a single
    # final-aggregate row (~14 s at the default 16384 words; this one
    # is O(n_words log n_words) and distributed until the last collect)
    spark = dim.sparkSession
    idx = spark.range(n_words).select(F.col("id").alias("__bf_i"))
    # broadcast: words is ≤ n_words rows of two longs (≤ 256 KiB at the
    # default m) — a shuffle here would cost more than the build itself
    dense = idx.join(F.broadcast(words), idx["__bf_i"] == words["__bf_w"], "left").select(
        F.col("__bf_i"),
        F.coalesce(F.col("__bf_word"), F.lit(0).cast("bigint")).alias("__bf_val"),
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("__bf_i"), F.col("__bf_val")))),
            lambda s: s["__bf_val"],
        ).alias("__bf_words")
    )


def _bloom_sparse_words(
    dim: DataFrame, key_col: str, m_bits: int, num_hashes: int
) -> DataFrame:
    """Sparse Bloom words: ``(__bf_w, __bf_word)`` for every 64-bit word
    with at least one set bit — the shared kernel of
    :func:`bloom_filter_build` (dense one-row frame) and
    :func:`bloom_filter_pack` (driver-side byte packing)."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not (1 <= num_hashes <= 16):
        raise ValueError(f"num_hashes must be in [1,16], got {num_hashes}")
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.lit(j), F.col(key_col)), F.lit(m_bits))
                for j in range(num_hashes)
            ]
        )
    ).alias("__bf_pos")
    words = (
        dim.select(pos)
        .select(
            F.shiftright(F.col("__bf_pos"), 6).alias("__bf_w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast((__bf_pos & 63) as int))"
            ).alias("__bf_mask"),
        )
        .groupBy("__bf_w")
        .agg(F.expr("bit_or(__bf_mask)").alias("__bf_word"))
    )
    return words


def _bloom_member_expr(pos_cols: list[str]) -> str:
    """SQL predicate: every position's bit is set in ``__bf_words``."""
    return " AND ".join(
        f"((element_at(__bf_words, cast(shiftright({p}, 6) as int) + 1)"
        f" & shiftleft(cast(1 as bigint), cast(({p} & 63) as int))) != 0)"
        for p in pos_cols
    )


def bloom_filter_pack(
    dim: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> bytes:
    """The :func:`bloom_filter_build` bit set packed to ``m_bits / 8``
    little-endian BYTES on the driver — one bounded collect of exactly
    one row (the filter is dimension-DERIVED but never dimension-SIZED:
    128 KiB at the default m regardless of key cardinality, the same
    audit class as the IVF centroid collect).

    Little-endian word packing makes the byte layout position-uniform:
    bit ``p`` of the filter lives in byte ``p >> 3`` at in-byte bit
    ``p & 7`` — no word math needed on the probe side.

    Collects the SPARSE non-zero words (≤ m_bits/64 two-long rows) and
    densifies in Python: one job (scan → explode → word aggregate →
    collect), no densify join — the build latency rides the fact
    query's critical path, so stages matter.
    """
    import struct

    rows = _bloom_sparse_words(dim, key_col, m_bits, num_hashes).collect()
    arr = bytearray(m_bits // 8)
    for r in rows:
        struct.pack_into("<q", arr, r["__bf_w"] * 8, r["__bf_word"])
    return bytes(arr)


def _bloom_member_bytes(packed: Column, pos: Column) -> Column:
    """Bit test against a BINARY-literal Bloom filter: extract the one
    byte holding position ``pos`` and test its bit. ``substring`` /
    ``hex`` / ``conv`` are all whole-stage-codegen JVM expressions; the
    filter itself is a single Literal — ONE entry in the codegen
    references array, shared by every row — so nothing filter-sized is
    ever copied per row (the defect of the one-row-broadcast crossJoin
    rendering this replaces: BroadcastNestedLoopJoin materialized the
    128 KiB word array into every fact row's UnsafeRow)."""
    byte_val = F.conv(
        F.hex(packed.substr((F.shiftright(pos, 3) + F.lit(1)).cast("int"), F.lit(1))),
        16,
        10,
    ).cast("int")
    # bit test without shiftleft-by-a-Column (PySpark's shiftleft only
    # takes a literal shift): floor(byte / 2^bit) % 2 — exact for
    # byte in [0,255], bit in [0,7]
    mask = F.pow(F.lit(2.0), F.pmod(pos, F.lit(8)).cast("int"))
    return F.pmod(F.floor(byte_val / mask).cast("int"), F.lit(2)) == F.lit(1)


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    how: str = "left_semi",
    m_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Join with a map-side Bloom pre-filter on the fact side. The
    result is EXACTLY ``join(fact, dim, ...)`` — an exact join runs
    after the prune, so Bloom false positives cannot leak through; the
    filter only reduces how many fact rows reach the shuffle.

    how='left_semi' / 'inner': fact rows failing the Bloom are
    discarded map-side (they provably have no dim match); survivors go
    through the normal shuffled/broadcast exact join.

    how='left_anti': inverted use — fact rows FAILING the Bloom are
    definite non-matches and bypass the join entirely; only Bloom hits
    (matches + false positives) go through the exact anti join. Trades
    a second map-side scan of the fact for shuffling only the hit
    subset — the right trade whenever the anti-join survivor set is
    large (the common decontamination shape).

    Rendering: the filter is packed to ``m_bits/8`` bytes driver-side
    (:func:`bloom_filter_pack` — one bounded one-row collect, filter-
    sized not dimension-sized) and rides the probe as a single BINARY
    literal. A literal is one codegen reference shared by all rows; the
    previous one-row-broadcast ``crossJoin`` rendering concatenated the
    word array into every fact row's UnsafeRow (~filter_size × |fact|
    bytes of memcpy — the exact scale-wall this operator exists to
    avoid). The probe is byte-extract + bit-test per hash, entirely
    inside whole-stage codegen, evaluated map-side before any shuffle.
    Note the filter build runs EAGERLY at call time (one small Spark
    job over the dim).
    """
    if how not in ("left_semi", "inner", "left_anti"):
        raise ValueError(f"bloom_prune_join supports semi/inner/anti, got {how!r}")
    dim_key = dim_key or fact_key
    packed = F.lit(
        bloom_filter_pack(dim, dim_key, m_bits=m_bits, num_hashes=num_hashes)
    )
    member_terms = [
        _bloom_member_bytes(
            packed, F.pmod(F.xxhash64(F.lit(j), F.col(fact_key)), F.lit(m_bits))
        )
        for j in range(num_hashes)
    ]
    member = member_terms[0]
    for t in member_terms[1:]:
        member = member & t
    # alias the dim key internally so identical fact/dim key names never
    # produce an ambiguous self-join-style condition
    dim_keys = dim.select(F.col(dim_key).alias("__bf_dim_key"))
    key_cond = F.col(fact_key) == F.col("__bf_dim_key")
    if how == "left_anti":
        misses = fact.where(~member)
        hits = fact.where(member)
        return misses.unionByName(
            hits.join(dim_keys, on=key_cond, how="left_anti")
        )
    pruned = fact.where(member)
    if how == "left_semi":
        return pruned.join(dim_keys, on=key_cond, how="left_semi")
    if fact_key == dim_key:
        return pruned.join(dim, on=fact_key, how="inner")
    return pruned.join(dim, on=F.col(fact_key) == dim[dim_key], how="inner")


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Shuffle-skew diagnosis for a prospective join/groupBy key: the
    ``top_k`` heaviest keys with row counts and corpus fractions. The
    operational question it answers at 100 TB: "will one reducer get
    hammered?" — a key holding 5% of a 100 TB fact table is a 5 TB
    shuffle partition, which no executor survives; this report is what
    decides between a plain join, AQE skew split, and explicit salting
    (``salted_join``).

    One partial-aggregated groupBy + TakeOrderedAndProject (per-
    partition heap, no global sort). Ties break by key value so the
    report is deterministic. Returns
    ``(key_col, n_rows, frac)`` ordered heaviest-first.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    total = df.count()
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("frac", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc(), F.col(key_col))
        .limit(top_k)
    )


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Time-series gap-fill: a regular per-key time grid (from the
    key's truncated min timestamp through its max, every ``step``) with
    each value column filled by LAST OBSERVATION CARRIED FORWARD — the
    resampling step feature pipelines need before joining irregular
    event streams onto model-ready regular intervals.

    Shape: one per-key min/max aggregate (key-sized), an in-row
    ``sequence`` explode for the grid (no shuffle — rows already carry
    their key), then ONE key-partitioned window over the union of
    observations and grid points: ``last(value, ignorenulls=true)``
    over rows-unbounded-preceding. Observations order BEFORE the grid
    point at the same timestamp, so an on-grid observation is its own
    fill. Grid points before a key's first observation stay NULL
    (nothing to carry). Returns one row per (key, grid_ts)."""
    if not value_cols:
        raise ValueError("resample_locf: value_cols must be non-empty")
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("__mn"),
        F.max(ts_col).alias("__mx"),
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.expr(f"sequence(__mn, __mx, interval {step})")
        ).alias(ts_col),
    )
    obs = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__is_grid"),
        *[F.col(c) for c in value_cols],
    )
    g = grid.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("__is_grid"),
        *[F.lit(None).cast(dict(df.dtypes)[c]).alias(c) for c in value_cols],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("__is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = obs.unionByName(g)
    for c in value_cols:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return filled.where(F.col("__is_grid") == 1).drop("__is_grid")


def join_strategy_report(
    left: DataFrame,
    right: DataFrame,
    key: str,
    broadcast_rows: int = 1_000_000,
    skew_frac: float = 0.2,
) -> DataFrame:
    """Pre-flight join diagnosis — the decision :func:`key_skew_report`
    feeds, as one row: per-side row counts, distinct key counts, and
    the heaviest key's share, plus a ``recommendation``:
    ``broadcast_right`` / ``broadcast_left`` when a side fits the
    broadcast budget (row-count proxy; calibrate ``broadcast_rows`` to
    executor memory / row width), ``salt_or_aqe_skew`` when one key
    owns more than ``skew_frac`` of the bigger side (one reducer would
    eat that key's whole shuffle partition), else
    ``shuffle_hash_or_sort_merge``. Two single-pass aggregates — the
    corpus is read once per side and never joined."""

    def side(df: DataFrame, tag: str) -> DataFrame:
        per_key = df.groupBy(key).agg(F.count("*").alias("__c"))
        return per_key.agg(
            F.sum("__c").alias(f"{tag}_rows"),
            F.count("*").alias(f"{tag}_keys"),
            F.max("__c").alias(f"{tag}_max_key_rows"),
        )
    l, r = side(left, "left"), side(right, "right")
    rep = l.crossJoin(F.broadcast(r))
    bigger_rows = F.greatest(F.col("left_rows"), F.col("right_rows"))
    bigger_max = F.when(
        F.col("left_rows") >= F.col("right_rows"), F.col("left_max_key_rows")
    ).otherwise(F.col("right_max_key_rows"))
    rec = (
        F.when(F.col("right_rows") <= broadcast_rows, F.lit("broadcast_right"))
        .when(F.col("left_rows") <= broadcast_rows, F.lit("broadcast_left"))
        .when(bigger_max > skew_frac * bigger_rows, F.lit("salt_or_aqe_skew"))
        .otherwise(F.lit("shuffle_hash_or_sort_merge"))
    )
    return rep.select(
        "left_rows", "left_keys", "left_max_key_rows",
        "right_rows", "right_keys", "right_max_key_rows",
        F.round(bigger_max / bigger_rows, 6).alias("max_key_share"),
        rec.alias("recommendation"),
    )


def auto_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    broadcast_rows: int = 1_000_000,
    skew_frac: float = 0.2,
    salt_buckets: int = 8,
) -> DataFrame:
    """Strategy-applying join: runs :func:`join_strategy_report` (two
    single-pass aggregates, ONE one-row driver collect — the bounded
    scalar kind) and executes its recommendation instead of just
    printing it:

    - ``broadcast_right`` / ``broadcast_left`` → broadcast-hinted
      equi-join (the hint side is the one under ``broadcast_rows``);
    - ``salt_or_aqe_skew`` → :func:`salted_join` with the BIGGER side
      as the salted probe (the smaller side is replicated
      ``salt_buckets``×); inner joins only on this branch — skewed
      outer joins should go through AQE's skew handling instead;
    - ``shuffle_hash_or_sort_merge`` → plain equi-join (Catalyst/AQE
      pick the physical strategy).

    Result is EXACTLY the plain ``left.join(right, key, how)`` on
    every branch — only the physical plan differs. The two stats
    passes read each side once; at 100 TB that cost is the point (a
    mis-planned shuffle join costs far more than two map-side
    aggregates), and callers with known shapes call the specific
    operator directly."""
    rep = join_strategy_report(
        left, right, key, broadcast_rows=broadcast_rows, skew_frac=skew_frac
    ).collect()[0]
    rec = rep["recommendation"]
    if rec == "broadcast_right":
        return left.join(F.broadcast(right), key, how)
    if rec == "broadcast_left":
        return F.broadcast(left).join(right, key, how)
    if rec == "salt_or_aqe_skew":
        if how != "inner":
            raise ValueError(
                f"auto_join: salted branch supports inner joins only, got {how!r}"
            )
        if rep["right_rows"] > rep["left_rows"]:
            # salt the bigger (right) side; restore the caller's
            # column order after the swap
            cols = [c for c in left.columns] + [
                c for c in right.columns if c != key
            ]
            return salted_join(right, left, key, "inner", salt_buckets).select(*cols)
        return salted_join(left, right, key, "inner", salt_buckets)
    return left.join(right, key, how)


def market_basket_rules(
    df: DataFrame,
    txn_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Pairwise association rules over a (transaction, item) relation —
    support / confidence / lift, the classic market-basket mining
    output (and, on a corpus, the "terms that co-occur more than
    chance" profile). Itemsets stop at pairs: the frequent-pair tier
    is where the recommender/co-occurrence value is, and pairs keep
    the plan a single bounded self-join instead of Apriori's level-wise
    candidate explosion.

    Plan shape: dedup to distinct (txn, item); one txn-keyed self-join
    (fan-out bounded by basket size, the co-purchase projection
    precedent) → pair counts filtered by ``min_pair_count`` BEFORE any
    further joins; two item-keyed joins attach the marginals; one
    scalar transaction count broadcasts. All ratios are exact integer
    micro-units; the lift numerator (≈ n²·1e6) runs in decimal(38,0)
    so billion-transaction corpora don't overflow int64 (the HITS
    lesson).

    Returns one row per surviving unordered pair: ``item_a < item_b``,
    ``pair_count``, ``support_micro`` (pair / all txns),
    ``conf_a_to_b_micro`` / ``conf_b_to_a_micro`` (pair / marginal),
    and ``lift_micro`` (1e6 = independence).
    """
    if min_pair_count < 1:
        raise ValueError(
            f"market_basket_rules: min_pair_count must be >= 1, got {min_pair_count}"
        )
    # the basket relation is referenced FOUR times (both self-join
    # sides, the marginals, the txn count) — hash-partition on the
    # self-join key and lazily checkpoint so the base scan runs once
    # and the self-join reuses the layout (the pagerank idiom)
    t = (
        df.select(
            F.col(txn_col).alias("__txn"), F.col(item_col).alias("__item")
        )
        .distinct()
        .repartition(F.col("__txn"))
        .localCheckpoint(eager=False)
    )
    n_txn = t.agg(
        F.count_distinct(F.col("__txn")).cast("bigint").alias("__n")
    )
    item_cnt = t.groupBy("__item").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    a, b = t.alias("__a"), t.alias("__b")
    pairs = (
        a.join(b, F.col("__a.__txn") == F.col("__b.__txn"))
        .where(F.col("__a.__item") < F.col("__b.__item"))
        .groupBy(
            F.col("__a.__item").alias("item_a"),
            F.col("__b.__item").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    return (
        pairs.join(
            item_cnt.select(
                F.col("__item").alias("item_a"), F.col("__cnt").alias("__ca")
            ),
            "item_a",
        )
        .join(
            item_cnt.select(
                F.col("__item").alias("item_b"), F.col("__cnt").alias("__cb")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_txn))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.expr("pair_count * 1000000 div __n").alias("support_micro"),
            F.expr("pair_count * 1000000 div __ca").alias("conf_a_to_b_micro"),
            F.expr("pair_count * 1000000 div __cb").alias("conf_b_to_a_micro"),
            F.expr(
                # both sides of the integral divide widened to decimal:
                # two ~3e9 marginals overflow the bigint product __ca*__cb
                # even though the numerator was already decimal (r9 ADVICE)
                "cast(cast(pair_count as decimal(38, 0)) * __n * 1000000 "
                "div (cast(__ca as decimal(38, 0)) * __cb) as bigint)"
            ).alias("lift_micro"),
        )
    )
