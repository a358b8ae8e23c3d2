"""Change-data-capture operators: latest-wins merge (upsert) and SCD
type-2 validity ranges (north-star extension; the reference pipeline —
``/root/reference/mapper.py`` — produces star-schema fact/dim tables
but has no incremental-maintenance story at all).

Both operators are pure DataFrame compositions — no UDFs, no driver
state — and shuffle the data exactly once, on the business key:

- :func:`merge_upsert` — union all change sets, keep the
  highest-version row per key (``row_number`` over a key-partitioned
  window). Union+window beats a chain of outer joins: it takes any
  number of sources in one pass, one shuffle total, and AQE's skew
  handling applies to the single exchange.
- :func:`scd2_snapshot` — order each key's change events by effective
  time and close every interval with ``lead()``: rows become
  ``[valid_from, valid_to)`` validity ranges with an ``is_current``
  flag (the standard dimension-history layout; ``valid_to`` is NULL on
  the open interval).

Scale notes (100 TB): the window partitions by the business key, so
state per task is one key's history — bounded by change frequency, not
corpus size. A pathological hot key (billions of versions of one row)
would skew; the standard fix is compacting change sets before the merge
(aggregate max-version per key per batch), which this operator also
expresses — feed it pre-compacted batches.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins merge of a base snapshot and a change set.

    Rows are matched on ``key_cols``; for each key the row with the
    highest ``version_col`` wins (ties break toward ``updates`` — the
    change set is newer by contract). Schemas must match by name
    (``unionByName``).

    Deletes: when ``op_col`` is given, rows whose value equals
    ``delete_op`` are tombstones. They participate in latest-wins like
    any other change — so a later re-insert revives the key — and a key
    whose WINNING row is a tombstone is dropped from the snapshot
    (latest-wins-then-filter, the standard CDC merge rendering; a NULL
    op is treated as an upsert). Without ``op_col`` the merge is
    upsert-only, as before.
    """
    key_cols = list(key_cols)
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    merged = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    if op_col is not None:
        # same single exchange: the tombstone filter is a post-window
        # predicate, evaluated in the window stage
        merged = merged.where(
            F.coalesce(F.col(op_col) != F.lit(delete_op), F.lit(True))
        )
    return merged


def scd2_snapshot(
    df: DataFrame,
    key_cols: Sequence[str],
    effective_col: str,
    tiebreak_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change-event log into
    validity ranges.

    Each key's events are ordered by ``(effective_col, tiebreak_col)``
    (the tiebreaker makes the layout deterministic when two changes
    share an effective time — same lesson as the streaming-session
    oracle). Adds ``valid_from`` (= effective time), ``valid_to`` (next
    change's effective time, NULL for the open interval) and
    ``is_current``.

    Deletes: when ``op_col`` is given, ``delete_op`` rows close the
    preceding version (its ``valid_to`` becomes the delete's effective
    time — the delete participates in the lead() ordering) but produce
    no dimension row themselves, so a deleted key ends with NO current
    row; a later re-insert opens a fresh interval. NULL ops are kept.
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(effective_col, tiebreak_col)
    out = (
        df.withColumn("valid_from", F.col(effective_col))
        .withColumn("valid_to", F.lead(effective_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    if op_col is not None:
        # post-window filter: evaluated after lead(), so a tombstone
        # still closes its predecessor before being dropped
        out = out.where(
            F.coalesce(F.col(op_col) != F.lit(delete_op), F.lit(True))
        )
    return out


def incremental_agg(
    state: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental maintenance of a keyed aggregate (sums + counts) —
    refresh a 100 TB rollup from a delta batch without rescanning the
    corpus.

    ``state`` is the previous aggregate table (``key_cols`` +
    ``sum_cols`` + ``count_col``); ``delta`` is RAW new rows. The delta
    is aggregated alone (delta-sized shuffle), then merged with state
    by re-aggregating the union of the two aggregate tables — sums and
    counts are decomposable, so ``agg(state ∪ agg(delta)) ==
    agg(full)`` exactly. Cost: one delta-sized shuffle plus one
    state-sized re-aggregation; the raw corpus is never touched. For
    state tables far larger than the delta, partition the state table
    on the key at write time so AQE keeps the merge shuffle-light.

    Only decomposable measures belong here (sum/count — and avg as
    sum/count at read time); min/max survive inserts but not deletes,
    and distinct counts need sketches — both out of scope by design.
    """
    key_cols = list(key_cols)
    sum_cols = list(sum_cols)
    delta_agg = delta.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count("*").cast("long").alias(count_col),
    )
    merged = state.select(*key_cols, *sum_cols, count_col).unionByName(delta_agg)
    return merged.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).cast("long").alias(count_col),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    check_unique: bool = False,
) -> DataFrame:
    """Reconciliation diff of two keyed snapshots — the migration /
    backfill / replication validator: every key classified as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by comparing
    an md5 row-hash over ``compare_cols`` (default: all shared
    non-key columns, in ``old``'s column order).

    ONE full-outer join on the keys; the hash is computed map-side on
    each input, so the shuffle carries (keys + 32-char hash), not the
    row payload — the shape that survives comparing two 100 TB
    snapshots. NULL cells are encoded with an explicit per-column
    is-null flag byte AHEAD of the value (plain sentinel strings
    collide with a cell whose actual value is the sentinel; a bare
    concat_ws would silently SKIP NULLs, making ('a', NULL) collide
    with ('a',)); the unit separator keeps ('ab','c') distinct from
    ('a','bc').

    CONTRACT: keys must be unique within each snapshot — duplicate
    keys fan out the full-outer join (pre-aggregate, e.g. with
    :func:`merge_upsert`, if they are not). ``check_unique=True``
    embeds a lazy loud-failure guard (key-partitioned window count →
    ``raise_error``) on both sides; it costs one extra shuffle per
    side, so it is opt-in.

    Returns ``(key_cols..., diff_status)``."""
    if not key_cols:
        raise ValueError("table_diff: key_cols must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in key_cols
        ]
    if not compare_cols:
        raise ValueError("table_diff: no shared non-key columns to compare")

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        parts: list = []
        for c in compare_cols:
            parts.append(F.when(F.col(c).isNull(), F.lit("0")).otherwise(F.lit("1")))
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        h = F.md5(F.concat_ws("\x1f", *parts))
        if check_unique:
            # the guard lives INSIDE the hash expression so column
            # pruning cannot eliminate it
            cnt = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
            h = F.when(
                cnt > 1,
                F.raise_error(
                    F.concat(
                        F.lit("table_diff: duplicate key ("),
                        F.concat_ws(
                            ",", *[F.col(c).cast("string") for c in key_cols]
                        ),
                        F.lit(") — snapshots must be unique per key"),
                    )
                ),
            ).otherwise(h)
        return df.select(*key_cols, h.alias(alias))

    o = hashed(old, "__old_h")
    n = hashed(new, "__new_h")
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*key_cols, status.alias("diff_status"))


def join_delta(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: Sequence[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incremental INNER-join view maintenance for INSERT-ONLY deltas —
    the classic IVM identity the lakehouse "don't recompute the view"
    story rests on: with ``V = L ⋈ R`` materialized and insert batches
    ``ΔL``/``ΔR`` arriving,

        ΔV = (ΔL ⋈ R) ∪all (L ⋈ ΔR) ∪all (ΔL ⋈ ΔR)

    in BAG semantics — exactly the rows to append to the stored view,
    derived WITHOUT touching ``V`` or re-joining ``L ⋈ R``. (Expand the
    product: ``(L+ΔL) ⋈ (R+ΔR) − L ⋈ R`` leaves precisely those three
    terms; a correctness oracle can therefore also compute ΔV as the
    multiset difference of the two full joins, which is how the
    registry query cross-checks this operator.)

    Scale shape (100 TB view, GB-sized batches): the two base-side
    joins put the BASE relation on the streamed side and the
    batch-sized delta on the broadcast side (``broadcast_deltas``,
    default on — disable when a delta is itself table-sized and a
    shuffle join is the right plan), so maintaining the view costs two
    base scans and zero base shuffles; ``ΔL ⋈ ΔR`` is batch × batch.
    Deletes/updates need keyed tombstones and the stored view —
    :func:`merge_upsert` territory, deliberately out of scope for the
    insert-only fast path.

    Schemas: ``base_left``/``delta_left`` must match by name, ditto
    right; join columns ``on`` appear once in the output (Spark's
    USING-style equi-join), left columns then right columns.
    """
    on = list(on)

    def b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_deltas else df

    part1 = b(delta_left).join(base_right, on, "inner")
    part2 = base_left.join(b(delta_right), on, "inner")
    # tiny × tiny: both sides are batch-sized; keep the hint off and
    # let AQE pick (a broadcast hint on BOTH sides is contradictory)
    part3 = delta_left.join(b(delta_right), on, "inner")
    return part1.unionByName(part2).unionByName(part3)


def scd2_lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    event_time_col: str,
    how: str = "left",
) -> DataFrame:
    """POINT-IN-TIME lookup join — the consumption half of
    :func:`scd2_snapshot`: attach to every fact row the dimension
    version that was VALID AT THE FACT'S EVENT TIME
    (``valid_from <= t`` and ``t < valid_to``, open interval NULL-safe)
    — the join every "as the customer looked when the order shipped"
    report and every leakage-free ML feature lookup needs (training
    features must come from the version valid at label time, never the
    current row).

    Plan shape: an EQUI-join on the business key (hash join, or
    broadcast when the dimension history is small) with the range
    predicates as a residual filter — never a cross or theta-only
    join. A key's validity ranges partition its timeline (lead() by
    construction, zero-width ranges from effective-time ties match
    nothing), so at most ONE dimension version survives per fact: the
    join CANNOT fan out. ``dim`` must carry ``valid_from``/``valid_to``
    (:func:`scd2_snapshot` output); its key columns are dropped from
    the result (they duplicate the fact side). The dimension's key and
    validity columns are re-aliased to fresh names BEFORE the join:
    facts and dim routinely share lineage (both derived from the same
    base table), and ``df[col]`` disambiguation is unreliable on
    self-join-shaped plans — a first cut silently dropped the FACT's
    key and merged every unmatched fact into one NULL-key group."""
    key_cols = list(key_cols)
    others = [
        c
        for c in dim.columns
        if c not in key_cols and c not in ("valid_from", "valid_to")
    ]
    clash = [c for c in others + ["valid_from", "valid_to"] if c in facts.columns]
    if clash:
        raise ValueError(
            f"scd2_lookup_join: dim columns {clash} collide with fact columns"
        )
    d = dim.select(
        *[F.col(k).alias(f"__pit_{k}") for k in key_cols],
        F.col("valid_from").alias("__pit_from"),
        F.col("valid_to").alias("__pit_to"),
        *[F.col(c) for c in others],
    )
    cond = None
    for k in key_cols:
        c = facts[k] == F.col(f"__pit_{k}")
        cond = c if cond is None else cond & c
    t = facts[event_time_col]
    cond = (
        cond
        & (t >= F.col("__pit_from"))
        & (F.col("__pit_to").isNull() | (t < F.col("__pit_to")))
    )
    out = facts.join(d, cond, how)
    return (
        out.drop(*[f"__pit_{k}" for k in key_cols])
        .withColumnRenamed("__pit_from", "valid_from")
        .withColumnRenamed("__pit_to", "valid_to")
    )
