"""Behavioral / product-analytics operators over event streams:
sequential funnels and cohort retention (north-star extension; ABSENT
in the reference, which has no event surface at all — SURVEY.md §2.4).

Both operators reduce an event corpus to a bounded report through
user-keyed aggregates — the scale contract: the corpus is touched a
fixed number of times (one filtered scan per funnel step / two scans
for retention), every shuffle is keyed on the user id (the natural
high-cardinality partitioning key, no skew beyond real power users),
and every intermediate frame after the first aggregate is USER-sized,
not event-sized. No windows over the whole corpus, no driver actions.

Ratios are reported in integer micro-units (``x·1e6 div base``) so the
cross-engine verification stays under the full hash gate — the
module-wide bit-exactness contract (see ``graph.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_span_seconds: int | None = None,
) -> DataFrame:
    """First-touch sequential funnel: for each prefix of ``steps``,
    how many users performed the steps IN ORDER — step k counted at
    its earliest occurrence STRICTLY AFTER the user's step-(k-1) time
    (the standard product-analytics semantics: re-orderings don't
    count, repeat events collapse to the first qualifying one).
    ``max_span_seconds`` additionally requires every step to land
    within that window of the user's step-1 time (a "converted within
    7 days" funnel).

    Plan shape: step 1 is one filtered user-keyed aggregate; each
    later step is one filtered corpus scan joined to the USER-sized
    previous-step frame (broadcast-eligible once the funnel narrows)
    then min-aggregated — k steps = k corpus scans, zero corpus-keyed
    shuffles beyond the user-hash ones, and the output is
    steps-sized. At 100 TB the event scan is the cost; filters push
    to parquet (type equality + timestamp range).

    Returns one row per step: ``step`` (1-based), ``event_type``,
    ``n_users``, ``conversion_micro`` (vs step 1) and
    ``step_conversion_micro`` (vs the previous step), both exact
    integer ratios.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel: need >= 2 steps, got {len(steps)}")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    reached = (
        ev.where(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__t1"))
        .localCheckpoint(eager=False)
    )
    per_step = [reached]
    prev = reached.select("__u", F.col("__t1").alias("__prev"), "__t1")
    for s in steps[1:]:
        cond = F.col("__ts") > F.col("__prev")
        if max_span_seconds is not None:
            cond = cond & (
                F.col("__ts")
                <= F.col("__t1") + F.expr(f"INTERVAL {int(max_span_seconds)} SECOND")
            )
        cur = (
            ev.where(F.col("__t") == s)
            .join(prev, "__u")
            .where(cond)
            .groupBy("__u", "__t1")
            .agg(F.min("__ts").alias("__tk"))
            .localCheckpoint(eager=False)
        )
        per_step.append(cur)
        prev = cur.select("__u", F.col("__tk").alias("__prev"), "__t1")
    counts = []
    for i, frame in enumerate(per_step):
        counts.append(
            frame.agg(F.count(F.lit(1)).cast("bigint").alias("__n")).select(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(steps[i]).alias("event_type"),
                F.col("__n").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w_first = (
        per_step[0].agg(F.count(F.lit(1)).cast("bigint").alias("__n1"))
    )
    # steps-sized frame × one-row scalar: the one-row crossJoin rule
    out = out.crossJoin(F.broadcast(w_first))
    from pyspark.sql.window import Window

    # the report is steps-sized — a window over it is driver-trivial
    prev_n = F.lag("n_users", 1).over(Window.orderBy("step"))
    # zero bases yield NULL rates, not a div-by-zero job failure: a
    # funnel whose step k converted nobody still reports the later
    # steps' (0-user) rows (hypothesis-caught under ANSI mode)
    return out.select(
        "step",
        "event_type",
        "n_users",
        F.expr(
            "CASE WHEN __n1 = 0 THEN cast(NULL as bigint) "
            "ELSE n_users * 1000000 div __n1 END"
        ).alias("conversion_micro"),
        prev_n.alias("__prev_n"),
    ).select(
        "step",
        "event_type",
        "n_users",
        "conversion_micro",
        F.expr(
            "CASE WHEN __prev_n IS NULL THEN cast(1000000 as bigint) "
            "WHEN __prev_n = 0 THEN cast(NULL as bigint) "
            "ELSE n_users * 1000000 div __prev_n END"
        ).alias("step_conversion_micro"),
    )


def cohort_retention(
    events: DataFrame,
    cohort_event: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
    max_weeks: int = 12,
) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the week
    of their FIRST ``cohort_event`` (e.g. ``signup``), and a cohort's
    week-``k`` retention is the fraction of it active (ANY event) in
    week ``cohort_week + k``. Weeks are integer indices since a fixed
    ``epoch`` date — FLOOR(datediff / 7) on both engines (Spark
    ``floor``, DuckDB ``//`` — which already floors), sidestepping
    the engine-specific ``date_trunc('week')`` start-of-week
    conventions that would break bit-exact parity. Floor (not
    truncate-toward-zero ``div``) keeps pre-epoch weeks aligned: with
    ``div``, the 6 days before the epoch would share index 0 with the
    7 days after it (a 13-day "week 0") — r9 ADVICE.

    Plan shape: two corpus scans (first-event aggregate; distinct
    user-week activity), one user-keyed join between a USER-sized and
    a user-week-sized frame, then a cohort-week aggregate — output is
    (cohorts × ``max_weeks``)-sized. Retention is an exact integer
    micro-ratio.
    """
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    ).withColumn(
        "__week",
        F.expr(
            f"CAST(floor(datediff(to_date(__ts), to_date('{epoch}')) / 7) AS INT)"
        ),
    )
    cohorts = (
        ev.where(F.col("__t") == cohort_event)
        .groupBy("__u")
        .agg(F.min("__week").alias("cohort_week"))
        .localCheckpoint(eager=False)
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    activity = ev.select("__u", "__week").distinct()
    active = (
        activity.join(cohorts, "__u")
        .withColumn("week_offset", F.col("__week") - F.col("cohort_week"))
        .where(
            (F.col("week_offset") >= 0) & (F.col("week_offset") < max_weeks)
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return (
        active.join(sizes, "cohort_week")
        .select(
            F.col("cohort_week").cast("int").alias("cohort_week"),
            F.col("week_offset").cast("int").alias("week_offset"),
            "n_cohort",
            "n_active",
            F.expr("n_active * 1000000 div n_cohort").alias("retention_micro"),
        )
    )


def event_sequences(
    events: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Frequent event SEQUENCES (fixed-length n-gram mining over each
    user's timeline — the PrefixSpan-lite journey report): order each
    user's events by (ts, tiebreakers), slide a length-``n`` window via
    ``lead``, and count every observed sequence corpus-wide. The
    product question it answers: "what do users actually DO in order?"
    (view→view→purchase vs view→error→churn).

    Plan shape: ONE window pass partitioned by user (high-cardinality
    key — no global sort), then a sequence-keyed aggregate whose output
    is at most |event_types|^n rows (bounded, tiny). Ties inside a
    user's timeline are broken by ``order_cols`` (default: the event
    id column if present) so the sequences are deterministic — the
    hash-gate requirement.

    Returns ``(step_1..step_n, n_occurrences)``.
    """
    if n < 2:
        raise ValueError(f"event_sequences: need n >= 2, got {n}")
    order_cols = order_cols if order_cols is not None else ["event_id"]
    order_by = [F.col(ts_col)] + [
        F.col(c) for c in order_cols if c in events.columns
    ]
    w = Window.partitionBy(F.col(user_col)).orderBy(*order_by)
    steps = [F.col(type_col).alias("step_1")] + [
        F.lead(F.col(type_col), k).over(w).alias(f"step_{k + 1}")
        for k in range(1, n)
    ]
    seq = events.select(*steps).where(
        F.col(f"step_{n}").isNotNull()
    )
    return seq.groupBy(*[f"step_{k + 1}" for k in range(n)]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )


def time_weighted_avg(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average (TWAP) of a sampled measurement per event
    type: each reading holds until the SAME user's next same-type
    reading (last-observation-carried-forward weighting), so a sensor
    that reports rarely but holds a high value for hours is weighted by
    those hours, not by its sample count — the difference between
    ``avg(value)`` and what the value actually WAS over time.

    Plan shape: one ``lead`` window pass partitioned by (user, type) —
    the high-cardinality entity key, never a global or per-type-only
    window that would serialize a 100 TB corpus through one partition —
    then a bounded per-type aggregate of the integer (value·duration)
    products. Values are floored to micro-units before multiplying
    (``floor(value * 1e6)`` — an IEEE-deterministic double op, so both
    engines agree bit-for-bit); durations are whole epoch seconds; the
    weighted sums run in decimal(38,0).

    Returns ``(event_type, n_intervals, total_seconds, twap_micro,
    plain_avg_micro)`` — the plain average included so the report shows
    WHERE time weighting changed the answer.
    """
    order_cols = order_cols if order_cols is not None else ["event_id"]
    tiebreak = [c for c in order_cols if c in events.columns]
    ev = events.select(
        F.col(type_col).alias("__t"),
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.expr(f"cast(floor({value_col} * 1000000.0) as bigint)").alias("__vm"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(tiebreak)],
    )
    w = Window.partitionBy("__u", "__t").orderBy(
        F.col("__ts"), *[F.col(f"__o{i}") for i in range(len(tiebreak))]
    )
    ev = ev.withColumn("__next_ts", F.lead("__ts").over(w))
    iv = ev.where(F.col("__next_ts").isNotNull()).select(
        "__t",
        "__vm",
        (
            F.unix_timestamp("__next_ts") - F.unix_timestamp("__ts")
        ).alias("__dur"),
    )
    return (
        iv.groupBy("__t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("__dur").cast("bigint").alias("total_seconds"),
            F.sum(
                F.expr("cast(__vm as decimal(38, 0)) * __dur")
            ).alias("__wsum"),
            F.sum("__vm").alias("__vsum"),
        )
        .select(
            F.col("__t").alias("event_type"),
            "n_intervals",
            "total_seconds",
            F.expr(
                "cast(CASE WHEN total_seconds = 0 THEN NULL "
                "ELSE __wsum div total_seconds END as bigint)"
            ).alias("twap_micro"),
            F.expr("__vsum div n_intervals").alias("plain_avg_micro"),
        )
    )


def ewma_smooth(
    events: DataFrame,
    value_col: str = "value",
    k: int = 8,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average with α = 1/2 over the last
    ``k`` readings of each (user, type) series — the trend-vs-noise
    smoother, rendered EXACTLY in integers: reading ``j`` steps back
    weighs ``2^(k-1-j)``, the divisor is ``2^k − 1``, so the weights
    are the binary EWMA truncated at depth ``k`` and every value is a
    micro-unit bigint (full hash gate; a float recurrence would
    accumulate in engine-specific order). Only rows with a full
    ``k``-deep history emit (a partial window would silently change
    the effective α). The division truncates toward zero (Spark
    ``div``) — identical to floor for the non-negative measurements
    this models; document if feeding signed series.

    One window pass partitioned by (user, type) — the entity key, so
    no partition serializes a 100 TB corpus — with ``k`` fixed lags
    folded in-row; no self-joins, no recurrence.

    Returns ``(user_id, event_type, ts, value_micro, ewma_micro)``.
    """
    if not 2 <= k <= 30:
        raise ValueError(f"ewma_smooth: need 2 <= k <= 30, got {k}")
    order_cols = order_cols if order_cols is not None else ["event_id"]
    tiebreak = [c for c in order_cols if c in events.columns]
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
        F.expr(f"cast(floor({value_col} * 1000000.0) as bigint)").alias(
            "value_micro"
        ),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(tiebreak)],
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts"), *[F.col(f"__o{i}") for i in range(len(tiebreak))]
    )
    lags = [F.lag("value_micro", j).over(w).alias(f"__l{j}") for j in range(1, k)]
    num = " + ".join(
        ["value_micro * " + str(1 << (k - 1))]
        + [f"__l{j} * {1 << (k - 1 - j)}" for j in range(1, k)]
    )
    den = (1 << k) - 1
    return (
        ev.select("user_id", "event_type", "ts", "value_micro", *lags)
        .where(F.col(f"__l{k - 1}").isNotNull())
        .select(
            "user_id",
            "event_type",
            "ts",
            "value_micro",
            F.expr(f"cast(({num}) div {den} as bigint)").alias("ewma_micro"),
        )
    )


def rfm_segments(
    orders: DataFrame,
    user_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    ref_date: str = "1999-01-01",
    buckets: int = 4,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) — the classic
    customer-base report: each customer's three metrics are quartile-
    scored 1..``buckets`` (higher = better on every axis) with
    ``ntile`` over a TOTAL order (metric, then customer id — ties are
    deterministic, the hash-gate requirement), and the output is one
    row per (r, f, m) segment with its population and revenue.

    Plan shape: one user-keyed aggregate (corpus → customer-sized),
    three window passes over the CUSTOMER-sized frame (global ntile =
    one sort of an already-aggregated relation — the vocab-sort cost
    class, not a corpus sort), one bounded segment aggregate. Money is
    exact cents.

    Returns ``(r_score, f_score, m_score, n_customers,
    monetary_cents)`` — at most ``buckets³`` rows.
    """
    per_user = orders.groupBy(F.col(user_col).alias("__u")).agg(
        F.expr(f"cast(datediff(to_date('{ref_date}'), max(to_date({ts_col}))) as bigint)").alias(
            "__recency_days"
        ),
        F.count(F.lit(1)).cast("bigint").alias("__frequency"),
        F.expr(f"cast(sum(cast(floor({amount_col} * 100) as bigint)) as bigint)").alias(
            "__monetary_cents"
        ),
    )
    # higher score = better: most-recent / most-frequent / biggest-spend
    # land in the top ntile because the orderBy puts them LAST
    r_w = Window.orderBy(F.col("__recency_days").desc(), F.col("__u"))
    f_w = Window.orderBy(F.col("__frequency").asc(), F.col("__u"))
    m_w = Window.orderBy(F.col("__monetary_cents").asc(), F.col("__u"))
    scored = per_user.select(
        "__u",
        "__monetary_cents",
        F.ntile(buckets).over(r_w).alias("r_score"),
        F.ntile(buckets).over(f_w).alias("f_score"),
        F.ntile(buckets).over(m_w).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("__monetary_cents").cast("bigint").alias("monetary_cents"),
    )


def adoption_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily adoption report: new users (first-ever activity that day),
    active users (any activity), and the cumulative user count — the
    growth-accounting backbone. "New" is an exact first-touch
    aggregate (min day per user — one user-keyed corpus pass), NOT a
    windowed distinct-count over an expanding frame (which would
    re-scan history per day); the cumulative sum then runs over the
    DAY-sized frame only.

    Plan shape: two corpus scans (first-day aggregate; distinct
    user-day activity), a day-keyed outer join of two day-sized
    frames, one window cumsum over ~365 rows/year. Exact integers.

    Returns ``(day, n_new_users, n_active_users, cum_users)``.
    """
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.expr(f"to_date({ts_col})").alias("__day"),
    )
    first = (
        ev.groupBy("__u")
        .agg(F.min("__day").alias("__day"))
        .groupBy("__day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_users"))
    )
    active = (
        ev.distinct()
        .groupBy("__day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_users"))
    )
    joined = active.join(first, "__day", "full_outer").select(
        F.col("__day").alias("day"),
        F.coalesce("n_new_users", F.lit(0)).cast("bigint").alias("n_new_users"),
        F.coalesce("n_active_users", F.lit(0))
        .cast("bigint")
        .alias("n_active_users"),
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.withColumn(
        "cum_users", F.sum("n_new_users").over(cum).cast("bigint")
    )


def touch_attribution(
    events: DataFrame,
    purchase_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """First-touch / last-touch revenue attribution — the marketing-
    analytics staple: every ``purchase`` event's revenue is credited to
    a CHANNEL (the event_type of a non-purchase "touch" by the same
    user), twice — once to the user's most recent touch at or before
    the purchase (last-touch), once to the user's earliest touch
    overall if it precedes the purchase (first-touch). Purchases with
    no preceding touch credit the ``(none)`` channel.

    Plan shape: ONE window pass partitioned by (user) ordered by
    ``(ts, is_purchase, event_id)`` — same-timestamp touches sort
    before the purchase they precede, the running ``last(touch,
    ignorenulls)`` / ``first(touch, ignorenulls)`` frames resolve both
    attributions without any join, and the per-user partition key
    keeps a 100 TB event log from serializing (no range join, no
    purchase × touch fan-out). Revenue is floored to integer
    micro-units before summing (hash-exact).

    Returns ``(model, channel, n_purchases, revenue_micro)`` with
    model ∈ {first_touch, last_touch}."""
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__t"),
        F.expr(f"cast(floor({value_col} * 1000000.0) as bigint)").alias("__vm"),
        (F.col(type_col) == purchase_type).cast("int").alias("__is_p"),
    )
    w = Window.partitionBy("__u").orderBy("__ts", "__is_p", "__id")
    touch = F.when(F.col("__is_p") == 0, F.col("__t"))
    frame = w.rowsBetween(Window.unboundedPreceding, -1)
    attributed = (
        ev.withColumn("__last_touch", F.last(touch, ignorenulls=True).over(frame))
        .withColumn("__first_touch", F.first(touch, ignorenulls=True).over(frame))
        .where(F.col("__is_p") == 1)
    )
    reports = []
    for model, col in (("first_touch", "__first_touch"), ("last_touch", "__last_touch")):
        reports.append(
            attributed.groupBy(
                F.coalesce(F.col(col), F.lit("(none)")).alias("channel")
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
                F.sum("__vm").cast("bigint").alias("revenue_micro"),
            )
            .select(F.lit(model).alias("model"), "channel", "n_purchases", "revenue_micro")
        )
    return reports[0].unionByName(reports[1])
