"""Declarative data-quality expectations (north-star extension; the
reference validates nothing — a bad parquet silently propagates).

The dbt-test / Great-Expectations shape re-expressed Spark-first: a
rule list compiles into ONE aggregate pass over the corpus — each
row-level rule is a ``sum(case when violated then 1 else 0)`` column,
so checking 20 rules costs one scan, not 20. ``unique`` rules use
``count - count_distinct`` inside the same aggregate. The result is a
tiny (rules-sized) report frame: pipelines gate on ``passed`` and ship
the report to the sink of their choice.

At 100 TB: the scan is the cost floor for any validation; everything
here stays inside that single pass (codegen conditionals + one
hash-aggregate), and the output is O(rules), never O(rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class Rule:
    """One expectation over one column. ``kind`` ∈ {not_null, unique,
    in_range, matches, accepted_values}; ``args`` per kind:
    in_range=(lo, hi) inclusive, matches=(regex,),
    accepted_values=(v1, v2, ...)."""

    name: str
    column: str
    kind: str
    args: tuple = ()


def not_null(column: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_not_null", column, "not_null")


def unique(column: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_unique", column, "unique")


def in_range(column: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_in_range", column, "in_range", (lo, hi))


def matches(column: str, pattern: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_matches", column, "matches", (pattern,))


def accepted_values(column: str, values: Sequence, name: str | None = None) -> Rule:
    return Rule(
        name or f"{column}_accepted_values", column, "accepted_values", tuple(values)
    )


def _violation_expr(rule: Rule) -> Column:
    """NULL-safe per-row violation predicate. Convention: NULL values
    only violate ``not_null`` — range/regex/set rules skip NULLs, the
    composable standard (stack a not_null rule to forbid them)."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.args
        return c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(rule.args[0])
    if rule.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(list(rule.args))
    raise ValueError(f"unknown rule kind: {rule.kind!r}")


def expect(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate every rule in one aggregate pass. Returns one row per
    rule: (rule, column, kind, n_violations, passed) — a fully LAZY
    plan: the one-row aggregate is unpivoted with ``stack`` and rule
    metadata attached from literal maps, so nothing collects to the
    driver and the report composes into larger plans."""
    if not rules:
        raise ValueError("expect() needs at least one rule")
    seen = set()
    for r in rules:
        if r.name in seen:
            raise ValueError(f"duplicate rule name: {r.name!r}")
        seen.add(r.name)
    aggs = []
    for r in rules:
        if r.kind == "unique":
            # duplicates = non-null count minus distinct count (NULLs are
            # not duplicates of each other here; add not_null to forbid)
            aggs.append(
                (
                    F.count(F.col(r.column)) - F.count_distinct(F.col(r.column))
                ).alias(r.name)
            )
        else:
            aggs.append(
                F.coalesce(F.sum(_violation_expr(r).cast("long")), F.lit(0)).alias(
                    r.name
                )
            )
    one_row = df.agg(*aggs)
    stack_args = ", ".join(f"'{r.name}', `{r.name}`" for r in rules)
    long = one_row.selectExpr(
        f"stack({len(rules)}, {stack_args}) as (rule, n_violations)"
    )
    col_map = F.create_map(
        *[x for r in rules for x in (F.lit(r.name), F.lit(r.column))]
    )
    kind_map = F.create_map(
        *[x for r in rules for x in (F.lit(r.name), F.lit(r.kind))]
    )
    return long.select(
        F.col("rule"),
        F.element_at(col_map, F.col("rule")).alias("column"),
        F.element_at(kind_map, F.col("rule")).alias("kind"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def enforce(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Gate: return ``df`` unchanged when every rule passes, raise
    ``ValueError`` naming the failures otherwise — the CI shape."""
    report = expect(df, rules).collect()
    failed = [r for r in report if not r["passed"]]
    if failed:
        detail = ", ".join(f"{r['rule']}={r['n_violations']}" for r in failed)
        raise ValueError(f"data-quality expectations failed: {detail}")
    return df


def referential_integrity_report(
    child: DataFrame,
    specs: Sequence[tuple[str, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan report: for each ``(fk_name, child_col,
    parent_df, parent_col)`` spec, count child rows/keys whose non-NULL
    key has no match in the parent (the dbt ``relationships`` test,
    Deequ's ``isContainedIn`` over a column reference). NULL child keys
    are skipped per the SQL FK convention — stack a ``not_null`` rule
    in :func:`expect` to forbid them.

    Spark-first shape, per FK: the child is pre-aggregated to
    ``(key, cnt)`` — a partial-aggregate shuffle that shrinks the probe
    side from rows to DISTINCT KEYS before any join — then left-joined
    against the parent's distinct keys and reduced to one row. At
    100 TB the child groupBy is the cost floor (one scan + map-side
    combine); the join's build side is parent *keys*, broadcast-able
    for dims, and the output is O(#FKs), never O(rows). Each FK is an
    independent plan branch so Spark schedules them concurrently under
    one union.

    Returns one row per spec, ordered by ``fk``:
    ``(fk, child_keys, orphan_keys, orphan_rows, passed)``.
    """
    if not specs:
        raise ValueError("referential_integrity_report() needs at least one spec")
    seen = set()
    for fk_name, _, _, _ in specs:
        if fk_name in seen:
            raise ValueError(f"duplicate fk name: {fk_name!r}")
        seen.add(fk_name)
    reports = []
    for fk_name, child_col, parent, parent_col in specs:
        ck = (
            child.where(F.col(child_col).isNotNull())
            .groupBy(F.col(child_col).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pk = parent.select(F.col(parent_col).alias("k")).distinct().withColumn(
            "_hit", F.lit(1)
        )
        orphan = F.col("_hit").isNull()
        reports.append(
            ck.join(pk, "k", "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("child_keys"),
                F.coalesce(F.sum(orphan.cast("long")), F.lit(0))
                .cast("long")
                .alias("orphan_keys"),
                F.coalesce(
                    F.sum(F.when(orphan, F.col("cnt")).otherwise(F.lit(0))),
                    F.lit(0),
                )
                .cast("long")
                .alias("orphan_rows"),
            )
            .select(
                F.lit(fk_name).alias("fk"),
                "child_keys",
                "orphan_keys",
                "orphan_rows",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("orphan_rows") == 0).orderBy("fk")


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of one numeric column — the standard distribution-drift
    monitor (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 major drift).
    Bin edges are the REFERENCE's exact ``n_bins``-quantiles, applied
    to both sides in-row (``size(filter(cuts, c -> x > c))`` — the
    quantile_bins idiom), so the report is two bounded aggregates + one
    bin-keyed outer join: each corpus is scanned once, the join carries
    ``n_bins`` rows. Zero shares are floored at ``eps`` (the standard
    PSI convention — ln(p/q) must stay finite when a bin empties out).

    Returns one row per bin: ``(bin, n_ref, n_cur, ref_share,
    cur_share, psi_term, psi_total)`` with shares at 6dp and PSI terms
    at 4dp (ln is the one libm call here; rounding absorbs engine
    low-bit differences)."""
    if n_bins < 2:
        raise ValueError(f"population_stability: n_bins must be >= 2, got {n_bins}")
    fracs = [i / n_bins for i in range(1, n_bins)]
    cuts = ref.where(F.col(col).isNotNull()).agg(
        F.percentile(F.col(col), F.array(*[F.lit(f) for f in fracs])).alias("__cuts")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        with_cuts = df.where(F.col(col).isNotNull()).crossJoin(F.broadcast(cuts))
        idx = F.size(
            F.filter("__cuts", lambda c: F.col(col).cast("double") > c)
        ).alias("bin")
        return with_cuts.select(idx).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    r = binned(ref, "n_ref")
    c = binned(cur, "n_cur")
    joined = r.join(c, "bin", "full_outer").select(
        F.col("bin"),
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    totals = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    with_t = joined.crossJoin(F.broadcast(totals))
    p = F.greatest(F.col("n_ref") / F.col("__tr"), F.lit(eps))
    q = F.greatest(F.col("n_cur") / F.col("__tc"), F.lit(eps))
    term = F.round((p - q) * F.log(p / q), 4)
    from pyspark.sql import Window as _W

    out = with_t.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(F.col("n_ref") / F.col("__tr"), 6).alias("ref_share"),
        F.round(F.col("n_cur") / F.col("__tc"), 6).alias("cur_share"),
        term.alias("psi_term"),
    )
    # total from INTEGER-scaled terms: summing rounded doubles is
    # accumulation-order-dependent in the low bits; summing bigints is
    # exact and engine-order-free
    return out.withColumn(
        "psi_total",
        (
            F.sum(F.round(F.col("psi_term") * 10000).cast("bigint")).over(
                _W.partitionBy(F.lit(1))
            )
            / 10000.0
        ),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Privacy audit for a release/training corpus: k-anonymity (every
    quasi-identifier combination is shared by ≥ k rows) and, when
    ``sensitive_col`` is given, l-diversity (each equivalence class
    holds ≥ l distinct sensitive values — k-anonymity alone fails when
    a class is uniform in the sensitive attribute).

    One quasi-key aggregate over the corpus (class-sized result), one
    bounded summary aggregate — the two-level aggregation idiom; at
    100 TB the corpus scan is the floor and the equivalence-class
    frame is as skew-safe as the quasi-key cardinality. NULL
    quasi-values group as their own class (standard SQL grouping).

    Returns ONE row: ``n_rows``, ``n_classes``, ``k_anonymity`` (the
    achieved k = smallest class), ``n_classes_below_k`` /
    ``n_rows_below_k`` (re-identification exposure at the requested
    ``k``), ``meets_k``, and with a sensitive column ``l_diversity``
    (the achieved l = min distinct sensitive values per class).
    """
    if k < 1:
        raise ValueError(f"k_anonymity_report: k must be >= 1, got {k}")
    qcols = [F.col(c) for c in quasi_cols]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).cast("bigint").alias("__l")
        )
    classes = df.groupBy(*qcols).agg(*aggs)
    out_aggs = [
        F.sum("__size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__size").cast("bigint").alias("k_anonymity"),
        F.sum((F.col("__size") < k).cast("bigint"))
        .cast("bigint")
        .alias("n_classes_below_k"),
        F.sum(F.when(F.col("__size") < k, F.col("__size")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_below_k"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("__l").cast("bigint").alias("l_diversity"))
    return classes.agg(*out_aggs).withColumn(
        "meets_k", F.col("k_anonymity") >= k
    )


def seeded_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    sensitivity: int = 1,
    salt: str = "dp",
) -> DataFrame:
    """SEEDED-noise per-group counts — the two-sided GEOMETRIC mechanism
    (Ghosh et al. 2009, the discrete analogue of Dwork et al.'s Laplace
    mechanism) derandomized through a salted hash:
    ``noisy = count + G1 − G2`` with ``G_i ~ Geometric``,
    ``P(G ≥ k) = alpha^k``, ``alpha = exp(−epsilon/sensitivity)``.

    WHAT THIS IS AND IS NOT (r14, renamed from ``dp_noisy_counts``):
    the noise is a deterministic function of ``(salt, group key)``, so
    the guarantee is AT BEST computational DP under a SECRET seed —
    anyone who learns the salt recomputes the noise and recovers the
    exact counts. The salt must be treated as a secret key and must
    NEVER appear in published receipts or replay plans of an actual
    release; conversely, the registry rendering of this operator
    publishes its salt ON PURPOSE so the DuckDB oracle can replay the
    mechanism bit-for-bit — that rendering demonstrates the MECHANISM
    and is explicitly not a private release. Two further honest
    caveats: (a) the 1e-6 uniform granularity bounds each draw at
    ``floor(ln(5e-7)/ln(alpha))`` ≈ 14.5·sensitivity/epsilon, so the
    unbounded tails pure eps-DP requires are truncated; (b) for actual
    releases use real randomness (or a keyed PRF with the key managed
    like any other secret).

    Each geometric draw comes from an md5-hash uniform of (salt, draw
    index, group key) through the inverse CDF ``floor(ln(u)/ln(alpha))``
    — and since ``ln(alpha) = −epsilon/sensitivity`` exactly, no
    exp/log roundtrip enters the plan. The group key hashes NULL-SAFELY
    and INJECTION-SAFELY (r14 + r15 ADVICE): every column renders as
    ``'n'`` for NULL vs ``'v|' || length(value) || '|' || value``
    otherwise — the length prefix makes the rendering prefix-free, so
    values containing the ``'|'`` delimiter can no longer collide
    across adjacent columns (('a|v','b') vs ('a','v|b') previously
    both rendered 'v|a|v|v|b' and drew identical noise).

    Cost shape: ONE group aggregate over the corpus (map-side combine),
    then per-group scalar math — output is group-sized. At 100 TB the
    scan is the floor; nothing here adds a second pass."""
    from ..functions.portable import md5_i64

    if epsilon <= 0:
        raise ValueError(f"seeded_noisy_counts: epsilon must be > 0, got {epsilon}")
    if sensitivity < 1:
        raise ValueError(
            f"seeded_noisy_counts: sensitivity must be >= 1, got {sensitivity}"
        )
    counts = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("__tc")
    )
    key = F.concat_ws(
        "|",
        *[
            F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                F.concat(
                    F.lit("v|"),
                    F.length(F.col(c).cast("string")).cast("string"),
                    F.lit("|"),
                    F.col(c).cast("string"),
                )
            )
            for c in group_cols
        ],
    )
    neg_eps = -(epsilon / sensitivity)  # = ln(alpha), exactly

    def geometric(idx: int):
        u = (
            F.pmod(
                md5_i64(F.concat(F.lit(f"{salt}|{idx}|"), key)),
                F.lit(1_000_000),
            )
            + F.lit(0.5)
        ) / F.lit(1_000_000.0)
        return F.floor(F.log(u) / F.lit(neg_eps))

    return counts.select(
        *group_cols,
        (F.col("__tc") + geometric(1) - geometric(2))
        .cast("bigint")
        .alias("noisy_count"),
    )


def auc_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """ROC-AUC of a score against a binary label — the standard quality
    receipt for any ranker/classifier/filter score in the pipeline
    (is the quality score actually predictive of the keep/drop label?).

    Computed by the tie-corrected rank-sum identity, in EXACT integer
    arithmetic: aggregate to per-distinct-score (pos, neg) counts
    first — ONE corpus shuffle keyed on the score — then
    ``U₂ = Σ_s pos_s · (2·neg_below(s) + neg_s)`` over the
    scores-sized frame and ``auc_micro = U₂·1e6 div (2·n_pos·n_neg)``
    (ties contribute the conventional half-credit; the ×2 scaling
    keeps halves integral; the product runs in decimal(38,0)). The
    only window runs over DISTINCT scores — quantize a continuous
    score to fixed precision first at 100 TB so that frame stays
    small; the corpus itself is never globally sorted.

    ``label_col`` must be 0/1 (or boolean). Degenerate inputs (no
    positives or no negatives) fail loudly on the div-by-zero rather
    than reporting a fake 0.5. Returns ONE row:
    ``(n_pos, n_neg, auc_micro)``.
    """
    from pyspark.sql import Window

    sc = (
        df.select(
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .groupBy("__s")
        .agg(
            F.sum("__y").cast("bigint").alias("__pos"),
            F.sum(1 - F.col("__y")).cast("bigint").alias("__neg"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    sc = sc.withColumn(
        "__neg_below", F.coalesce(F.sum("__neg").over(w), F.lit(0).cast("bigint"))
    )
    return sc.agg(
        F.sum("__pos").cast("bigint").alias("n_pos"),
        F.sum("__neg").cast("bigint").alias("n_neg"),
        F.sum(F.expr("__pos * (2 * __neg_below + __neg)"))
        .cast("bigint")
        .alias("__u2"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr(
            "cast(cast(__u2 as decimal(38, 0)) * 1000000 "
            "div (2 * n_pos * n_neg) as bigint)"
        ).alias("auc_micro"),
    )


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law first-digit
# probabilities as FIXED integer micro-unit literals, identical in the
# engine and every oracle (computing log10 at runtime risks a 1-ulp
# libm difference flipping the floor on exactly the wrong value)
BENFORD_MICRO = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)


def benford_report(df: DataFrame, column: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/synthetic-data smell test for a numeric fact
    column (real multiplicative processes start with 1 about 6.5× as
    often as with 9; fabricated or uniformly-generated numbers don't).

    Semantics: rows with value >= 1 contribute the first digit of the
    integer part (``substr(cast(floor(x) as string)``) — exact for
    doubles, no log10 per row); rows below 1 / NULL are excluded and
    reported via ``n_rows_considered``. Per digit d = 1..9: observed
    count, observed share (micro), Benford's expected share (the
    ``BENFORD_MICRO`` literals — see above), and the integer-scaled
    chi-square contribution ``(obs·1e6 − n·exp_micro)² / (n·exp_micro·
    1e6)`` in micro-units, computed entirely in decimal(38,0). A digit
    with zero observations still reports a row (its chi-square term is
    the full expected mass). The total chi-square statistic is the sum
    of the 9 ``chi2_term_micro`` values (compare against the 15.51 /
    20.09 critical values for 8 degrees of freedom at 5% / 1%).

    Plan: one filtered corpus aggregate (9 groups) joined to a
    9-literal expected frame — bounded output, no skew, scan-speed.
    """
    digits = df.select(
        F.expr(
            f"substr(cast(cast(floor({column}) as bigint) as string), 1, 1)"
        ).alias("__d")
    ).where(
        F.col(column).isNotNull() & (F.col(column) >= 1)
    )
    obs = digits.groupBy("__d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    expected = [(d + 1, BENFORD_MICRO[d]) for d in range(9)]
    exp_df = obs.sparkSession.createDataFrame(
        expected, "digit int, exp_share_micro bigint"
    )
    joined = exp_df.join(
        obs.select(F.col("__d").cast("int").alias("digit"), "n_obs"),
        "digit",
        "left",
    ).select("digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs"), "exp_share_micro")
    total = joined.agg(F.sum("n_obs").cast("bigint").alias("__n"))
    # 9-row frame × one-row scalar: the one-row crossJoin rule
    return (
        joined.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            F.col("__n").alias("n_rows_considered"),
            F.expr(
                "CASE WHEN __n = 0 THEN cast(NULL as bigint) "
                "ELSE n_obs * 1000000 div __n END"
            ).alias("obs_share_micro"),
            "exp_share_micro",
            F.expr(
                "CASE WHEN __n = 0 THEN cast(NULL as bigint) ELSE cast("
                "(cast(n_obs as decimal(38, 0)) * 1000000 - cast(__n as decimal(38, 0)) * exp_share_micro) "
                "* (cast(n_obs as decimal(38, 0)) * 1000000 - cast(__n as decimal(38, 0)) * exp_share_micro) "
                "div (cast(__n as decimal(38, 0)) * exp_share_micro * 1000000) "
                "as bigint) END"
            ).alias("chi2_term_micro"),
        )
        .orderBy("digit")
    )


def linreg_report(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group simple (ordinary-least-squares) linear regression —
    slope, intercept and R² of ``y ~ x`` for every group, from EXACT
    integer moment sums: x and y are scaled to integers first
    (``round(v · scale)`` — exact for currency-style doubles with
    ``scale=100``), the five moments (n, Σx, Σy, Σxy, Σx², Σy²)
    accumulate in decimal(38,0) with NO float anywhere, and

        slope  = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        icept  = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

    are emitted as exact integer micro-ratios (full hash gate — unlike
    ``regr_slope``, whose float accumulation order is engine-specific).
    R² = num² / (den_x·den_y) would overflow decimal(38,0) when
    squared, so the exact integer moments are cast to double FIRST and
    the ratio computed in floats — casting the SAME exact integer to
    double is IEEE-deterministic, so both engines still agree bit-for-
    bit; rounded to 6.

    Degenerate groups (constant x: den_x = 0) report NULL slope /
    intercept / r2 rather than failing. One corpus scan, group-sized
    output; at 100 TB this is a partial-aggregate pipeline with no
    second pass (the moments are one-pass sufficient statistics).

    ABSENT in the reference (no ML-stats surface; §2.5 aggregates
    family).
    """
    xs = f"cast(round({x_col} * {scale}) as decimal(38, 0))"
    ys = f"cast(round({y_col} * {scale}) as decimal(38, 0))"
    m = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"sum({xs})").alias("__sx"),
        F.expr(f"sum({ys})").alias("__sy"),
        F.expr(f"sum({xs} * {ys})").alias("__sxy"),
        F.expr(f"sum({xs} * {xs})").alias("__sxx"),
        F.expr(f"sum({ys} * {ys})").alias("__syy"),
    )
    num = "(n * __sxy - __sx * __sy)"
    den_x = "(n * __sxx - __sx * __sx)"
    den_y = "(n * __syy - __sy * __sy)"
    return m.select(
        *group_cols,
        "n",
        F.expr(
            f"CASE WHEN {den_x} = 0 THEN cast(NULL as bigint) "
            f"ELSE cast({num} * 1000000 div {den_x} as bigint) END"
        ).alias("slope_micro"),
        F.expr(
            # intercept is in x/y units (the `scale` cancels):
            # (Σy·Σx² − Σx·Σxy) / (den_x · scale) scaled to micro
            f"CASE WHEN {den_x} = 0 THEN cast(NULL as bigint) "
            f"ELSE cast((__sy * __sxx - __sx * __sxy) * 1000000 "
            f"div ({den_x} * {scale}) as bigint) END"
        ).alias("intercept_micro"),
        F.expr(
            f"CASE WHEN {den_x} = 0 OR {den_y} = 0 THEN cast(NULL as double) "
            f"ELSE round(cast({num} as double) * cast({num} as double) "
            f"/ (cast({den_x} as double) * cast({den_y} as double)), 6) END"
        ).alias("r2"),
    )


def concentration_report(
    df: DataFrame,
    key_col: str,
    value_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Value-concentration (Lorenz / Gini) report: how much of a fact
    column's total the top key groups own — the whale-detection /
    fairness question ("do 10% of customers carry 60% of revenue?",
    "do 1% of domains dominate the corpus?"). Keys are aggregated to
    exact cents, ranked ascending (value, then key — total order for
    the hash gate), cut into ``buckets`` ntiles, and each bucket
    reports its population, value, cumulative value, and cumulative
    share (micro). The Gini coefficient rides along as an exact
    integer micro ratio from the grouped formula ``(2·Σ(rank·v) −
    (n+1)·Σv) / (n·Σv)`` — decimal(38,0) products, truncating div.

    Plan shape: one corpus aggregate (→ key-sized), one sort of the
    KEY-sized frame (the vocab-sort cost class), one bucket aggregate,
    window cumsum over ``buckets`` rows. All values non-negative by
    construction of a revenue-style fact column — the truncating div
    equals floor; signed measures need a guard.

    Returns ``(bucket, n_keys, value_cents, cum_value_cents,
    cum_share_micro, gini_micro)``.
    """
    per_key = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.expr(f"cast(sum(cast(floor({value_col} * 100) as bigint)) as bigint)").alias(
            "__v"
        )
    )
    w = Window.orderBy(F.col("__v").asc(), F.col("__k").asc())
    ranked = per_key.select(
        "__v",
        F.row_number().over(w).alias("__r"),
        F.ntile(buckets).over(w).alias("bucket"),
    )
    totals = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__v").cast("bigint").alias("__total"),
        F.sum(F.expr("cast(__r as decimal(38, 0)) * __v")).alias("__rv"),
    )
    by_bucket = ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("__v").cast("bigint").alias("value_cents"),
    )
    cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        by_bucket.withColumn(
            "cum_value_cents", F.sum("value_cents").over(cum).cast("bigint")
        )
        # buckets-sized frame × one-row scalar: the one-row crossJoin rule
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_keys",
            "value_cents",
            "cum_value_cents",
            F.expr(
                "CASE WHEN __total = 0 THEN cast(NULL as bigint) "
                "ELSE cum_value_cents * 1000000 div __total END"
            ).alias("cum_share_micro"),
            F.expr(
                "CASE WHEN __total = 0 THEN cast(NULL as bigint) ELSE "
                "cast((2 * __rv - (cast(__n as decimal(38, 0)) + 1) * __total) "
                "* 1000000 div (cast(__n as decimal(38, 0)) * __total) "
                "as bigint) END"
            ).alias("gini_micro"),
        )
        .orderBy("bucket")
    )


def moment_report(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group distribution-shape report — mean, population variance,
    skewness, and EXCESS kurtosis — from EXACT integer power sums
    (Σx, Σx², Σx³, Σx⁴ over scaled integers in decimal(38,0)), with the
    shape statistics derived in doubles cast from those exact integers:
    both engines see identical IEEE inputs and an identical expression
    tree, so the report hash-matches, where the built-in ``skewness`` /
    ``kurtosis`` aggregates never can (engine-specific accumulation
    order AND differing sample-vs-population conventions — DuckDB's are
    bias-corrected sample statistics, Spark's are population).

    Overflow bound (documented, not silent): rows·(scale·max|x|)⁴ must
    stay under 1e38 — ~1e35 at the engine's bench scale; petabyte-row
    facts should pre-aggregate or rescale.

    One corpus scan (partial-aggregate pipeline), group-sized output:
    ``(group_cols..., n, mean, variance, skewness, kurtosis_excess)``
    — moments in the ORIGINAL units (the ``scale`` divides out), NULL
    shape stats for degenerate (constant / singleton) groups.
    """
    xs = f"cast(round({value_col} * {scale}) as decimal(38, 0))"
    m = df.where(F.col(value_col).isNotNull()).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"sum({xs})").alias("__s1"),
        F.expr(f"sum({xs} * {xs})").alias("__s2"),
        F.expr(f"sum({xs} * {xs} * {xs})").alias("__s3"),
        F.expr(f"sum({xs} * {xs} * {xs} * {xs})").alias("__s4"),
    )
    # doubles derived from exact integers — fixed expression shape
    mean = f"(cast(__s1 as double) / cast(n as double))"
    m2 = f"(cast(__s2 as double) / cast(n as double) - {mean} * {mean})"
    m3 = (
        f"(cast(__s3 as double) / cast(n as double) "
        f"- 3.0 * {mean} * (cast(__s2 as double) / cast(n as double)) "
        f"+ 2.0 * {mean} * {mean} * {mean})"
    )
    m4 = (
        f"(cast(__s4 as double) / cast(n as double) "
        f"- 4.0 * {mean} * (cast(__s3 as double) / cast(n as double)) "
        f"+ 6.0 * {mean} * {mean} * (cast(__s2 as double) / cast(n as double)) "
        f"- 3.0 * {mean} * {mean} * {mean} * {mean})"
    )
    sc = float(scale)
    return m.select(
        *group_cols,
        "n",
        F.expr(f"round({mean} / {sc}, 6)").alias("mean"),
        F.expr(f"round({m2} / ({sc} * {sc}), 6)").alias("variance"),
        F.expr(
            f"CASE WHEN {m2} <= 0 THEN cast(NULL as double) "
            f"ELSE round({m3} / pow({m2}, 1.5), 6) END"
        ).alias("skewness"),
        F.expr(
            f"CASE WHEN {m2} <= 0 THEN cast(NULL as double) "
            f"ELSE round({m4} / ({m2} * {m2}) - 3.0, 6) END"
        ).alias("kurtosis_excess"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_expr: str,
    bins: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Score-calibration report (the reliability-diagram table): rank
    rows by ``(score, tiebreak)``, cut into ``bins`` equal-count
    buckets (ntile), and per bucket report size, mean score and the
    observed positive rate — the evidence that a score is (or is not)
    probability-calibrated, binned the way every quality-classifier
    threshold is tuned.

    Deterministic + hash-exact: the ntile ordering carries an explicit
    tiebreak, the mean score is an exact integer ratio over cents
    (``round(score·100)`` like every money column here), and the rate
    is ``positives·1e6 div n``. One window pass + one bounded
    aggregate; at 100 TB swap the exact ntile for the GK-sketch
    quantile bins (clean.quantile_bins) — the report shape is
    unchanged.

    Returns (bin, n_rows, mean_score_cents, positive_rate_micro)."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    tb = [F.col("__tb")] if tiebreak_col else []
    binned = df.select(
        F.expr(f"cast(round({score_col} * 100) as bigint)").alias("__cents"),
        F.expr(f"cast(({label_expr}) as int)").alias("__pos"),
        *([F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []),
    ).withColumn(
        "__bin", F.ntile(bins).over(Window.orderBy(F.col("__cents"), *tb))
    )
    return (
        binned.groupBy(F.col("__bin").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("sum(__cents) div count(1)").alias("mean_score_cents"),
            F.expr("sum(__pos) * 1000000 div count(1)").alias(
                "positive_rate_micro"
            ),
        )
        .orderBy("bin")
    )


def schema_drift_report(
    before: DataFrame, after: DataFrame, approx_distinct: bool = True
) -> DataFrame:
    """Column-level drift between two snapshots of "the same" table —
    the upstream-broke-the-contract detector that runs BEFORE
    :func:`population_stability`'s value-distribution check (a column
    that vanished or changed type fails louder and earlier than a PSI
    shift; the reference reads whatever lands and silently propagates
    shape changes, ``/root/reference/preprocess.py:22``).

    Per column, one row: status ∈ {added, removed, type_changed, kept},
    both type strings, and for columns present on a side its exact
    null fraction (ppm, integer — no float hashing issues) plus an
    approximate distinct count (HLL++ when ``approx_distinct``, exact
    otherwise — exact is a full shuffle per column, the approx sketch
    is one pass for all columns together).

    Cost shape: ONE aggregate pass per side computing every column's
    null counter + distinct sketch simultaneously (the expect() idiom
    — 2 scans total regardless of column count), output O(columns).
    """
    def side_stats(df: DataFrame) -> dict[str, tuple[str, int, int]]:
        cnt = F.count(F.lit(1))
        aggs: list[Column] = [cnt.alias("__n")]
        for f in df.schema.fields:
            aggs.append(
                F.sum(F.col(f.name).isNull().cast("long")).alias(f"__null_{f.name}")
            )
            d = (
                F.approx_count_distinct(f.name)
                if approx_distinct
                else F.countDistinct(f.name)
            )
            aggs.append(d.alias(f"__dist_{f.name}"))
        row = df.agg(*aggs).collect()[0]
        n = row["__n"]
        return {
            f.name: (
                f.dataType.simpleString(),
                int(row[f"__null_{f.name}"] * 1_000_000 // n) if n else 0,
                int(row[f"__dist_{f.name}"]),
            )
            for f in df.schema.fields
        }

    b, a = side_stats(before), side_stats(after)
    rows = []
    for name in sorted(set(b) | set(a)):
        in_b, in_a = name in b, name in a
        if in_b and in_a:
            status = "kept" if b[name][0] == a[name][0] else "type_changed"
        else:
            status = "removed" if in_b else "added"
        rows.append(
            (
                name,
                status,
                b[name][0] if in_b else None,
                a[name][0] if in_a else None,
                b[name][1] if in_b else None,
                a[name][1] if in_a else None,
                (a[name][1] - b[name][1]) if (in_b and in_a) else None,
                b[name][2] if in_b else None,
                a[name][2] if in_a else None,
            )
        )
    spark = before.sparkSession
    return spark.createDataFrame(
        rows,
        "column string, status string, before_type string, after_type string,"
        " before_null_ppm long, after_null_ppm long, null_ppm_delta long,"
        " before_distinct long, after_distinct long",
    ).orderBy("column")
