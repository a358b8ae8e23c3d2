"""Deterministic sampling for training-data pipelines (north-star
extension; the reference's only sampling is driver-side ``random.sample``
/ ``unique()[:n]`` prompt bounding — ``/root/reference/translate.py:64``,
``/root/reference/mapper.py:48``).

``rand()``-based sampling is not reproducible across runs, engines, or
partitionings. At corpus scale the standard trick is HASH sampling:
a row is in the p-sample iff ``md5(salt || id) mod M < p*M``. Properties
that matter at 100 TB:

- deterministic: the same row set every run, on every engine (the DuckDB
  oracle replays it exactly) — resumable pipelines, reproducible evals;
- consistent: a 10% sample is a superset of a 5% sample (same salt);
- distributed: pure per-row predicate — no shuffle, no state, pushes
  through any plan;
- stratified: per-stratum thresholds via a broadcast map lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import MINHASH_PRIME, cw_coefficients, md5_i64

_M = 1_000_000  # threshold resolution: fractions are exact to 1e-6


def _bucket(id_col: Column, salt: str) -> Column:
    """Stable per-row bucket in [0, 1e6): md5 of the salted id."""
    return md5_i64(F.concat(F.lit(f"{salt}|"), id_col.cast("string"))) % F.lit(_M)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic p-sample on a stable id. Same (salt, id) always
    lands in the same bucket, so samples are reproducible and nested
    (fraction 0.1 ⊇ fraction 0.05)."""
    return df.where(_bucket(F.col(id_col), salt) < F.lit(int(fraction * _M)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 5% of English): threshold = map[stratum] with a literal
    map — a codegen CASE, no join, no shuffle."""
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs.extend([F.lit(k), F.lit(int(v * _M))])
    thresh = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(int(default_fraction * _M)),
    )
    return df.where(_bucket(F.col(id_col), salt) < thresh)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixing with UP-sampling: weight 2.3 means
    every row of that stratum appears twice and a hash-chosen 30% of
    them a third time (so the expected multiplicity is exactly the
    weight, and the realized multiset is identical on every run and
    engine). Weights < 1 degrade to plain stratified down-sampling.
    This is the "epochs per domain" knob of a training mix rendered as
    one operator.

    Pure per-row compute: two literal-map lookups (codegen CASE), the
    hash predicate, and an explode over ``sequence(1, n_copies)`` —
    no shuffle, no join, no state. Output adds ``copy_no`` (1-based)
    so downstream shuffles can keep replicas distinct.

    Fractional parts are split driver-side into exact integer
    thresholds (floor + scaled remainder) — no floating-point ``w % 1``
    in the plan, so the oracle replays thresholds bit-for-bit."""
    base_pairs: list[Column] = []
    frac_pairs: list[Column] = []
    for k, w in weights.items():
        if w < 0:
            raise ValueError(f"mixture weight for {k!r} must be >= 0, got {w}")
        base_pairs.extend([F.lit(k), F.lit(int(w))])
        frac_pairs.extend([F.lit(k), F.lit(int(round((w - int(w)) * _M)))])
    base = F.coalesce(
        F.element_at(F.create_map(*base_pairs), F.col(strata_col)) if base_pairs else F.lit(None),
        F.lit(int(default_weight)),
    )
    frac = F.coalesce(
        F.element_at(F.create_map(*frac_pairs), F.col(strata_col)) if frac_pairs else F.lit(None),
        F.lit(int(round((default_weight - int(default_weight)) * _M))),
    )
    n_copies = (
        base + (_bucket(F.col(id_col), salt) < frac).cast("int")
    ).cast("int")
    return (
        df.withColumn("__copies", n_copies)
        .where(F.col("__copies") > 0)
        .withColumn("copy_no", F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies")
    )


def top_k_per_stratum(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    k: int,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic EXACTLY-k-per-stratum sample (the fixed-budget
    counterpart of fractional stratified sampling — eval-set carving,
    per-domain caps, debugging subsets).

    Rank rows inside each stratum by their salted hash bucket (ties
    broken by id, so the order is total) and keep rank <= k. One
    shuffle on the stratum key; the hash order makes the choice
    reproducible across runs/engines AND nested like hash_sample:
    k=100 is a superset of k=50 for the same salt. Strata with fewer
    than k rows keep everything.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k items:
    Efraimidis–Spirakis A-ES. Each row gets key = u^(1/w) with u ~
    U(0,1); the k largest keys are exactly a weight-proportional
    sample without replacement. Here u is the salted md5 bucket
    (``(bucket+1)/(M+1)`` ∈ (0,1)), so the "randomness" is a pure
    per-row hash: the same (salt, id) draws the same u on every run
    and every engine — the DuckDB oracle replays the whole sample.

    Scale shape: per-row compute + ``orderBy().limit(k)``, which
    compiles to TakeOrderedAndProject (per-partition heap + driver
    merge of k rows) — no global sort, no shuffle of the corpus.

    The key is rounded to 12 decimals (and ties broken by id) so the
    selection is stable across engines' libm rounding of pow(). Rows
    with weight <= 0 or NULL are never sampled (w→0 limit of A-ES).
    Output adds ``sample_key`` (the rounded A-ES key).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (_bucket(F.col(id_col), salt) + F.lit(1.0)) / F.lit(float(_M + 1))
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 12)
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def group_holdout_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: the hash bucket is computed on
    the GROUP key (near-dup cluster id, source domain, user id …), so
    every row of a group lands in the same split — the guard against
    train/eval contamination through near-duplicates that a row-level
    split cannot give. Adds a ``split`` column.

    Pure per-row predicate (one md5 + a codegen CASE over cumulative
    thresholds) — no shuffle, no join; deterministic and engine-portable
    like every sampler here. Fractions must sum to ~1 (every group gets
    a split).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    b = _bucket(F.col(group_col), salt)
    cum = 0.0
    expr = None
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        cond = b < F.lit(int(round(cum * _M)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    strata_col: str | None = None,
    order_by: Column | None = None,
) -> DataFrame:
    """Greedy token-budget selection: order candidates (best first),
    keep rows while the running token total stays within ``budget`` —
    the "fill the training mix to N tokens per domain" operator.
    ``order_by`` defaults to ``tokens_col`` descending; ties always
    break by id so the selection is total-ordered and reproducible.

    One window (running sum over the per-stratum order) + one filter.
    With ``strata_col`` the shuffle is per-stratum — the scale path:
    a 100 TB mix is budgeted per domain/language, never as one global
    ordered stream. The global variant (strata_col=None) is a single
    ordered partition and is documented for BOUNDED candidate sets
    (post-gate shortlists), not raw corpora.

    Keep rule: a row stays iff its cumulative total (including itself)
    is <= budget — oversized heads are skipped only when they alone
    exceed the budget.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    order = [
        (order_by if order_by is not None else F.col(tokens_col).desc()),
        F.col(id_col),
    ]
    w = (
        Window.partitionBy(strata_col) if strata_col else Window.partitionBy()
    ).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    running = F.sum(F.col(tokens_col).cast("bigint")).over(w)
    return (
        df.withColumn("running_tokens", running)
        .where(F.col("running_tokens") <= budget)
    )


def kfold_assign(
    df: DataFrame,
    group_col: str,
    k: int,
    salt: str = "kfold",
) -> DataFrame:
    """Leakage-safe k-fold cross-validation assignment: the fold is a
    deterministic hash of the GROUP key (near-dup cluster id, source
    domain, user id …), so every row of a group lands in the same
    fold — the CV twin of :func:`group_holdout_split`. Adds an int
    ``fold`` column in [0, k).

    Pure per-row predicate (one md5, one modulo) — no shuffle, no
    join, engine-portable like every sampler here; folds are stable
    across runs and across engines, so an experiment's fold membership
    is reproducible evidence, not a runtime accident.
    """
    if k < 2:
        raise ValueError(f"kfold_assign: k must be >= 2, got {k}")
    return df.withColumn(
        "fold", (_bucket(F.col(group_col), salt) % F.lit(k)).cast("int")
    )


def interleave_sources(
    df: DataFrame,
    source_col: str,
    id_col: str,
    out_col: str = "train_order",
) -> DataFrame:
    """Deterministic round-robin interleave of sources into one global
    training order: position = per-source rank × n_sources +
    source_index — so consecutive positions rotate through the sources
    (until a source exhausts) and a training run never sees a long
    single-source run, without ANY global sort or single-reducer
    window. The closed form leaves gaps once short sources run out;
    training readers order by the column, so gaps are harmless and the
    order is total (rank and index are both deterministic).

    Cost: one per-source window (rank by id — shuffle partitioned BY
    SOURCE, the bounded-stratum shape) + one broadcast join against
    the sorted source dimension. The alternative — row_number over a
    global ORDER BY — funnels the corpus through one reducer and is
    exactly what this operator exists to avoid.
    """
    from pyspark.sql import Window

    sources = (
        df.select(F.col(source_col)).distinct().orderBy(source_col)
        .withColumn("__src_idx", F.row_number().over(
            Window.partitionBy().orderBy(source_col)) - 1)
        .withColumn("__n_src", F.count("*").over(Window.partitionBy()))
    )
    w = Window.partitionBy(source_col).orderBy(id_col)
    ranked = df.withColumn("__rn", F.row_number().over(w) - 1)
    return (
        ranked.join(F.broadcast(sources), source_col)
        .withColumn(
            out_col,
            (F.col("__rn").cast("bigint") * F.col("__n_src") + F.col("__src_idx")),
        )
        .drop("__rn", "__src_idx", "__n_src")
    )


def hash_ring_negatives(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    strata_col: str | None = None,
    salt: str = "negring",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: rows
    are placed on a hash ring (ordered by the salted md5 of their id —
    i.e. a reproducible random permutation), and each anchor takes the
    next ``k`` ring positions (wrap-around) as negatives. Hash order ≈
    uniform random, so negatives are unbiased draws, yet the pairing
    is a pure function of (corpus, salt) — re-runs, engines and
    training workers all agree without coordination or an RNG state.

    With ``strata_col`` the ring is built per stratum (negatives drawn
    from the SAME language/domain — the "hard-ish negatives" default)
    and every window/join is stratum-partitioned — the scale path. The
    global variant is a single ordered partition; use it only on
    bounded candidate sets (same contract as token_budget_sample).

    Returns (anchor, negative, <strata>, ring_offset), self-pairs
    dropped and duplicates deduped (both only occur when a stratum has
    ≤ k rows).
    """
    if k < 1:
        raise ValueError(f"hash_ring_negatives: k must be >= 1, got {k}")
    from pyspark.sql import Window

    h = md5_i64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    part = Window.partitionBy(strata_col) if strata_col else Window.partitionBy()
    w = part.orderBy(h.asc(), F.col(id_col).asc())
    ring = (
        df.select(
            F.col(id_col),
            *([F.col(strata_col)] if strata_col else []),
        )
        .withColumn("__pos", F.row_number().over(w) - 1)
        .withColumn("__n", F.count("*").over(part))
    )
    probes = ring.select(
        F.col(id_col).alias("anchor"),
        *([F.col(strata_col)] if strata_col else []),
        F.col("__n"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("ring_offset"),
        F.col("__pos"),
    ).withColumn("__want", F.pmod(F.col("__pos") + F.col("ring_offset"), F.col("__n")))
    targets = ring.select(
        F.col(id_col).alias("negative"),
        *([F.col(strata_col).alias("__ts")] if strata_col else []),
        F.col("__pos").alias("__tpos"),
    )
    on = [probes["__want"] == targets["__tpos"]]
    if strata_col:
        on.append(probes[strata_col] == targets["__ts"])
    return (
        probes.join(targets, on[0] if len(on) == 1 else (on[0] & on[1]))
        .where(F.col("anchor") != F.col("negative"))
        .groupBy("anchor", "negative", *([strata_col] if strata_col else []))
        .agg(F.min("ring_offset").alias("ring_offset"))
    )


# cumulative Poisson(1) CDF thresholds scaled to the 1e6 bucket space:
# weight w is the smallest k with bucket < cdf[k]*1e6 (capped at 6 —
# P(X > 6) ~ 1e-4, and capping keeps replicate sizes bounded)
_POISSON1_CDF_1E6 = (367879, 735758, 919698, 981011, 996340, 999406)


def poisson_bootstrap(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_boot: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Distributed bootstrap via deterministic Poisson(1) resampling —
    THE scalable bootstrap: a true resample-with-replacement needs
    global coordination, but for large n the multinomial replicate
    counts converge to independent Poisson(1) weights, which are a pure
    per-(row, replicate) expression. Each row pays ONE md5 kernel
    (``h = md5(salt|id) mod p``); replicate ``j``'s uniform is the
    Carter-Wegman affine map ``(a_j*h + b_j) mod p mod 1e6`` — the
    MinHash idiom (:func:`~...functions.portable.cw_coefficients`,
    prefix = ``salt``), pairwise independent per replicate — and the
    weight is the Poisson(1) inverse-CDF over that uniform (capped at
    6). No RNG state, same replicates on every engine/partitioning
    (the DuckDB oracle replays them exactly).

    All ``n_boot`` replicates aggregate IN-ROW as ``2*n_boot`` sum
    expressions in one map-side-combined pass — the corpus is never
    exploded and never shuffled; the exchange carries one 2*n_boot-long
    partial per partition, then one bounded posexplode emits the
    replicate rows. (The r8 version exploded 16× and paid 16 md5
    kernels per row — 21.6 s at sf0.1; this shape is the r9 fix.)

    Values are aggregated in integer CENTS (``round(value*100)``) so
    each replicate mean is a ratio of exact integers — double
    accumulation order never reaches the result. Returns one row per
    replicate: ``(boot_id, n_eff, mean_value)`` with ``n_eff`` the
    total weight and ``mean_value`` rounded to 4dp. Bootstrap CI =
    quantiles of ``mean_value`` over replicates."""
    if n_boot < 1:
        raise ValueError(f"poisson_bootstrap: n_boot must be >= 1, got {n_boot}")
    p = MINHASH_PRIME
    base = df.select(
        (
            md5_i64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
            % F.lit(p)
        ).alias("__h"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("__cents"),
    )
    aggs = []
    for j, (a, b) in enumerate(cw_coefficients(salt, n_boot)):
        bucket = (F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(p) % F.lit(_M)
        w = F.lit(len(_POISSON1_CDF_1E6))
        for k in range(len(_POISSON1_CDF_1E6) - 1, -1, -1):
            w = F.when(bucket < _POISSON1_CDF_1E6[k], F.lit(k)).otherwise(w)
        w = w.cast("bigint")
        aggs.append(F.sum(w).alias(f"__n{j}"))
        aggs.append(F.sum(w * F.col("__cents")).alias(f"__s{j}"))
    one = base.agg(*aggs)
    zipped = F.arrays_zip(
        F.array(*[F.col(f"__n{j}") for j in range(n_boot)]).alias("n"),
        F.array(*[F.col(f"__s{j}") for j in range(n_boot)]).alias("s"),
    )
    return (
        one.select(F.posexplode(zipped).alias("boot_id", "r"))
        .where(F.coalesce(F.col("r.n"), F.lit(0)) > 0)
        .select(
            F.col("boot_id").cast("int").alias("boot_id"),
            F.col("r.n").alias("n_eff"),
            F.round((F.col("r.s") / F.col("r.n")) / 100.0, 4).alias("mean_value"),
        )
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    temperature: float = 2.0,
    target_rows: int | None = None,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual/
    multi-source rebalancing rule every large pretraining recipe uses
    (sample group i with probability ∝ n_i^(1/τ)): τ=1 keeps natural
    proportions, τ→∞ approaches uniform-over-groups, τ=2 (the common
    choice, and the default) is the square-root rule. Unlike
    :func:`mixture_sample` the per-group rates are DERIVED FROM THE
    DATA (one bounded groupBy-count aggregate), not passed in.

    Exactness across engines: after ONE ``sqrt`` per group — IEEE-754
    requires sqrt to be correctly rounded, so Spark and DuckDB agree
    bit-for-bit, which a general ``pow`` does NOT guarantee — every
    derived quantity is integer micro-unit arithmetic
    (``w_i = round(sqrt(n_i)·1e6)``, ``rate_i = w_i·N·1e6 div
    (Σw·n_i)``), so the realized multiset is hash-gateable. For
    τ ≠ 2 the operator falls back to float ``pow`` (documented
    cross-engine tolerance, not exactness). Expected output size is
    ``target_rows`` (default: the input row count — pure rebalance).

    Plan shape: one bounded count aggregate → broadcast rate join →
    per-row hash predicate + guarded ``sequence`` explode (no corpus
    shuffle). Output adds ``copy_no``; rows from over-sampled groups
    repeat, under-sampled groups hash-thin."""
    if temperature <= 0:
        raise ValueError(
            f"temperature_mixture: temperature must be > 0, got {temperature}"
        )
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    if temperature == 2.0:
        wcol = F.sqrt(F.col("__n"))
    else:
        wcol = F.pow(F.col("__n"), F.lit(1.0 / temperature))
    weights = counts.withColumn(
        "__w", F.round(wcol * _M).cast("bigint")
    )
    totals = weights.agg(
        F.sum("__w").cast("bigint").alias("__tw"),
        F.sum("__n").cast("bigint").alias("__tn"),
    )
    n_target = (
        F.lit(int(target_rows)).cast("bigint")
        if target_rows is not None
        else F.col("__tn")
    )
    rates = (
        weights.crossJoin(F.broadcast(totals))
        .select(
            F.col(group_col),
            (F.col("__w") * n_target * F.lit(_M)).alias("__num"),
            (F.col("__tw") * F.col("__n")).alias("__den"),
        )
        .select(
            F.col(group_col),
            F.expr("__num div __den").alias("__rate_micro"),
        )
    )
    joined = df.join(F.broadcast(rates), group_col)
    base = F.expr(f"__rate_micro div {_M}").cast("int")
    frac = (F.col("__rate_micro") % F.lit(_M)).cast("bigint")
    n_copies = (base + (_bucket(F.col(id_col), salt) < frac).cast("int")).cast(
        "int"
    )
    return (
        joined.withColumn("__copies", n_copies)
        .where(F.col("__copies") > 0)
        .withColumn("copy_no", F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies", "__rate_micro")
    )
