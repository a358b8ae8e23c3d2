"""Text analysis for training-data curation (BASELINE north-star;
the reference's language detection T2 at
``/root/reference/translate.py:57-76`` is LLM-backed and per-COLUMN — the
per-DOCUMENT operators here are its distributed, deterministic
generalization).

All operators are single-projection (no shuffle) built-in-function
pipelines — they run at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import tokens_col

# tiny per-language stopword marker sets (public knowledge); enough for a
# coarse n-gram/stopword language vote, mirroring T2's ENGLISH/NON-ENGLISH
# decision but per document and offline.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "with", "for"],
    "es": ["el", "la", "los", "las", "que", "de"],
    "de": ["der", "die", "das", "und", "nicht", "mit"],
    "fr": ["le", "les", "des", "une", "est", "dans"],
}

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_hits(text: Column, words: list[str]) -> Column:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))


def language_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of stopword-marker hit counts;
    'und' (undetermined) when no marker fires. Ties break by language
    code order via the greatest-struct trick (deterministic)."""
    scores = [
        F.struct(_marker_hits(F.col(text_col), ws).alias("hits"), F.lit(code).alias("code"))
        for code, ws in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    best = F.greatest(*scores)
    return df.withColumn(
        out_col, F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Quality features + composite score: length, word stats, punct /
    digit / stopword ratios. Mirrors standard corpus-filtering features
    (C4/Gopher-style rules, public)."""
    toks = tokens_col(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = F.size(toks)
    punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), F.lit(0)))
    digits = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[0-9]"), F.lit(0)))
    stop_hits = _marker_hits(F.col(text_col), LANG_MARKERS["en"])
    avg_word_len = F.round((n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1)), 6)
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    digit_ratio = F.round(digits / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6)
    score = F.round(
        F.when((n_words >= 5) & (n_words <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(digit_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.2)).otherwise(F.lit(0.0)),
        6,
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("avg_word_len", avg_word_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality", score)
    )


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    pre-tokenization (the standard LLM-cost estimator shape)."""
    return df.withColumn("ws_tokens", F.size(tokens_col(F.col(text_col)))).withColumn(
        "bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), F.lit(0))),
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Canonical document fingerprint: lowercase → tokenize → distinct →
    sort → md5 of the joined token set (the classic key-collision
    canonicalization). Identical token multisets-as-sets collide, so
    shuffled/duplicated-word docs fingerprint together."""
    toks = F.array_sort(F.array_distinct(tokens_col(F.col(text_col))))
    return df.withColumn(out_col, F.md5(F.array_join(toks, " ")))


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(doc, term) TF-IDF with smooth IDF
    ``ln((N+1)/(df+1)) + 1`` (sklearn's smoothing — never divides by
    zero, never goes negative).

    Two shuffles at corpus scale: the term-frequency aggregate on
    (doc, term) and the document-frequency aggregate on term; the
    doc count N is a scalar broadcast. Returns
    (id, term, tf, df, tfidf)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def _gopher_metric_cols(
    text: Column,
    toks: Column,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_word_ratio: float,
    min_alpha_word_frac: float,
    min_stop_hits: int,
) -> list[Column]:
    """The Gopher rule metrics as named columns over a PRE-MATERIALIZED
    token array (lambda-inlining rule: the caller must alias the token
    array in its own projection first). Shared by gopher_quality_flags
    and the fused curation_metrics."""
    n_words = F.size(toks)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / safe_n, 6
    )
    symbols = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), F.lit(0)))
    symbol_ratio = F.round(symbols / safe_n, 6)
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.round(alpha_words / safe_n, 6)
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]),
        )
    )
    keep = (
        n_words.between(min_words, max_words)
        & mean_wl.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio <= max_symbol_word_ratio)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    return [
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep_gopher"),
    ]


def _repetition_metric_cols(lines: Column) -> list[Column]:
    """Line-repetition metrics over a PRE-MATERIALIZED non-empty-line
    array. Shared by repetition_stats and curation_metrics."""
    n = F.size(lines)
    d = F.size(F.array_distinct(lines))
    return [
        n.alias("n_lines"),
        F.round((n - d) / F.greatest(n, F.lit(1)), 6).alias("dup_line_frac"),
    ]


def _toks_expr(text: Column) -> Column:
    return F.filter(tokens_col(text), lambda t: t != "")


def _lines_expr(text: Column) -> Column:
    return F.filter(F.transform(F.split(text, "\n"), F.trim), lambda l: l != "")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    max_words: int = 100000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document filter (Rae et al. 2021, public): per-doc
    rule metrics + the composite keep flag. Defaults are the paper's
    (word-count window relaxed for short synthetic docs).

    Rules rendered: word-count window; mean word length in [3, 10];
    symbol-to-word ratio (# and ellipsis) ≤ 0.1; ≥ 80% of words contain
    an alphabetic character; ≥ 2 distinct English stopword hits.

    Single projection, all codegen. The token array is materialized in
    its own projection FIRST (see doc_shingles: higher-order lambdas
    re-evaluate inlined outer expressions per element — inlining the
    regex split here would make the filter O(tokens²))."""
    toked = df.select(
        F.col(id_col),
        F.col(text_col),
        _toks_expr(F.col(text_col)).alias("__toks"),
    )
    return toked.select(
        F.col(id_col),
        *_gopher_metric_cols(
            F.col(text_col),
            F.col("__toks"),
            min_words,
            max_words,
            min_mean_word_len,
            max_mean_word_len,
            max_symbol_word_ratio,
            min_alpha_word_frac,
            min_stop_hits,
        ),
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy over the token distribution (nats):
    ``-sum(p ln p)`` where p = token frequency / doc length. Low entropy
    flags boilerplate/repetition (a standard curation signal alongside
    the Gopher rules); entropy 0 = a one-token or single-repeated-token
    doc.

    One shuffle on (doc, token) then one on doc — same shape as tf_idf's
    TF leg, scale-safe."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.log("c")).alias("__clogc"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(
                F.log("n_tokens") - F.col("__clogc") / F.col("n_tokens"), 6
            ).alias("entropy"),
        )
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher's repetition signals at line granularity: line count and
    duplicate-line fraction (1 - distinct/total over non-empty trimmed
    lines). High duplicate-line fraction flags boilerplate/templated
    docs. Single codegen projection (split → filter → array_distinct) —
    scan-speed; the array is materialized in its own projection first
    (lambda-inlining rule, see gopher_quality_flags)."""
    lined = df.select(
        F.col(id_col),
        _lines_expr(F.col(text_col)).alias("__lines"),
    )
    return lined.select(F.col(id_col), *_repetition_metric_cols(F.col("__lines")))


def curation_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    max_words: int = 100000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    include_entropy: bool = False,
) -> DataFrame:
    """Fused gopher_quality_flags + repetition_stats: ONE projection
    computing all Gopher rule metrics and line-repetition metrics.

    At corpus scale the separate operators each re-scan the input and
    the caller joins them back on the id — two extra shuffles for
    metrics that are all scan-speed projections. Fusing keeps the whole
    metric block inside a single whole-stage-codegen span with zero
    joins. Same column names and values as the two operators run
    individually.

    ``include_entropy`` folds :func:`token_entropy` into the same scan
    as in-row higher-order functions — removing the (doc, token)
    explode shuffle AND the join back on the id. The rendering is a
    SINGLE self-contained expression: fold over ``array_sort(toks)``
    carrying (prev token, run length, Σ c·ln c) and closing the last
    run in the finish lambda — O(n log n) per document with the sort
    appearing exactly once inside the aggregate.

    Why single-expression instead of staged ``withColumn``
    intermediates: Catalyst pushes downstream filters THROUGH
    projections by substituting the column's defining expression into
    the predicate, and collapses the projection stack — a rendering
    whose lambdas index into a separately-aliased sorted array
    re-evaluates the sort per element after inlining (measured 95 s vs
    0.16 s at sf0.1 for metrics + entropy filter; the no-filter plan
    was fine, which is why a projection-only benchmark missed it). A
    fold whose input appears once inlines at worst 2× (filter +
    project), never per-element. Guarded by
    tests/test_dedup_similarity_text.py::test_entropy_rendering_bench,
    which benchmarks WITH a pushed filter. Values match token_entropy
    exactly (the 6-dp round absorbs fold-order drift), except
    zero-token docs: here a row with NULL entropy, there no row (the
    explode drops them)."""
    prepped = df.select(
        F.col(id_col),
        F.col(text_col),
        _toks_expr(F.col(text_col)).alias("__toks"),
        _lines_expr(F.col(text_col)).alias("__lines"),
    )
    cols = [
        *_gopher_metric_cols(
            F.col(text_col),
            F.col("__toks"),
            min_words,
            max_words,
            min_mean_word_len,
            max_mean_word_len,
            max_symbol_word_ratio,
            min_alpha_word_frac,
            min_stop_hits,
        ),
        *_repetition_metric_cols(F.col("__lines")),
    ]
    if include_entropy:
        n = F.size(F.col("__toks"))

        def _clog(c):
            cd = c.cast("double")
            return F.when(c > 0, cd * F.log(cd)).otherwise(F.lit(0.0))

        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("acc"),
        )
        clogc = F.aggregate(
            F.array_sort(F.col("__toks")),
            init,
            lambda st, x: F.struct(
                x.alias("prev"),
                F.when(x == st["prev"], st["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.when(x == st["prev"], st["acc"])
                .otherwise(st["acc"] + _clog(st["run"]))
                .alias("acc"),
            ),
            lambda st: st["acc"] + _clog(st["run"]),
        )
        cols.append(n.cast("long").alias("n_tokens"))
        cols.append(
            F.when(
                n > 0,
                F.round(F.log(n.cast("double")) - clogc / n, 6),
            ).alias("entropy")
        )
    return prepped.select(F.col(id_col), *cols)


def ngram_repetition(
    df: DataFrame, id_col: str, text_col: str, ns: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """Gopher's n-gram repetition signals (Rae et al. 2021 Table A1,
    public): per document, the fraction of token n-grams that are
    duplicates (``1 - distinct/total``) for each n. High values flag
    templated/boilerplate text that line- and token-level signals miss
    (a doc can have unique lines yet loop the same 3-gram).

    Pure projection — n-gram arrays are built from the materialized
    token array with slice/transform (no explode, no shuffle), so this
    runs at scan speed like the other rule filters. Two-step projection
    per the lambda-inlining rule: tokens first, then the n-gram arrays,
    then the metrics."""
    toked = df.select(
        F.col(id_col), _toks_expr(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")

    def gram_at(n: int):
        # closure, NOT a default arg: pyspark inspects lambda arity and a
        # defaulted second parameter would be mistaken for the index slot
        return lambda i: F.array_join(F.slice(toks, i, n), " ")

    grams = toked.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        *[
            F.when(
                F.size(toks) >= n,
                F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1), gram_at(n)),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias(f"__g{n}")
            for n in ns
        ],
    )
    metric_cols = []
    for n in ns:
        g = F.col(f"__g{n}")
        metric_cols.append(
            F.round(
                (F.size(g) - F.size(F.array_distinct(g)))
                / F.greatest(F.size(g), F.lit(1)),
                6,
            ).alias(f"dup_{n}gram_frac")
        )
    return grams.select(F.col(id_col), F.col("n_words"), *metric_cols)


def corpus_profile(
    df: DataFrame, id_col: str, text_col: str, strata_col: str
) -> DataFrame:
    """Per-stratum corpus statistics — the profile a mixing/curation
    decision is made from: document count, total tokens, vocabulary
    size, mean and median document length.

    Two aggregates (doc-level and token-level, each one shuffle on the
    stratum key) joined on the stratum — the join is stratum-sized
    (languages/domains: tiny), so the plan is two scans + a broadcast
    join at any corpus size. Exact vocabulary via count(distinct):
    Spark plans it as a two-stage partial aggregate; swap in
    approx_count_distinct for a one-pass sketch when exactness isn't
    needed (see q_agg_approx for the verified-accuracy pattern)."""
    toks = df.select(
        F.col(strata_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    tok_agg = toks.groupBy(strata_col).agg(
        F.count("*").alias("total_tokens"),
        F.countDistinct("tok").alias("vocab"),
    )
    doc_agg = df.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.length(F.col(text_col))), 6).alias("mean_chars"),
        F.round(F.percentile(F.length(F.col(text_col)), 0.5), 6).alias("p50_chars"),
    )
    # LEFT join from the doc side: a stratum whose documents are all
    # empty has no token rows, but the profile must still show it
    # (n_docs > 0, zero tokens) — an inner join would hide it entirely
    return doc_agg.join(tok_agg, strata_col, "left").select(
        strata_col,
        "n_docs",
        "mean_chars",
        "p50_chars",
        F.coalesce("total_tokens", F.lit(0)).alias("total_tokens"),
        F.coalesce("vocab", F.lit(0)).alias("vocab"),
    )


# PII patterns kept to the regex subset with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d() -]{7,14}\d",
}


def redact_pii(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Training-corpus PII scrubbing: replace emails / IPv4 addresses /
    international-format phone numbers with ``<KIND>`` tags and count
    the hits per kind. Pure regexp_replace/regexp_extract_all chain —
    scan-speed, no Python; patterns are deliberately dialect-portable so
    the oracle replays them verbatim. Order matters: emails first (an
    email must not have its digits phone-matched), then IPs, then
    phones."""
    out_col = out_col or text_col
    red = F.col(text_col)
    for kind in ("email", "ipv4", "phone"):
        df = df.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(red, F.lit(PII_PATTERNS[kind]), F.lit(0))),
        )
        red = F.regexp_replace(red, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.withColumn(out_col, red)


def quantile_threshold_filter(
    df: DataFrame,
    metric_col: str,
    quantile: float,
    strata_col: str | None = None,
    keep: str = "above",
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep rows whose ``metric_col`` clears the per-stratum exact
    ``quantile`` threshold — the calibrated quality gate of a curation
    pipeline ("drop the worst 25% per source" instead of a hand-picked
    constant, so the gate self-adjusts as the corpus mix drifts).

    Thresholds come from one grouped aggregate over the strata
    (``F.percentile`` — exact, linearly interpolated, matching DuckDB's
    ``quantile_cont``), then join back broadcast: strata counts are
    dimension-sized (languages, sources) while the corpus never shuffles
    — the filter is a map-side broadcast-hash-join probe. Adds the
    ``threshold`` column (rounded to 6dp for stable cross-engine
    rendering).

    ``approx=True`` swaps the exact ``F.percentile`` (which funnels
    every metric value of a stratum through one aggregate row — a
    one-reducer wall when a stratum spans a whole 100 TB corpus) for
    the Greenwald-Khanna ``F.percentile_approx`` sketch: fixed
    ~O(accuracy) memory, mergeable map-side partials, rank error
    ≤ 1/accuracy. A calibrated gate does not care that the cut sits a
    few rank-ppm off the exact quantile — prefer it at scale.
    """
    if not 0.0 <= quantile <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {quantile}")
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    pct = (
        F.percentile_approx(F.col(metric_col), F.lit(quantile), F.lit(accuracy)).cast(
            "double"
        )
        if approx
        else F.percentile(F.col(metric_col), F.lit(quantile))
    )
    if strata_col is None:
        th = df.agg(F.round(pct, 6).alias("threshold"))
        joined = df.crossJoin(F.broadcast(th))
    else:
        th = df.groupBy(strata_col).agg(F.round(pct, 6).alias("threshold"))
        joined = df.join(F.broadcast(th), strata_col)
    cond = (
        F.col(metric_col) >= F.col("threshold")
        if keep == "above"
        else F.col(metric_col) <= F.col("threshold")
    )
    return joined.where(cond)


def normalize_text(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Scan-speed text normalization — the first kernel of every web
    curation pipeline: strip C0/C1 control characters (tab/newline
    included; they are whitespace and collapse in the next step),
    collapse whitespace runs to single spaces, trim. Pure
    regexp_replace chain, dialect-portable patterns (hex classes, no
    lookaround) so the oracle replays them verbatim. NFC/accent
    normalization is deliberately out: Spark has no JVM-side unicode
    normalizer, and a per-row Python UDF is the wrong trade at corpus
    scale — normalize at ingest or in an Arrow batch stage instead."""
    out_col = out_col or text_col
    c = F.col(text_col)
    c = F.regexp_replace(c, r"[\x00-\x08\x0B-\x1F\x7F]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return df.withColumn(out_col, F.trim(c))


# URL/domain curation (north-star: C4/RefinedWeb-style source filtering;
# the reference has no web-corpus surface at all).

_DOMAIN_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*://)?(?:[^/@]*@)?([^/:?#]+)"


def extract_domain(df: DataFrame, url_col: str, out_col: str = "domain") -> DataFrame:
    """Lower-cased host extracted from a URL-ish column — one
    regexp_extract, scan speed; scheme, userinfo, port, and path are
    stripped. Dialect-portable pattern (no lookaround) so the oracle
    replays it verbatim."""
    return df.withColumn(
        out_col, F.lower(F.regexp_extract(F.col(url_col), _DOMAIN_RE, 1))
    )


def _domain_suffixes(domain_col: Column) -> Column:
    """All dot-suffixes of a host: a.b.example.com ->
    [a.b.example.com, b.example.com, example.com, com] — so a blocklist
    entry blocks its whole subdomain tree, the standard curation
    semantics. Pure array functions, no explode needed on the literal
    path."""
    parts = F.split(domain_col, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(".", F.slice(parts, i + 1, n - i)),
    )


LITERAL_BLOCKLIST_BOUND = 1024


BROADCAST_HITS_BOUND = 2_000_000


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocklist,
    id_col: str = "doc_id",
    keep_blocked: bool = False,
    broadcast_hits_bound: int | None = BROADCAST_HITS_BOUND,
) -> DataFrame:
    """Drop (or keep) documents whose URL host matches a blocklist
    entry or lives under one (suffix match: blocking example.com also
    blocks a.b.example.com).

    Dual rendering, same pattern as the value-map operator:

    - ``blocklist`` as a small python list (≤ LITERAL_BLOCKLIST_BOUND):
      the check compiles to ``arrays_overlap(suffixes, literal_array)``
      — per-row codegen predicate, NO join and NO shuffle anywhere.
    - ``blocklist`` as a DataFrame with a ``domain`` column (the 100 TB
      path for big lists): suffixes explode into a broadcast SEMI join
      against the list, and the matched id set joins back into an ANTI
      join. The hit set is bounded by MATCHES, not by the corpus — so a
      blocklist that matches a large corpus fraction would broadcast a
      corpus-scale id set. Guard: the hit set is counted first (one
      cheap job over the exploded semi-join) and broadcast only when it
      has ≤ ``broadcast_hits_bound`` ids; above the bound the final
      join falls back to a plain shuffled semi/anti join (one corpus
      shuffle — the correct trade against an executor/driver OOM).
      Pass ``broadcast_hits_bound=None`` to skip the counting job and
      force the broadcast (caller asserts the hit set is small).

    Adds a ``domain`` column either way.
    """
    out = extract_domain(df, url_col, "domain")
    sfx = _domain_suffixes(F.col("domain"))
    if isinstance(blocklist, (list, tuple)):
        if len(blocklist) > LITERAL_BLOCKLIST_BOUND:
            raise ValueError(
                f"literal blocklist over {LITERAL_BLOCKLIST_BOUND} entries; "
                "pass it as a DataFrame instead"
            )
        lit_arr = F.array(*[F.lit(str(b).lower()) for b in blocklist])
        hit = F.arrays_overlap(sfx, lit_arr)
        return out.where(hit if keep_blocked else ~hit)
    bl = blocklist.select(F.lower(F.col("domain")).alias("__bl_domain")).distinct()
    hits = (
        out.select(id_col, F.explode(sfx).alias("__sfx"))
        .join(F.broadcast(bl), F.col("__sfx") == F.col("__bl_domain"), "left_semi")
        .select(id_col)
        .distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    if broadcast_hits_bound is not None:
        # localCheckpoint so the counting job's work feeds the join
        # instead of re-running the explode + semi-join
        hits = hits.localCheckpoint(eager=False)
        if hits.count() > broadcast_hits_bound:
            return out.join(hits, id_col, how)
    return out.join(F.broadcast(hits), id_col, how)


def boilerplate_unit_removal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df_frac: float = 0.5,
    delimiter: str = "\n",
) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet/RefinedWeb idiom):
    split every document into units (lines by default), compute each
    DISTINCT unit's document frequency across the corpus, drop units
    appearing in more than ``max_df_frac`` of documents (cookie
    banners, nav bars, license footers), and reassemble the documents
    in original unit order. With ``delimiter=' '`` the same machinery
    is corpus-adaptive stop-word removal.

    Scale shape: one explode + one (unit → doc-frequency) aggregate
    over the corpus, then a unit-keyed anti join and one per-document
    regroup — the blocked-unit relation is joined with a PLAIN anti
    join, never broadcast (a permissive threshold can block a large
    unit vocabulary; cf. the blocklist broadcast guard). Unit order is
    restored with an in-row sort of (pos, unit) structs, so reassembly
    adds no extra shuffle beyond the per-document regroup.

    Returns ``(id_col, text_clean, n_kept, n_removed)`` for EVERY input
    document (documents whose units are all blocked come back with
    ``text_clean = ''``). Units are trimmed; empty units never count.
    """
    if not (0.0 < max_df_frac <= 1.0):
        raise ValueError(f"max_df_frac must be in (0, 1], got {max_df_frac}")
    n_docs = df.count()
    units = (
        df.repartition(F.col(id_col))  # see doc_tokens: spread the explode
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), delimiter)).alias("pos", "unit"),
        )
        .withColumn("unit", F.trim(F.col("unit")))
        .where(F.col("unit") != "")
    )
    blocked = (
        units.groupBy("unit")
        .agg(F.count_distinct(F.col(id_col)).alias("dfc"))
        .where(F.col("dfc") > max_df_frac * n_docs)
        .select("unit")
    )
    tagged = units.join(blocked.withColumn("__blk", F.lit(1)), "unit", "left")
    agg = tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__blk").isNull(),
                            F.struct(F.col("pos"), F.col("unit")),
                        )
                    )
                ),
                lambda s: s["unit"],
            ),
            delimiter,
        ).alias("text_clean"),
        F.sum(F.when(F.col("__blk").isNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_kept"),
        F.sum(F.when(F.col("__blk").isNotNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_removed"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 of every document against a FIXED query-term list
    (Robertson et al.; the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))``
    non-negative IDF variant). The keyword-retrieval complement to the
    cosine ANN tier — hybrid pipelines fuse both (see
    ``similarity.rrf_fuse``).

    Scale shape — ZERO corpus-keyed shuffles: the query list is small
    by contract, so per-document term frequencies are in-row
    ``size(filter(toks, ...))`` expressions (no explode, no (doc,term)
    aggregate — compare ``tf_idf``, which pays two), and the corpus
    statistics (N, avgdl, per-term document frequency) reduce to ONE
    single-row aggregate broadcast back. The whole operator is
    scan-speed: projection → one scalar agg → projection.

    Returns ``(id_col, n_tokens, bm25)`` for every document; docs
    containing no query term score 0.0.
    """
    terms = [t.lower() for t in query_terms]
    if not terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError(f"bm25_scores: duplicate query terms in {terms}")
    toks = tokens_col(F.col(text_col))
    per_doc = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        # tf via size-difference (array_remove drops every occurrence);
        # a `lambda x, t=t:` filter would read as a TWO-arg lambda to
        # Spark, which binds the second param to the element index
        *[
            (F.size(toks) - F.size(F.array_remove(toks, t))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        # coalesce: empty corpus gives NULL avg; 1.0 keeps the ratio finite
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    # all-empty-docs corpus: avgdl aggregates to 0.0 -> guard the divide
    avgdl = F.greatest(F.col("avgdl"), F.lit(1e-9))
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}").cast("double")
        score = score + idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        )
    return scored.select(
        F.col(id_col),
        F.col("dl").alias("n_tokens"),
        F.round(score, 6).alias("bm25"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 hits with dense rank positions. Ties broken by id so
    the result (and the oracle replay) is deterministic; the global
    sort-limit compiles to TakeOrderedAndProject — per-partition heaps
    + a k-row driver merge, no full sort at 100 TB. Returns
    ``(id_col, bm25, rank)``."""
    scored = bm25_scores(df, id_col, text_col, query_terms, k1=k1, b=b).where(
        F.col("bm25") > 0.0
    )
    from pyspark.sql import Window

    ranked = scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        id_col, "bm25", "rank"
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ref_df: DataFrame | None = None,
    add_k: float = 0.5,
) -> DataFrame:
    """Bigram language-model perplexity per document (the CCNet idiom —
    Wenzek et al. 2020 score documents with a reference LM and filter
    or bucket on perplexity; here the LM is an add-k-smoothed bigram
    model trained relationally on ``ref_df``, defaulting to the scored
    corpus itself).

    ``P(w2|w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)`` with
    ``c(w1 ·)`` the context count (w1 occurrences as a non-final
    token) and ``V`` the reference unigram vocabulary size.

    Scale shape: bigram extraction is in-row (transform over the token
    array — the ``doc_shingles`` pattern, keeping duplicates); the LM
    is ONE (bigram → count) aggregate plus a (prev → context-count)
    re-aggregate of that same table; scoring is one join on the bigram
    hash (well-spread) with a prev-keyed fallback join ONLY for
    bigrams unseen in the reference (empty when ref_df is df itself —
    Catalyst prunes nothing, but the miss side carries zero rows). V
    is a scalar broadcast.

    Returns ``(id_col, n_bigrams, avg_nll, ppl)`` for every document;
    docs with < 2 tokens report NULL avg_nll/ppl.
    """
    ref = ref_df if ref_df is not None else df

    def bigram_relation(frame: DataFrame) -> DataFrame:
        toked = frame.repartition(F.col(id_col)).select(  # see doc_tokens
            F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
        )
        starts = F.when(
            F.size("__toks") >= 2, F.sequence(F.lit(1), F.size("__toks") - 1)
        ).otherwise(F.array().cast("array<int>"))
        return toked.select(
            F.col(id_col), F.explode(starts).alias("i"), F.col("__toks")
        ).select(
            F.col(id_col),
            F.element_at("__toks", F.col("i")).alias("prev"),
            F.element_at("__toks", F.col("i") + 1).alias("cur"),
        )

    ref_bigrams = bigram_relation(ref)
    big_counts = ref_bigrams.groupBy("prev", "cur").agg(F.count("*").alias("c12"))
    ctx_counts = big_counts.groupBy("prev").agg(F.sum("c12").alias("c1"))
    vocab = ref.select(
        F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).agg(F.count_distinct("tok").alias("v"))

    probs = big_counts.join(ctx_counts, "prev")
    doc_bigrams = bigram_relation(df)
    scored = (
        doc_bigrams.join(probs, ["prev", "cur"], "left")
        # unseen-bigram fallback: c12 := 0 with the prev context count
        # (itself 0 for unseen prev) — only miss rows pay this join
        .join(
            ctx_counts.select(F.col("prev"), F.col("c1").alias("c1_fb")),
            "prev",
            "left",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k))
                    / (
                        F.coalesce(F.col("c1"), F.col("c1_fb"), F.lit(0))
                        + F.lit(add_k) * F.col("v")
                    )
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.exp(F.avg("nll")), 6).alias("ppl"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("avg_nll"),
            F.col("ppl"),
        )
    )


def linear_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float],
    bias: float = 0.0,
    threshold: float = 0.5,
    mode: str = "auto",
    literal_bound: int = 256,
) -> DataFrame:
    """fastText-style linear document classifier (the DCLM/quality-
    classifier curation idiom): averaged unigram features →
    ``prob = sigmoid(bias + (1/n) · Σ_t w[token_t])`` summed over token
    OCCURRENCES, keep flag at ``threshold``. The model is the
    ``weights`` dict — trained offline, applied here at corpus scale.

    Two renderings (the ``map_values`` literal/broadcast precedent):
    - ``literal`` (vocab ≤ ``literal_bound``): the weight map compiles
      into an in-row ``aggregate`` over a map literal — ZERO shuffles,
      scan speed; the classifier rides along any projection.
    - ``broadcast``: explode → broadcast-hash-join the weight relation
      → per-doc aggregate — one doc-keyed shuffle, any vocab size.
    ``auto`` picks by vocab size. Both produce identical results.

    EXACT-ARITHMETIC SCORING (engine-portability): weights and bias
    must be integer multiples of ``1/weight_scale`` (default 1/1000 —
    guarded). Scores are computed entirely in scaled INTEGERS — the
    weight sum accumulates exactly (no fold-order float drift) and the
    6-dp rounding is an integer half-away-from-zero division — because
    a float rendering proved non-replayable across engines: with
    power-of-two token counts the true score lands exactly on a
    6th-decimal tie, where Spark (shortest-decimal-string HALF_UP) and
    DuckDB (float-multiply rounding) disagree on the SAME double.
    ``score`` is micro-units / 1e6, bit-identical on any engine.

    Returns ``(id_col, n_tokens, score, prob, keep_classifier)``.
    """
    if not weights:
        raise ValueError("linear_quality_classifier: weights must be non-empty")
    if mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"linear_quality_classifier: bad mode {mode!r}")
    if mode == "auto":
        mode = "literal" if len(weights) <= literal_bound else "broadcast"
    weight_scale = 1000
    scaled: dict[str, int] = {}
    for t, w in weights.items():
        wi = round(w * weight_scale)
        if abs(wi - w * weight_scale) > 1e-6:
            raise ValueError(
                f"linear_quality_classifier: weight {w!r} for {t!r} is not "
                f"a multiple of 1/{weight_scale}"
            )
        scaled[t] = int(wi)
    bias_i = round(bias * weight_scale)
    if abs(bias_i - bias * weight_scale) > 1e-6:
        raise ValueError(
            f"linear_quality_classifier: bias {bias!r} is not a multiple "
            f"of 1/{weight_scale}"
        )

    toked = df.select(  # materialize once; see doc_shingles lambda-inlining rule
        "*", tokens_col(F.col(text_col)).alias("__toks")
    )
    n = F.size("__toks")
    if mode == "literal":
        wmap = F.create_map(
            *[
                F.lit(x)
                for t, wi in sorted(scaled.items())
                for x in (t, wi)
            ]
        )
        wsum = F.aggregate(
            F.col("__toks"),
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.coalesce(F.element_at(wmap, t), F.lit(0)),
        )
        base = toked.select(
            F.col(id_col), n.alias("n_tokens"), wsum.alias("__ws")
        )
    else:
        wdf = df.sparkSession.createDataFrame(
            sorted(scaled.items()), "token string, w long"
        )
        # explode_OUTER: an empty document must still emit its row
        # (wsum 0), matching the literal rendering exactly
        tok_rel = toked.select(
            F.col(id_col), n.alias("n_tokens"), F.explode_outer("__toks").alias("token")
        )
        base = (
            tok_rel.join(F.broadcast(wdf), "token", "left")
            .groupBy(id_col, "n_tokens")
            .agg(F.sum(F.coalesce(F.col("w"), F.lit(0))).cast("long").alias("__ws"))
        )
    # score = bias + wsum/(scale·n) as ONE rational p/q, rounded to 6 dp
    # by integer half-away-from-zero division: micro = ±((2|p'|+q) div 2q)
    # with p' = p·10^6. |p'| ≤ (|bias_i| + tokens·max|w_i|)·10^6 — far
    # inside int64 for any real vocabulary.
    nz = F.greatest(F.col("n_tokens"), F.lit(1)).cast("long")
    base = (
        base.withColumn(
            "__p", (F.lit(int(bias_i)) * nz + F.col("__ws")) * F.lit(1_000_000)
        )
        .withColumn("__q", nz * F.lit(weight_scale))
        .withColumn(
            "__micro",
            F.when(
                F.col("__p") >= 0,
                F.expr("(2 * __p + __q) div (2 * __q)"),
            ).otherwise(-F.expr("(2 * -__p + __q) div (2 * __q)")),
        )
    )
    score = F.col("__micro") / F.lit(1_000_000.0)
    out = base.select(
        F.col(id_col),
        F.col("n_tokens"),
        score.alias("score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6).alias("prob"),
    )
    return out.withColumn("keep_classifier", F.col("prob") >= threshold)


def source_quality_filter(
    df: DataFrame,
    source_col: str,
    metric_col: str,
    min_avg: float,
    min_docs: int = 1,
    keep: bool = True,
) -> DataFrame:
    """Domain-level quality gate (the RefinedWeb/C4 idiom, public): a
    whole SOURCE (domain, crawl host, feed) is kept or dropped on its
    AGGREGATE quality, not document-by-document — boilerplate farms
    produce individually-plausible pages, but their per-domain average
    gives them away.

    Keeps (or, with ``keep=False``, drops) the rows of every source
    whose per-source ``avg(metric_col)`` is ≥ ``min_avg`` AND whose doc
    count is ≥ ``min_docs`` (singleton sources have meaningless means —
    the standard min-support guard). Adds ``src_avg_metric`` /
    ``src_docs`` so downstream mixture sampling can weight by source
    quality without re-aggregating.

    Scale shape: ONE corpus aggregate on the source key (domain-count
    rows out — millions at web scale, still broadcast-sized), then a
    BROADCAST join back; the corpus itself is never shuffled for the
    join. The aggregate is avg+count, so map-side partial aggregation
    keeps the shuffle domain-sized, and a skewed giant source is just
    one hot reduce key carrying two running scalars.
    """
    stats = df.groupBy(source_col).agg(
        F.round(F.avg(metric_col), 6).alias("src_avg_metric"),
        F.count("*").cast("int").alias("src_docs"),
    )
    passed = (F.col("src_avg_metric") >= min_avg) & (
        F.col("src_docs") >= min_docs
    )
    gate = stats.where(passed if keep else ~passed)
    return df.join(F.broadcast(gate), source_col)


def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 64,
) -> DataFrame:
    """Out-of-vocabulary rate against a corpus-derived top-``vocab_size``
    vocabulary — the standard tokenizer-fit / domain-shift probe: a
    document whose tokens mostly fall outside the corpus's own head
    vocabulary is boilerplate, another language, or binary junk.

    Vocabulary = the ``vocab_size`` most frequent whitespace tokens
    (ties broken token-asc, so the cut is deterministic and an oracle
    replays it). Per-doc ``oov_rate`` = token INSTANCES outside the
    vocabulary / total instances; token-less docs rate 0.

    Scale shape: two corpus shuffles — the (token → count) aggregate
    (map-side combined, vocabulary-spread keys) and the per-doc
    re-aggregate; the vocabulary itself is top-k via
    TakeOrderedAndProject (never a full sort) and joins back as a
    BROADCAST. Returns (id_col, n_tok, n_oov, oov_rate).
    """
    if vocab_size < 1:
        raise ValueError(f"oov_rate: vocab_size must be >= 1, got {vocab_size}")
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens_col(F.col(text_col))).alias("token")
    )
    vocab = (
        toks.where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("token").cast("int").alias("n_tok"),
            F.sum(
                F.when(
                    F.col("token").isNotNull() & F.col("__in_vocab").isNull(),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("n_oov"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        "n_tok",
        "n_oov",
        F.round(F.col("n_oov") / F.greatest(F.col("n_tok"), F.lit(1)), 6).alias(
            "oov_rate"
        ),
    )


def language_id_confidence(
    df: DataFrame, text_col: str, id_cols: list[str] | None = None
) -> DataFrame:
    """:func:`language_id` plus a CONFIDENCE margin: hit counts of the
    best and runner-up language markers and their difference — the
    router signal a curation pipeline gates on ("en with margin >= 3"
    is a very different claim from "en by one stopword"). Margin 0 =
    ambiguous; best_hits 0 = 'und'.

    In-row: the per-language hit structs are sorted descending (ties
    by code, matching language_id's greatest-struct rule) inside the
    row — no explode, no shuffle, scan speed."""
    structs = [
        F.struct(
            _marker_hits(F.col(text_col), ws).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, ws in sorted(LANG_MARKERS.items())
    ]
    arr = F.reverse(F.array_sort(F.array(*structs)))
    best, second = arr[0], arr[1]
    return (
        df.withColumn(
            "lang_pred",
            F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")),
        )
        .withColumn("best_hits", best["hits"])
        .withColumn("second_hits", second["hits"])
        .withColumn("lang_margin", best["hits"] - second["hits"])
    )


# tracking parameters stripped by canonicalize_url: the ubiquitous
# analytics/click identifiers that make one page crawl as many URLs
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"


def canonicalize_url(
    df: DataFrame, url_col: str, out_col: str = "canon_url"
) -> DataFrame:
    """URL canonicalization ahead of URL-level dedup (the cheap first
    rung of the dedup ladder — one page crawled as many URLs):
    lowercase the scheme and host, drop the fragment, strip default
    ports (:80 http / :443 https), and remove tracking query
    parameters (utm_*, gclid, fbclid, ref) while preserving the
    remaining parameter order. Path case, trailing slashes and
    parameter VALUES are deliberately untouched — those can change the
    resource. Pure regexp/array chain, scan speed, dialect-portable
    (no lookaround). Scheme-less rows (relative paths, plain text —
    anything without ``scheme://``) pass through UNCHANGED except the
    fragment strip: host-lowering and param-stripping only make sense
    once the string is known to be an absolute URL."""
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    hostport = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    newq = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(newq != "", F.concat(F.lit("?"), newq)).otherwise(F.lit("")),
    )
    return df.withColumn(out_col, F.when(scheme != "", canon).otherwise(u))


# --------------------------------------------------------------------------
# relational BPE tokenizer training (r8 verdict task #8)
# --------------------------------------------------------------------------

_BPE_SEP = "\x1f"  # unit separator: symbol-boundary marker, never in text


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 8,
) -> DataFrame:
    """Byte-pair-encoding merge learning as a FIXED-ROUND relational
    program — the one training-data-pipeline primitive the engine was
    missing: the tokenizer itself is trained BY the engine, on the
    corpus, with the same scale story as every other operator.

    The corpus compresses to its distinct-word frequency table first
    (the classic BPE trick: one corpus-sized shuffle, then every round
    is vocabulary-sized). Each word is encoded as a symbol string with
    every symbol wrapped in unit separators (``\\x1f a \\x1f \\x1f b
    \\x1f`` …), so applying a merge IS ``replace(enc, SEP·L·SEP·SEP·R·
    SEP → SEP·LR·SEP)`` — and because ``replace`` scans left-to-right
    over non-overlapping occurrences in BOTH Spark and DuckDB, the
    string rewrite implements exactly BPE's greedy merge order
    (``aaaa`` + merge ``(a,a)`` → ``aa aa``, not ``aa a a``).

    Per round: adjacent-pair counts (one vocabulary-sized aggregate,
    weighted by word frequency) → the max pair, deterministically
    (count desc, then lexical ``(left, right)`` — binary collation on
    both engines) via a top-1 heap → in-row rewrite of every word. N
    rounds = N aggregates; the DuckDB oracle unrolls them as chained
    MATERIALIZED CTEs (the PageRank precedent). The per-round frames
    are lazily checkpointed so the plan stays O(rounds) deep with zero
    driver actions.

    Returns one row per learned merge: ``(merge_round, pair_left,
    pair_right, merged, pair_count)``. Text containing the separator
    byte itself is out of contract (strip control chars upstream)."""
    if rounds < 1:
        raise ValueError(f"bpe_train: rounds must be >= 1, got {rounds}")
    s = _BPE_SEP
    words = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            F.expr(f"regexp_replace(__w, '(.)', '{s}$1{s}')").alias("__enc"),
            "__cnt",
        )
        .localCheckpoint(eager=False)
    )
    merges = []
    cur = words
    for rnd in range(1, rounds + 1):
        pairs = (
            cur.select(
                F.split(
                    F.expr(f"trim(BOTH '{s}' FROM __enc)"), f"{s}{s}"
                ).alias("__syms"),
                "__cnt",
            )
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(__syms, 1, size(__syms) - 1),"
                        " (x, i) -> struct(x AS l, element_at(__syms, i + 2) AS r))"
                    )
                ).alias("__p"),
                "__cnt",
            )
            .groupBy(F.col("__p.l").alias("pair_left"), F.col("__p.r").alias("pair_right"))
            .agg(F.sum("__cnt").cast("bigint").alias("pair_count"))
        )
        best = (
            pairs.orderBy(
                F.col("pair_count").desc(), F.col("pair_left"), F.col("pair_right")
            )
            .limit(1)
            .select(
                F.lit(rnd).cast("int").alias("merge_round"),
                "pair_left",
                "pair_right",
                F.concat(F.col("pair_left"), F.col("pair_right")).alias("merged"),
                "pair_count",
            )
            .localCheckpoint(eager=False)
        )
        merges.append(best)
        # scalar-payload broadcast crossJoin (two short strings), then
        # the greedy rewrite — one in-row pass over the vocabulary
        cur = (
            cur.crossJoin(F.broadcast(best.select("pair_left", "pair_right")))
            .select(
                F.expr(
                    f"replace(__enc, '{s}' || pair_left || '{s}{s}' || pair_right || '{s}',"
                    f" '{s}' || pair_left || pair_right || '{s}')"
                ).alias("__enc"),
                "__cnt",
            )
            .localCheckpoint(eager=False)
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def bpe_apply(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_merges: int = 64,
) -> DataFrame:
    """Tokenize a corpus with a TRAINED BPE merge table (the other half
    of :func:`bpe_train` — train once, tokenize everything): encode
    every word with the unit-separator symbol encoding and apply the
    merges in learned order as chained greedy ``replace`` passes (the
    same left-to-right non-overlapping semantics training used), then
    count symbols.

    The merge table is collected to the driver — it is merge-table-
    sized (one row per learned merge, bounded by ``max_merges``; the
    Bloom-filter / centroid-manifest precedent), never corpus-sized —
    and each merge becomes one in-row column rewrite over the corpus:
    N merges = N expression passes in ONE projection, no joins, no
    shuffles beyond the final per-doc aggregate.

    Returns per document: ``(id, n_words, n_chars, n_bpe_tokens)`` —
    exact integers (``n_bpe_tokens <= n_chars``; the gap is the
    compression the learned vocabulary buys on this corpus)."""
    rows = merges.orderBy("merge_round").collect()
    if len(rows) > max_merges:
        raise ValueError(
            f"bpe_apply: merge table has {len(rows)} rows > max_merges="
            f"{max_merges} — raise the bound explicitly for big vocabularies"
        )
    s = _BPE_SEP
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("__w")
    )
    enc = F.expr(f"regexp_replace(__w, '(.)', '{s}$1{s}')")
    for m in rows:
        enc = F.replace(
            enc,
            F.lit(f"{s}{m['pair_left']}{s}{s}{m['pair_right']}{s}"),
            F.lit(f"{s}{m['pair_left']}{m['pair_right']}{s}"),
        )
    per_word = (
        toks.withColumn("__enc", enc)
        .select(
            F.col(id_col),
            F.length("__w").alias("__chars"),
            F.size(
                F.split(F.expr(f"trim(BOTH '{s}' FROM __enc)"), f"{s}{s}")
            ).alias("__syms"),
        )
    )
    return (
        per_word.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__chars").cast("bigint").alias("n_chars"),
            F.sum("__syms").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Bigram COLLOCATIONS by pointwise mutual information — the
    phrase-discovery primitive (tokenizer vocab seeding, stopword-free
    keyphrase extraction): PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with
    p(a,b) over adjacent-token bigrams and p(·) over unigrams. High
    PMI = the pair co-occurs far above chance ("new york", not
    "of the").

    Bigrams are built IN-ROW (``transform`` over an index sequence —
    array ``element_at`` is O(1), unlike the map gotcha), so the corpus
    is scanned once for bigrams and once for unigrams; both aggregates
    are vocabulary-sized. The score is reported in integer micro-nats:
    the count ratio ``c_ab·N_uni²  / (N_big·c_a·c_b)`` is formed from
    exact integer counts cast to double in a FIXED expression shape,
    then ``floor(1e6·ln(ratio))`` — both engines evaluate the identical
    IEEE expression, and the (sub-1-ulp) libm ln difference can only
    flip the floor on an exact-integer boundary, which the ratio of
    coprime-ish counts never sits on.

    Returns ``(token_a, token_b, pair_count, pmi_micro)`` for pairs
    with ``pair_count >= min_count``.
    """
    from ai_etl_pipeline_spark.functions.portable import tokens_col

    toks = df.select(tokens_col(F.col(text_col)).alias("__toks")).where(
        F.size("__toks") >= 2
    ).localCheckpoint(eager=False)
    uni = (
        toks.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 1), "
                    "i -> struct(element_at(__toks, i) as a, "
                    "element_at(__toks, i + 1) as b))"
                )
            ).alias("__bg")
        )
        .select(F.col("__bg.a").alias("token_a"), F.col("__bg.b").alias("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    n_uni = uni.agg(F.sum("__c").cast("bigint").alias("__nu"))
    n_bi_src = toks.select(
        (F.size("__toks") - 1).cast("bigint").alias("__nb_row")
    ).agg(F.sum("__nb_row").alias("__nb"))
    scored = (
        bi.join(
            F.broadcast(uni.select(F.col("tok").alias("token_a"), F.col("__c").alias("__ca"))),
            "token_a",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("token_b"), F.col("__c").alias("__cb"))),
            "token_b",
        )
        # scalar counts only — the one-row crossJoin rule
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi_src))
    )
    return scored.select(
        "token_a",
        "token_b",
        "pair_count",
        F.expr(
            "cast(floor(1000000.0 * ln("
            "cast(pair_count as double) * cast(__nu as double) * cast(__nu as double) "
            "/ (cast(__nb as double) * cast(__ca as double) * cast(__cb as double))"
            ")) as bigint)"
        ).alias("pmi_micro"),
    )


def chi2_token_association(
    df: DataFrame,
    text_col: str,
    label_col: "Column | str",
    min_doc_freq: int = 10,
) -> DataFrame:
    """Chi-square token↔class association — the classic supervised
    feature-selection score (which tokens SEPARATE the positive class):
    for each token, the 2×2 contingency table of (document contains
    token) × (document label), scored ``χ² = N·(ad − bc)² / ((a+b)(c+d)
    (a+c)(b+d))`` in micro-units. The (ad−bc)² product overflows even
    decimal(38,0) past ~1e9 docs, so the EXACT integer counts are cast
    to double first and the ratio computed in floats — casting the
    same exact integer to double is IEEE-deterministic, so both
    engines agree bit-for-bit at any corpus size (the ``linreg_report``
    R² precedent), and the final ``floor(1e6·χ²)`` is stable away from
    exact-integer boundaries the count ratio never sits on.

    ``label_col`` is a boolean column or expression over ``df``; token
    presence is DOC-LEVEL (distinct tokens per doc — multiplicity is
    TF's job, not association's). Plan: one tokenize+distinct explode
    (corpus-sized, the unavoidable pass), then a vocabulary-sized
    aggregate joined to two scalar class counts. ``min_doc_freq``
    prunes the long tail (a token in 3 docs can't carry signal and
    bloats the report).

    Returns ``(token, n_pos_docs, n_neg_docs, chi2_micro)``.
    """
    from ai_etl_pipeline_spark.functions.portable import tokens_col

    lab = F.expr(label_col) if isinstance(label_col, str) else label_col
    docs = df.select(
        tokens_col(F.col(text_col)).alias("__toks"),
        lab.cast("boolean").alias("__pos"),
    ).localCheckpoint(eager=False)
    totals = docs.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).cast("bigint").alias("__np"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).cast("bigint").alias("__nn"),
    )
    tok_docs = docs.select(
        F.explode(F.array_distinct("__toks")).alias("token"), "__pos"
    )
    counts = tok_docs.groupBy("token").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).cast("bigint").alias("n_pos_docs"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).cast("bigint").alias("n_neg_docs"),
    ).where((F.col("n_pos_docs") + F.col("n_neg_docs")) >= min_doc_freq)
    # a = pos docs WITH token, b = neg WITH, c = pos WITHOUT, d = neg WITHOUT
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            "n_pos_docs",
            "n_neg_docs",
            F.expr(
                "cast(CASE WHEN __np = 0 OR __nn = 0 "
                "OR (__np + __nn - n_pos_docs - n_neg_docs) = 0 THEN NULL ELSE "
                "floor(1000000.0 * cast(__np + __nn as double) "
                "* (cast(n_pos_docs as double) * cast(__nn - n_neg_docs as double) "
                "   - cast(n_neg_docs as double) * cast(__np - n_pos_docs as double)) "
                "* (cast(n_pos_docs as double) * cast(__nn - n_neg_docs as double) "
                "   - cast(n_neg_docs as double) * cast(__np - n_pos_docs as double)) "
                "/ (cast(n_pos_docs + n_neg_docs as double) "
                "   * cast(__np + __nn - n_pos_docs - n_neg_docs as double) "
                "   * cast(__np as double) * cast(__nn as double))) "
                "END as bigint)"
            ).alias("chi2_micro"),
        )
    )


def token_frequency_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Log₂-bucketed token-frequency histogram — the Zipf X-ray of a
    corpus (real text shows the heavy head / long tail; synthetic or
    template-generated corpora show a flat histogram): one tokenize
    scan, one vocabulary-sized frequency aggregate, one bounded
    (≤ ~63-row) histogram. ``floor(log2(f))`` is exact at powers of
    two in IEEE, so the bucketing is engine-stable. Returns ``(bucket,
    n_tokens, min_freq, max_freq, total_occurrences)`` where bucket b
    covers frequencies in [2^b, 2^(b+1))."""
    from ai_etl_pipeline_spark.functions.portable import tokens_col

    freq = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    return (
        freq.select(
            F.expr("cast(floor(log2(cast(f as double))) as int)").alias("bucket"),
            "f",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.min("f").cast("bigint").alias("min_freq"),
            F.max("f").cast("bigint").alias("max_freq"),
            F.sum("f").cast("bigint").alias("total_occurrences"),
        )
    )


def readability_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document from
    three deterministic in-row counts — the classic readability gate a
    training-data quality mix adds next to the Gopher rules:

    - words      = whitespace-separated tokens,
    - sentences  = maximal ``[.!?]+`` runs (min 1 — a fragment is one
      sentence),
    - syllables  = ``[aeiouy]+`` vowel groups in the lowercased text
      (the standard cheap syllable proxy; min = words so no word
      counts zero).

    Scores are computed in doubles CAST FROM the exact integer counts
    with the same expression shape on both engines (the χ²/R²
    IEEE-determinism precedent):
    ``flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)``,
    ``fk_grade = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59``,
    both rounded to 4 dp. Pure scan shape: regexp counts per row, no
    shuffle, no UDF."""
    words = F.expr(
        f"size(split(trim({text_col}), '\\\\s+'))"
    )
    sentences = F.expr(
        f"greatest(regexp_count({text_col}, '[.!?]+'), 1)"
    )
    vowel_groups = F.expr(
        f"regexp_count(lower({text_col}), '[aeiouy]+')"
    )
    out = df.select(
        F.col(id_col),
        words.cast("bigint").alias("n_words"),
        sentences.cast("bigint").alias("n_sentences"),
        vowel_groups.cast("bigint").alias("__vg"),
    ).select(
        id_col,
        "n_words",
        "n_sentences",
        F.greatest(F.col("__vg"), F.col("n_words")).alias("n_syllables"),
    )
    wps = "(cast(n_words as double) / cast(n_sentences as double))"
    spw = "(cast(n_syllables as double) / cast(n_words as double))"
    return out.where(F.col("n_words") > 0).select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(f"round(206.835 - 1.015 * {wps} - 84.6 * {spw}, 4)").alias(
            "flesch"
        ),
        F.expr(f"round(0.39 * {wps} + 11.8 * {spw} - 15.59, 4)").alias(
            "fk_grade"
        ),
    )


def language_mix_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Code-switching / language-mix report per document — the corpus-
    hygiene signal next to :func:`language_id` (mixed-language docs
    hurt dedup, langid-gated filters AND tokenizer training): marker
    hits per language family (the same ``LANG_MARKERS`` expressions
    langid scores with), how many languages fire at all, the dominant
    language, and its share of all marker hits as an exact integer
    micro ratio. Pure scan shape — four regexp counts per row, no
    shuffle, no UDF.

    Returns (id, n_langs, total_hits, dominant_lang,
    dominant_share_micro); zero hits → ('und', NULL share)."""
    hits = {
        code: _marker_hits(F.col(text_col), ws).cast("bigint")
        for code, ws in sorted(LANG_MARKERS.items())
    }
    out = df.select(
        F.col(id_col),
        *[h.alias(f"__h_{c}") for c, h in hits.items()],
    )
    cols = [f"__h_{c}" for c in sorted(LANG_MARKERS)]
    total = " + ".join(cols)
    n_langs = " + ".join(f"(CASE WHEN {c} > 0 THEN 1 ELSE 0 END)" for c in cols)
    # argmax with deterministic tie-break by language code order —
    # the greatest-struct trick language_id uses: greatest compares
    # (hits, code) lexicographically, so equal hits prefer the
    # alphabetically LAST code (fr > es > en > de), matching the
    # langid oracle's CASE order
    best = F.greatest(
        *[
            F.struct(F.col(f"__h_{c}").alias("hits"), F.lit(c).alias("code"))
            for c in sorted(LANG_MARKERS, reverse=True)
        ]
    )
    out = out.withColumn("__bh", best["hits"]).withColumn("__bc", best["code"])
    return out.select(
        id_col,
        F.expr(f"cast({n_langs} as int)").alias("n_langs"),
        F.expr(f"cast({total} as bigint)").alias("total_hits"),
        F.when(F.col("__bh") > 0, F.col("__bc")).otherwise(F.lit("und")).alias(
            "dominant_lang"
        ),
        # integer div, never a truncated double (hit counts are exact)
        F.expr(
            f"CASE WHEN __bh > 0 THEN (__bh * cast(1000000 as bigint))"
            f" div ({total}) END"
        ).alias("dominant_share_micro"),
    )
