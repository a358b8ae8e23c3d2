"""Second-moment statistics over embedding columns: gramian /
covariance, PCA, and a ridge linear probe — the sufficient-statistics
family of embedding ops (the reference has no embedding surface at
all; cited for scope only: ``/root/reference/preprocess.py`` stops at
tabular cleaning).

Why this shape for 100 TB: every op here reduces the corpus to a
d x d (or d x n_classes) SUFFICIENT STATISTIC before any driver-side
math. The corpus is touched exactly once by a map-only Arrow pass
computing per-batch partials (numpy ``X.T @ X`` — BLAS, not per-row
Python), the shuffle carries only ``#partitions x d(d+1)/2`` rows,
and the driver solves a 64x64 system. Nothing driver-side ever scales
with n — the same split scikit-learn's out-of-core estimators and
Spark MLlib's ``RowMatrix.computeGramianMatrix`` use (public
patterns; implemented fresh on mapInPandas).

PCA eigensolves and probe weight solves run on the collected d x d
matrix with numpy (bounded: d <= a few thousand); eigenvector SIGN is
normalized (largest-|entry| coordinate positive) so results are
deterministic across LAPACK builds — the reason these ops are
pytest-verified against replayed numpy rather than a SQL oracle
(eigendecomposition is not SQL-expressible; the GRAMIAN itself is,
and gets the hash gate when rotated into the registry window).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _np():
    import numpy as np

    return np


def _valid_rows(col, dim: int):
    """(positions, [n_valid x dim] float64 matrix) of the vectors in a
    pandas column that are non-NULL, exactly ``dim`` long, and finite in
    EVERY element after float64 conversion (``None`` elements become NaN
    under numpy conversion and are rejected; so are NaN/inf payloads and
    ragged nested values that fail conversion outright).

    Every accumulator AND every scoring pass in this module routes
    through this one gate, so train-time and score-time row tolerance
    cannot diverge: a row the statistics skipped is a row the scorer
    NULLs/drops, never one that crashes the Arrow worker or silently
    poisons an accumulator with NaN.

    Fast path: when every value stacks into one rectangular float
    matrix (the overwhelmingly common clean-batch case — Arrow hands
    uniform ndarrays), validity is ONE vectorized isfinite mask instead
    of a per-row Python loop (~10× on wide batches; the loop remains as
    the fallback for batches holding NULLs/raggedness/objects)."""
    np = _np()
    try:
        mat = np.stack(col.to_numpy() if hasattr(col, "to_numpy") else list(col))
        if (
            mat.ndim == 2
            and mat.shape[1] == dim
            and mat.dtype.kind in "fi"
        ):
            mat = mat.astype("float64", copy=False)
            ok = np.isfinite(mat).all(axis=1)
            if ok.all():
                return list(range(len(mat))), mat
            idx_arr = np.flatnonzero(ok)
            return idx_arr.tolist(), mat[idx_arr]
    except (TypeError, ValueError):
        pass  # NULLs / ragged rows / non-numeric cells: row-wise below
    idx: list[int] = []
    rows: list = []
    for p, v in enumerate(col):
        if v is None or len(v) != dim:
            continue
        try:
            x = np.asarray(v, dtype="float64")
        except (TypeError, ValueError):
            continue
        if x.ndim != 1 or not np.isfinite(x).all():
            continue
        idx.append(p)
        rows.append(x)
    mat = np.vstack(rows) if rows else np.zeros((0, dim), dtype="float64")
    return idx, mat


def _schema_with(df: DataFrame, out_col: str, dtype) -> StructType:
    """Output schema = input schema + one appended nullable field —
    built structurally (``StructType`` over the original ``StructField``
    objects), never via ``simpleString`` surgery, which drops
    nullability/metadata and breaks on field names needing quoting."""
    return StructType(
        list(df.schema.fields) + [StructField(out_col, dtype, True)]
    )


# ---------------------------------------------------------------- gramian


def gramian_matrix(
    df: DataFrame, vec_col: str, dim: int, upper_only: bool = True
) -> DataFrame:
    """X^T X over an ``array<float/double>`` column as a relational
    (i, j, value, n_rows) matrix — one map-only Arrow pass computing
    per-batch BLAS partials, then a (i, j)-keyed sum whose volume is
    ``#partitions * d(d+1)/2`` rows, independent of corpus size.

    ``upper_only`` emits i <= j (the matrix is symmetric); rows with a
    wrong-length / NULL / NaN-element vector are counted out loudly via
    ``n_rows`` (they are skipped by :func:`_valid_rows`, and n_rows
    reports only the rows folded in, so a mismatch against count() is
    visible, never silent — and a single NULL element can no longer
    poison the whole accumulator with NaN)."""
    if dim < 1:
        raise ValueError(f"gramian_matrix: dim must be >= 1, got {dim}")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        np = _np()
        acc = np.zeros((dim, dim), dtype="float64")
        n = 0
        for pdf in batches:
            _, x = _valid_rows(pdf[vec_col], dim)
            if not len(x):
                continue
            acc += x.T @ x
            n += len(x)
        iu = _np().triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": iu[0].astype("int32"),
                "j": iu[1].astype("int32"),
                "value": acc[iu],
                "n_rows": n,
            }
        )

    part = df.select(vec_col).mapInPandas(
        partials, schema="i int, j int, value double, n_rows long"
    )
    out = part.groupBy("i", "j").agg(
        F.sum("value").alias("value"),
        # every partition emits the full index set with one shared n,
        # so summing n_rows per cell would count each partition d(d+1)/2
        # times; carry the true total on the (0,0) cell's co-grouped sum
        F.sum(F.when((F.col("i") == 0) & (F.col("j") == 0), F.col("n_rows"))).alias(
            "__n00"
        ),
    )
    # spread (0,0)'s total to every cell with a global window over the
    # d(d+1)/2 aggregated rows — NOT a second corpus pass (a self-join /
    # crossJoin on a filtered copy would re-run the Arrow scan unless
    # AQE happens to reuse the exchange; the window is guaranteed one
    # pass and the windowed frame is index-sized, never corpus-sized)
    from pyspark.sql.window import Window

    res = out.select(
        "i",
        "j",
        "value",
        F.max("__n00").over(Window.partitionBy(F.lit(1))).alias("n_rows"),
    )
    if not upper_only:
        res = res.unionByName(
            res.where(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "value", "n_rows"
            )
        )
    return res


def mean_vector(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-dimension mean as (i, mean) rows — one aggregate over the
    in-row element access (no explode: d aggregate expressions over
    the array column, d bounded).

    Row validity matches :func:`_valid_rows` exactly (dim-length AND
    every element finite — NaN sorts above every double in Spark and
    ±inf outside the double range, so one BETWEEN catches NULL/NaN/inf),
    so this mean and the gramian fold the SAME row set — the two
    statistics can be combined into a covariance without a row-set
    mismatch."""
    finite = F.forall(
        F.col(vec_col),
        lambda e: e.cast("double").between(-1.7976931348623157e308,
                                           1.7976931348623157e308),
    )
    aggs = [
        F.avg(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"m{i}")
        for i in range(dim)
    ]
    row = df.where((F.size(vec_col) == dim) & finite).agg(*aggs)
    cols = F.array(*[F.col(f"m{i}") for i in range(dim)])
    return row.select(
        F.posexplode(cols).alias("i", "mean")
    )


def covariance_from_gramian(
    gram_rows: list, mean: list[float], n: int, dim: int
):
    """Driver-side d x d covariance from the collected gramian upper
    triangle + mean vector: ``C = G/n - m m^T`` (population). Bounded:
    input is d(d+1)/2 rows, never corpus-sized."""
    np = _np()
    g = np.zeros((dim, dim))
    for r in gram_rows:
        g[r["i"], r["j"]] = r["value"]
        g[r["j"], r["i"]] = r["value"]
    m = np.asarray(mean, dtype="float64")
    return g / n - np.outer(m, m)


# ------------------------------------------------------------------- pca


def pca_components_local(cov, k: int):
    """Top-k eigenvectors of a driver-side covariance matrix with a
    deterministic sign convention (the coordinate with the largest
    |value| is made positive — eigensolvers are sign-ambiguous and
    LAPACK builds disagree). Returns (components [k x d], explained
    variance ratios [k]), eigenvalues descending."""
    np = _np()
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for r in range(comps.shape[0]):
        pivot = int(np.argmax(np.abs(comps[r])))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    total = float(vals.sum())
    ratios = [float(vals[i]) / total if total else 0.0 for i in order]
    return comps, ratios


def pca_project(
    df: DataFrame, vec_col: str, components, out_col: str = "pca"
) -> DataFrame:
    """Project embeddings onto driver-computed components — map-only
    Arrow pass, BLAS matmul per batch; the k x d component matrix
    rides the closure (bounded), never a join. Rows whose vector fails
    :func:`_valid_rows` (NULL / wrong length / NaN element) get a NULL
    projection — same tolerance as the statistics that trained the
    components, so a corpus that trained fine also scores fine."""
    np = _np()
    comp = np.asarray(components, dtype="float64")
    k, dim = comp.shape
    fields = [f.name for f in df.schema.fields]
    if out_col in fields:
        raise ValueError(f"pca_project: column {out_col!r} already exists")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, x = _valid_rows(pdf[vec_col], dim)
            proj: list = [None] * len(pdf)
            if len(x):
                for p, row in zip(idx, x @ comp.T):
                    proj[p] = row.tolist()
            out = pdf.copy()
            out[out_col] = proj
            yield out

    return df.mapInPandas(
        run, schema=_schema_with(df, out_col, ArrayType(DoubleType()))
    )


# ----------------------------------------------------------- linear probe


def _second_moments(df: DataFrame, vec_col: str, dim: int):
    """Driver-collected (G = X^T X, s = column sums, n) from ONE
    map-only Arrow pass — the fused statistics kernel behind
    :func:`mahalanobis_scores` and :func:`whitening_transform` (a
    separate :func:`mean_vector` aggregate would re-scan the corpus;
    at 2M x 64 doubles that second pass is ~1 GB of parquet re-read
    per op, measured). Partials are (kind, i, j, value) rows: kind 0 =
    gramian upper triangle, kind 1 = per-dim sums, kind 2 = row count;
    the shuffle is #partitions x (d(d+1)/2 + d + 1) rows."""
    np = _np()

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            _, x = _valid_rows(pdf[vec_col], dim)
            if not len(x):
                continue
            acc += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        iu = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "kind": [0] * len(iu[0]) + [1] * dim + [2],
                "i": list(iu[0]) + list(range(dim)) + [0],
                "j": list(iu[1]) + [0] * dim + [0],
                "value": list(acc[iu]) + list(s) + [float(n)],
            }
        )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="kind int, i int, j int, value double")
        .groupBy("kind", "i", "j")
        .agg(F.sum("value").alias("value"))
        .collect()
    )
    g = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0
    for r in rows:
        if r["kind"] == 0:
            g[r["i"], r["j"]] = r["value"]
            g[r["j"], r["i"]] = r["value"]
        elif r["kind"] == 1:
            s[r["i"]] = r["value"]
        else:
            n = int(r["value"])
    return g, s, n


def second_moments(df: DataFrame, vec_col: str, dim: int):
    """PUBLIC fused second-moment kernel (r17, r16 ADVICE #1): one
    map-only Arrow pass returning ``(G = XᵀX, s = column sums, n)``
    for the valid rows of ``vec_col`` — the single-scan statistic
    behind PCA / covariance / whitening (mean = s/n,
    cov = G/n − (s/n)(s/n)ᵀ). Raises ``ValueError`` when no valid rows
    survive: an empty or all-invalid corpus must fail loudly here, not
    surface later as a silent NaN covariance."""
    g, s, n = _second_moments(df, vec_col, dim)
    if n == 0:
        raise ValueError(
            f"second_moments: no valid {dim}-dim rows in {vec_col!r} — "
            "cannot form moments over an empty corpus"
        )
    return g, s, n


def linear_probe_train(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int,
    l2: float = 1.0,
):
    """Ridge one-vs-rest linear probe over an embedding column — the
    standard 'linear probe' quality-classifier recipe (train a linear
    head on frozen embeddings; e.g. FineWeb-Edu's scorer is exactly
    this shape, public). Closed form via sufficient statistics:

        W = (X^T X + l2 * I)^-1  X^T Y

    X^T X, X^T Y AND the class set all come out of ONE fused map-only
    Arrow pass (classes are discovered per batch and keyed by VALUE in
    the partials, so no upfront distinct-labels corpus shuffle; a
    naive 3-pass train — distinct, gramian, xty — re-reads the corpus
    twice more, ~2x wall at 2M x 64, measured). All collections are
    bounded (d x d + d x n_classes rows per partition), the solve is
    driver-side numpy. Rows with NULL labels or bad vectors
    contribute to NEITHER statistic (the old split-pass design would
    have let unlabeled rows into X^T X but not X^T Y). Integer and
    string label columns supported. Returns (classes, W
    [n_classes x d]) for :func:`linear_probe_predict`."""
    if l2 < 0:
        raise ValueError(f"linear_probe_train: l2 must be >= 0, got {l2}")
    np = _np()
    lbl_type = dict(df.dtypes)[label_col]
    if lbl_type not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise ValueError(
            f"linear_probe_train: label must be integer or string, got {lbl_type}"
        )
    int_labels = lbl_type != "string"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim))
        xty: dict[str, "object"] = {}
        for pdf in batches:
            idx, mat = _valid_rows(pdf[vec_col], dim)
            labels = pdf[label_col]
            keep = [
                (mat[r], labels.iloc[p])
                for r, p in enumerate(idx)
                if labels.iloc[p] is not None and not pd.isna(labels.iloc[p])
            ]
            if not keep:
                continue
            x = np.asarray([v for v, _ in keep])
            acc += x.T @ x
            for v, c in keep:
                key = str(c)
                if key not in xty:
                    xty[key] = np.zeros(dim)
                xty[key] += v
        iu = np.triu_indices(dim)
        kinds = [0] * len(iu[0])
        iis = list(iu[0])
        keys = [str(j) for j in iu[1]]
        vals = list(acc[iu])
        for cls, vec in xty.items():
            kinds += [1] * dim
            iis += list(range(dim))
            keys += [cls] * dim
            vals += list(vec)
        yield pd.DataFrame(
            {"kind": kinds, "i": iis, "key": keys, "value": vals}
        )

    rows = (
        df.select(vec_col, label_col)
        .mapInPandas(partials, schema="kind int, i int, key string, value double")
        .groupBy("kind", "i", "key")
        .agg(F.sum("value").alias("value"))
        .collect()
    )
    g = np.zeros((dim, dim))
    xty_by_cls: dict[str, "object"] = {}
    for r in rows:
        if r["kind"] == 0:
            j = int(r["key"])
            g[r["i"], j] = r["value"]
            g[j, r["i"]] = r["value"]
        else:
            vec = xty_by_cls.setdefault(r["key"], np.zeros(dim))
            vec[r["i"]] = r["value"]
    if not xty_by_cls:
        raise ValueError("linear_probe_train: no non-null labels")
    classes = sorted(
        (int(k) for k in xty_by_cls) if int_labels else xty_by_cls
    )
    xty = np.stack([xty_by_cls[str(c)] for c in classes], axis=1)
    w = np.linalg.solve(g + l2 * np.eye(dim), xty)  # [d, n_classes]
    return classes, w.T.copy()


def linear_probe_predict(
    df: DataFrame,
    vec_col: str,
    classes: list,
    weights,
    out_col: str = "pred",
) -> DataFrame:
    """Distributed argmax-score prediction with driver weights riding
    the closure — map-only, BLAS per batch. Ties break toward the
    lower class position (argmax's first hit), deterministic. Rows
    whose vector fails :func:`_valid_rows` get a NULL prediction —
    the same rows training skipped, so train-then-predict never
    crashes on the corpus it just trained on."""
    np = _np()
    w = np.asarray(weights, dtype="float64")
    dim = w.shape[1]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, x = _valid_rows(pdf[vec_col], dim)
            pred: list = [None] * len(pdf)
            if len(x):
                for p, a in zip(idx, np.argmax(x @ w.T, axis=1)):
                    pred[p] = classes[a]
            out = pdf.copy()
            out[out_col] = pd.array(pred, dtype="object")
            yield out

    first_cls = classes[0]
    cls_type = LongType() if isinstance(first_cls, int) else StringType()
    return df.mapInPandas(run, schema=_schema_with(df, out_col, cls_type))


def linear_probe_report(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int,
    l2: float = 1.0,
) -> DataFrame:
    """Train + score in one call: per-class (n, correct, accuracy) —
    the probe quality receipt. Distributed predict, one aggregate."""
    classes, w = linear_probe_train(df, vec_col, label_col, dim, l2=l2)
    pred = linear_probe_predict(
        df.select(vec_col, label_col), vec_col, classes, w
    )
    return (
        pred.groupBy(F.col(label_col).alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col(label_col) == F.col("pred")).cast("int")
            ).alias("correct"),
        )
        .withColumn(
            "accuracy", F.round(F.col("correct") / F.col("n"), 6)
        )
        .orderBy("label")
    )


# ----------------------------------------------------------- mahalanobis


def mahalanobis_scores(
    df: DataFrame,
    vec_col: str,
    dim: int,
    shrinkage: float = 1e-6,
    out_col: str = "mahalanobis",
) -> DataFrame:
    """Per-row Mahalanobis distance to the corpus distribution —
    the multivariate outlier score for embedding-space curation
    (flag vectors far from the data cloud accounting for correlated
    dimensions, where per-coordinate z-scores under-fire along
    correlated axes and over-fire along high-variance ones).

    Sufficient-statistics shape like everything in this module: one
    gramian + mean pass reduces the corpus to d x d, the driver
    inverts ``C + shrinkage * tr(C)/d * I`` (Ledoit-Wolf-style ridge
    so a rank-deficient cloud — duplicated dims, n < d — still
    scores instead of crashing on a singular matrix), and scoring is
    a second map-only BLAS pass with the d x d precision matrix
    riding the closure. Two corpus passes total, nothing driver-side
    scales with n.

    Rows with NULL/wrong-length vectors get NULL scores (kept, not
    dropped — the caller decides)."""
    if shrinkage < 0:
        raise ValueError(
            f"mahalanobis_scores: shrinkage must be >= 0, got {shrinkage}"
        )
    np = _np()
    g, s, n = _second_moments(df, vec_col, dim)  # ONE fused stats pass
    if n == 0:
        raise ValueError("mahalanobis_scores: no valid vectors")
    mean = list(s / n)
    cov = g / n - np.outer(s / n, s / n)
    ridge = shrinkage * (np.trace(cov) / dim if np.trace(cov) > 0 else 1.0)
    prec = np.linalg.inv(cov + ridge * np.eye(dim))
    m = np.asarray(mean)
    fields = [f.name for f in df.schema.fields]
    if out_col in fields:
        raise ValueError(f"mahalanobis_scores: column {out_col!r} already exists")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, mat = _valid_rows(pdf[vec_col], dim)
            scores: list = [None] * len(pdf)
            if len(mat):
                x = mat - m
                d2 = np.einsum("ij,jk,ik->i", x, prec, x)
                for p, s in zip(idx, np.sqrt(np.maximum(d2, 0.0))):
                    scores[p] = float(s)
            out = pdf.copy()
            out[out_col] = pd.array(scores, dtype="float64")
            yield out

    return df.mapInPandas(run, schema=_schema_with(df, out_col, DoubleType()))


def whitening_transform(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int | None = None,
    eps: float = 1e-9,
    out_col: str = "whitened",
) -> DataFrame:
    """PCA-whitening of an embedding column: project onto the top-k
    principal axes and rescale each to unit variance —
    ``z = diag(1/sqrt(lambda + eps)) V^T (x - m)``. The standard
    pre-conditioner before cosine-based dedup/clustering when a few
    dominant directions would otherwise swamp the metric (SemDeDup-
    style pipelines whiten or at least center first; public recipe).

    Same sufficient-statistics shape as the rest of the module: one
    gramian+mean reduction, a driver-side eigh (deterministic signs
    via :func:`pca_components_local`), then one map-only BLAS pass.
    ``eps`` guards near-zero eigenvalues (directions with ~no variance
    are scaled by 1/sqrt(eps-ish), not infinity)."""
    if k is None:
        k = dim
    if not 1 <= k <= dim:
        raise ValueError(f"whitening_transform: need 1 <= k <= dim, got {k}")
    np = _np()
    g, s, n = _second_moments(df, vec_col, dim)  # ONE fused stats pass
    if n == 0:
        raise ValueError("whitening_transform: no valid vectors")
    mean = list(s / n)
    cov = g / n - np.outer(s / n, s / n)
    comps, _ = pca_components_local(cov, k)
    vals = np.maximum(
        np.einsum("kd,de,ke->k", comps, cov, comps), 0.0
    )  # variance along each kept axis (eigenvalues, recovered sign-safely)
    w = comps / np.sqrt(vals + eps)[:, None]  # [k, d]
    m = np.asarray(mean)
    fields = [f.name for f in df.schema.fields]
    if out_col in fields:
        raise ValueError(f"whitening_transform: column {out_col!r} already exists")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, x = _valid_rows(pdf[vec_col], dim)
            z: list = [None] * len(pdf)
            if len(x):
                for p, row in zip(idx, (x - m) @ w.T):
                    z[p] = row.tolist()
            out = pdf.copy()
            out[out_col] = z
            yield out

    return df.mapInPandas(
        run, schema=_schema_with(df, out_col, ArrayType(DoubleType()))
    )


def linear_probe_mislabeled(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int,
    l2: float = 1.0,
    min_margin: float = 0.0,
) -> DataFrame:
    """Label-noise candidates via the linear probe — the Confident-
    Learning-lite recipe (Northcutt et al. 2021, public): train the
    ridge probe on the given labels, then surface rows where the
    probe's argmax DISAGREES with the stored label by at least
    ``min_margin`` (score(pred) - score(label)). High-margin
    disagreements on an otherwise-fittable corpus are the rows to
    re-annotate or drop before training.

    Cost: the probe's two sufficient-statistic passes + ONE map-only
    scoring pass; output is disagreement-sized, never corpus-sized.
    Returns (row id columns..., label, pred, margin) sorted by margin
    descending — margin is rounded to 6dp so downstream comparisons
    are float-noise-free."""
    np = _np()
    classes, w = linear_probe_train(df, vec_col, label_col, dim, l2=l2)
    cls_pos = {c: p for p, c in enumerate(classes)}
    wm = np.asarray(w, dtype="float64")
    id_cols = [
        f.name for f in df.schema.fields if f.name not in (vec_col, label_col)
    ]
    first_cls = classes[0]
    cls_type = LongType() if isinstance(first_cls, int) else StringType()
    schema = StructType(
        [f for f in df.schema.fields if f.name != vec_col]
        + [StructField("pred", cls_type, True), StructField("margin", DoubleType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep_cols = [c for c in pdf.columns if c != vec_col]
            # rows with an unscorable vector can't be mislabel
            # CANDIDATES — the output is disagreement-sized, so they
            # are dropped here exactly like training dropped them
            idx, x = _valid_rows(pdf[vec_col], dim)
            out = pdf.iloc[idx][keep_cols].copy()
            if len(out):
                scores = x @ wm.T
                pred_pos = np.argmax(scores, axis=1)
                lbl = out[label_col]
                lbl_pos = np.asarray(
                    [
                        cls_pos.get(c, -1)
                        if c is not None and not pd.isna(c)
                        else -1
                        for c in lbl
                    ]
                )
                ok = lbl_pos >= 0
                margin = np.where(
                    ok,
                    scores[range(len(out)), pred_pos]
                    - scores[range(len(out)), np.where(ok, lbl_pos, 0)],
                    float("nan"),
                )
                out["pred"] = [classes[p] for p in pred_pos]
                out["margin"] = np.round(margin, 6)
                # disagreement on class POSITION (classes are unique, so
                # pred != label <=> pred_pos != lbl_pos when the label is
                # known) — no object-dtype comparisons that would choke
                # on nullable label arrays
                out = out[ok & (pred_pos != lbl_pos) & (margin >= min_margin)]
                yield out
            # empty batches yield nothing — an all-NA empty frame
            # would poison the Arrow writer's concat dtypes

    return (
        df.mapInPandas(run, schema=schema)
        .orderBy(F.col("margin").desc(), *[F.col(c) for c in id_cols])
    )
