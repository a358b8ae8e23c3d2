"""Similarity search over embedding columns (BASELINE north-star;
ABSENT in the reference — nearest public analog is Spark MLlib's
BucketedRandomProjectionLSH, re-expressed here without the ML pipeline
dependency so plans stay pure DataFrame).

Two tiers:
- brute-force cosine top-k: exact, cross-join + per-query heap
  (TakeOrdered per group). Right answer for ≤10^5 corpus or for
  verifying the approximate tier.
- LSH-bucketed ANN: deterministic sign-bucket per vector, candidates =
  same-bucket (or neighboring-bucket) pairs. The bucket key shuffles a
  100 TB corpus once; queries probe only their bucket.

All arithmetic in double via higher-order functions (zip_with /
aggregate) — JVM codegen, no Python, engine-portable results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dbl(vec_col: str) -> str:
    return f"transform({vec_col}, x -> cast(x as double))"


def dot_expr(a: str, b: str) -> Column:
    """Sequential-order fold => deterministic, oracle-reproducible."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(F.expr(f"aggregate(transform({a}, x -> x * x), cast(0.0 as double), (acc, v) -> acc + v)"))


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    Plan shape: broadcast(queries) × corpus → window top-k per query.
    At scale the query side is the small side — broadcast it, never the
    corpus. Ties broken by neighbor id for determinism."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.expr(_dbl(vec_col)).alias("qv")
    )
    # repartition the corpus: a few-file corpus would otherwise score all
    # query×corpus pairs on as many cores as it has files
    c = corpus.repartition(F.col(id_col)).select(
        F.col(id_col).alias("neighbor_id"), F.expr(_dbl(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def sign_lsh_bucket(vec_col: str, num_bits: int = 8) -> Column:
    """Deterministic hyperplane-free LSH bucket: bit j = sign of
    (v[2j] - v[2j+1]). Equivalent to projecting onto the fixed sparse
    hyperplanes (e_{2j} - e_{2j+1}) — no randomness, no stored planes,
    reproducible in plain SQL by the oracle."""
    bits = [
        F.when(
            F.element_at(F.col(vec_col), 2 * j + 1)
            >= F.element_at(F.col(vec_col), 2 * j + 2),
            F.lit(1),
        ).otherwise(F.lit(0))
        * F.lit(1 << j)
        for j in range(num_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the ``num_centroids``
    corpus vectors with the smallest ``md5_i64(id)`` — a reproducible
    uniform sample (FAISS-style random init without Lloyd iterations),
    selected with a top-k heap (TakeOrderedAndProject), never a full
    sort. At cluster scale, swap this for seeded KMeans trained offline
    on a sample; the assignment/probe plans below are unchanged — they
    only see a small (centroid_id, centroid_vec) frame."""
    from ..functions.portable import md5_i64

    return (
        corpus.orderBy(md5_i64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(num_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.expr(_dbl(vec_col)).alias("centroid_vec"),
        )
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into
    ``num_centroids`` cells by nearest centroid, then answer each query
    by scoring only the ``nprobe`` cells nearest to it — the classic
    coarse-quantizer index, expressed as DataFrame ops.

    Scale story (100 TB corpus): the centroid frame is tiny and
    BROADCAST everywhere — the corpus is never shuffled by a cross
    join. Cell assignment is one broadcast-join + per-row argmax pass;
    materialize ``assigned`` partitioned by ``cell`` once, and each
    query batch probes only nprobe/num_centroids of the data via a
    broadcast equi-join on cell. Recall is tunable via nprobe.
    """
    from pyspark.sql import Window

    cents = ivf_centroids(corpus, id_col, vec_col, num_centroids)

    # inverted lists: nearest centroid per corpus vector (argmax cosine,
    # ties to the smallest centroid_id for engine-portable determinism)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.expr(_dbl(vec_col)).alias("cv")
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.col("cos_c").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("cos_c", F.round(cosine_expr("cv", "centroid_vec"), 6))
        .withColumn("arn", F.row_number().over(w_assign))
        .where(F.col("arn") == 1)
        .select("neighbor_id", "cv", F.col("centroid_id").alias("cell"))
    )

    # probe set: nprobe nearest centroids per query
    q = queries.select(
        F.col(id_col).alias("query_id"), F.expr(_dbl(vec_col)).alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cos_q").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cos_q", F.round(cosine_expr("qv", "centroid_vec"), 6))
        .withColumn("prn", F.row_number().over(w_probe))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("cell"))
    )

    # search only the probed cells: broadcast equi-join on cell
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates. Recall is
    traded for a bucket-key equi-join instead of a cross join — the
    100 TB path (bucket the corpus once, probe per query)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(_dbl(vec_col)).alias("qv"),
        sign_lsh_bucket(vec_col, num_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(_dbl(vec_col)).alias("cv"),
        sign_lsh_bucket(vec_col, num_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit_vec"
) -> DataFrame:
    """L2-normalize an embedding column (unit vectors make cosine = dot,
    halving the per-pair arithmetic in every downstream kNN/dedup scan).
    Zero vectors pass through unchanged rather than dividing by zero.
    Materialized as its own projection — single codegen pass."""
    v = F.expr(_dbl(vec_col))
    df = df.withColumn("__v", v).withColumn("__n", norm_expr("__v"))
    unit = F.when(
        F.col("__n") > 0.0,
        F.expr("transform(__v, x -> x / __n)"),
    ).otherwise(F.col("__v"))
    return df.withColumn(out_col, unit).drop("__v", "__n")


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_vec"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale). 4× memory/shuffle reduction for the ANN
    candidate-generation tier at 100 TB (scan/bucket over int8, exact
    re-rank over the float column for the candidate set only).

    Emits (q_vec array<tinyint>, q_scale double); dequantized value is
    q_i * q_scale. All-zero vectors get scale 0 and an all-zero q_vec.
    Codegen-only, engine-portable (round-half-up on non-negative
    magnitudes matches across engines)."""
    df = df.withColumn("__v", F.expr(_dbl(vec_col)))
    max_abs = F.expr("aggregate(__v, cast(0.0 as double), (acc, x) -> greatest(acc, abs(x)))")
    df = df.withColumn("__s", max_abs / F.lit(127.0))
    q = F.when(
        F.col("__s") > 0.0,
        F.expr("transform(__v, x -> cast(round(x / __s) as tinyint))"),
    ).otherwise(F.expr("transform(__v, x -> cast(0 as tinyint))"))
    return (
        df.withColumn(out_col, q)
        .withColumn("q_scale", F.round(F.col("__s"), 9))
        .drop("__v", "__s")
    )


LITERAL_ASSIGN_BOUND = 10_000  # max k×d a codegen'd literal plan tolerates


def kmeans_lloyd(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    assignment: str = "auto",
) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding column — the
    clustering primitive behind semantic dedup (SemDeDup: drop
    near-identical members within a cluster), domain discovery, and a
    trained IVF coarse quantizer (drop-in upgrade of ivf_centroids'
    hash-sampled init, which is exactly this operator's round 0).

    Deterministic and engine-portable by construction, so a SQL oracle
    can replay it bit-for-bit:

    - init: the ``k`` vectors with smallest ``(md5(id), id)`` —
      ivf_centroids' reproducible sample; cluster label = position in
      that order (0-based);
    - assignment: argmin over ``(round(dist², 6), label)`` — the
      squared distance goes through the dot-product identity
      ``v·v - 2 v·c + c·c`` with the same sequential fold on both
      engines, and the 6-dp round absorbs last-bit float drift before
      the comparison;
    - update: per-(cluster, dimension) mean, rounded to 6 dp; a
      cluster that loses every point keeps its previous centroid.

    ``iterations`` counts ASSIGNMENT passes: assign → update repeats
    ``iterations - 1`` times, then one final assign. Scale shape: each
    assignment is a MAP-ONLY pass over the corpus; each update is one
    (cluster, dim) aggregate (k×d rows out) — the corpus shuffles only
    for the update aggregate, and the centroid table lands on the driver
    (k×d doubles, dimension-sized by contract). Two assignment
    renderings, selected by ``assignment``:

    - ``"literal"`` — the k×d centroid table is inlined as codegen'd
      array literals. Fastest plan, but a codegen'd expression only
      tolerates ~10^4 literals (``LITERAL_ASSIGN_BOUND``).
    - ``"broadcast"`` — the centroid table travels as broadcast DATA:
      one single-row frame holding array<struct<c, v, cc>>, cross-joined
      (BroadcastNestedLoopJoin over exactly one row — still map-only, no
      shuffle) and folded with the same transform/array_min expression.
      Identical arithmetic (same sequential fold, same 6-dp round, same
      (d, label) tiebreak), so both paths return bit-identical labels —
      asserted in tests.
    - ``"auto"`` (default) — ``"literal"`` while k×d stays under the
      bound, ``"broadcast"`` beyond it (the SemDeDup regime: k in the
      tens of thousands).

    Returns (id_col, cluster, sq_dist).
    """
    from ..functions.portable import md5_i64_py

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if assignment not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown assignment mode: {assignment!r}")
    emb = corpus.select(F.col(id_col), F.expr(_dbl(vec_col)).alias("__v"))
    init = ivf_centroids(corpus, id_col, vec_col, k).collect()
    ordered = sorted(
        ((md5_i64_py(str(r["centroid_id"])), r["centroid_id"], r["centroid_vec"]) for r in init)
    )
    cents: list[tuple[int, list[float]]] = [
        (pos, [float(x) for x in vec]) for pos, (_, _, vec) in enumerate(ordered)
    ]
    if assignment == "auto":
        dim = len(cents[0][1]) if cents else 0
        assignment = "literal" if k * dim <= LITERAL_ASSIGN_BOUND else "broadcast"

    def _assign_literal(frame: DataFrame) -> DataFrame:
        vv = F.expr(
            "aggregate(transform(__v, x -> x * x), cast(0.0 as double), (acc, v) -> acc + v)"
        )
        choices = []
        for label, vec in cents:
            vc = F.expr(
                "aggregate(zip_with(__v, {c}, (x, y) -> x * y), cast(0.0 as double),"
                " (acc, v) -> acc + v)".format(
                    c="array({})".format(",".join(f"cast({x!r} as double)" for x in vec))
                )
            )
            cc = F.lit(_seq_dot(vec, vec))
            choices.append(
                F.struct(
                    F.round(vv - 2.0 * vc + cc, 6).alias("d"),
                    F.lit(label).alias("c"),
                )
            )
        best = F.array_min(F.array(*choices))
        return frame.withColumn("sq_dist", best["d"]).withColumn("cluster", best["c"])

    def _assign_broadcast(frame: DataFrame) -> DataFrame:
        # centroids as DATA: one row, array<struct>, broadcast to every
        # task. ||c||² is precomputed driver-side exactly like the
        # literal path's F.lit(_seq_dot(...)), so the arithmetic per
        # (vector, centroid) is identical expression-for-expression.
        spark = frame.sparkSession
        cent_rows = [(label, vec, _seq_dot(vec, vec)) for label, vec in cents]
        packed = spark.createDataFrame(
            [(cent_rows,)],
            "cents array<struct<c:int,v:array<double>,cc:double>>",
        )
        # __vv is its own projection: referencing it inside the transform
        # lambda would re-fold ||v||² once per centroid
        out = (
            frame.withColumn(
                "__vv",
                F.expr(
                    "aggregate(transform(__v, x -> x * x), cast(0.0 as double),"
                    " (acc, v) -> acc + v)"
                ),
            )
            .crossJoin(F.broadcast(packed))
            .withColumn(
                "__best",
                F.array_min(
                    F.expr(
                        "transform(cents, s -> struct("
                        "round(__vv - 2 * aggregate(zip_with(__v, s.v, (x, y) -> x * y),"
                        " cast(0.0 as double), (acc, v) -> acc + v) + s.cc, 6) AS d,"
                        " s.c AS c))"
                    )
                ),
            )
        )
        return (
            out.withColumn("sq_dist", F.col("__best")["d"])
            .withColumn("cluster", F.col("__best")["c"])
            .drop("cents", "__vv", "__best")
        )

    _assign = _assign_literal if assignment == "literal" else _assign_broadcast

    for it in range(iterations - 1):
        assigned = _assign(emb)
        means = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        cents = [
            (
                label,
                [by_cluster[label][p] for p in range(len(vec))]
                if label in by_cluster
                else vec,  # empty cluster keeps its previous centroid
            )
            for label, vec in cents
        ]
    return _assign(emb).select(F.col(id_col), "cluster", "sq_dist")


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Sequential-order fold, matching the engines' aggregate/fold."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embeddings, then drop
    every vector that has a LOWER-id near-twin (cosine ≥ ``threshold``)
    inside its own cluster. Semantic near-duplicates — paraphrases,
    templated rewrites — land in the same cluster, so the quadratic
    comparison is confined to cluster-sized blocks instead of the
    corpus (the whole point of the method at scale; cluster count is
    the knob that bounds block size).

    Keep rule = "no lower-id twin" (anti-join on the pair relation) —
    deterministic, single-pass, and exactly the canonical-min rule the
    exact-dedup tier uses.

    Returns the KEPT rows of ``corpus`` with their ``cluster`` label.
    """
    assigned = kmeans_lloyd(corpus, id_col, vec_col, k, iterations).select(
        F.col(id_col), "cluster"
    )
    # norms are computed ONCE per vector before the pair join — inside
    # the join condition they would be re-folded for every candidate
    # pair (3 array folds per pair instead of 1)
    vecs = (
        corpus.select(F.col(id_col), F.expr(_dbl(vec_col)).alias("__v"))
        .withColumn("__n", norm_expr("__v"))
        .join(assigned, id_col)
    )
    a = vecs.select(
        F.col(id_col).alias("__id_a"),
        F.col("cluster"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = vecs.select(
        F.col(id_col).alias("__id_b"),
        F.col("cluster"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    # pairs only within a cluster, higher id vs lower id — the dropped
    # side is the HIGHER id, so survivors are the canonical minima
    twins = (
        a.join(b, ["cluster"])
        .where(F.col("__id_a") > F.col("__id_b"))
        .where(
            F.round(
                dot_expr("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6
            )
            >= threshold
        )
        .select(F.col("__id_a").alias(id_col))
        .distinct()
    )
    return (
        corpus.join(assigned, id_col)
        .join(twins, id_col, "left_anti")
    )
