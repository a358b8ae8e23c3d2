"""Scale-growth evidence for the dedup tier (round-5 item: the sf0.1
bench corpus is 500 docs, index-build dominated — this measures the
SAME operators on 10x and 100x synthetic corpora so growth, not
constant cost, is visible).

Corpora come from the partitioned Python DataSource
(`synthetic_docs`), so generation is distributed like any file scan; a
deterministic 10% near-dup layer (each doc_id % 10 == 0 re-emitted
with one appended word under id + n) guarantees the LSH/verify stages
do real work instead of degenerating to zero candidates.

Workload proportionality: the raw generator has a 16-word vocabulary
and 6-15-word docs, so millions of docs share an identical BASE word
sequence (birthday collisions over 16^6..16^15 sequences) — chance
pairs then grow ~quadratically with corpus size, which measures the
corpus, not the operator (appending unique suffix tokens, the first
cut, fixed VERIFIED pair counts but left base-only leading shingles
colliding: at 2.75M docs ~half of all same-base pairs still banded
together and the verify join's shuffle alone overflowed the box's
~80 GB of /tmp). Fix: a doc-unique md5-derived filler token is
INTERLEAVED after every 2 base tokens, so the maximum base-only run
(2) is shorter than the shingle width (3) — every shingle contains a
doc-unique token, chance inter-doc Jaccard is ~0, and candidate
volume tracks the injected 10% dup layer exactly (the real-web-text
regime, where vocabulary diversity keeps random-pair similarity near
zero). Injected dups re-use the original doc's fillers and append one
word, so their Jaccard stays >= ~0.85, over the 0.8 threshold.

Measured per size, end-to-end to a driver-side count:
- minhash:     full MinHash-LSH pair generation + Jaccard verify
- clusters:    connected components over those pairs (O(log d) rounds)
- incremental: 10% delta probed against the 90% corpus band index

Usage: python tools/dedup_scale_bench.py [size ...]   (default 5000 50000)
Prints ONE JSON line; the round artifact is committed as
BENCH_SCALE_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.operators import dedup, linkage, textstats  # noqa: E402
from ai_etl_pipeline_spark.session import get_session  # noqa: E402
from ai_etl_pipeline_spark.sources import writers  # noqa: E402
from ai_etl_pipeline_spark.sources.python_datasource import (  # noqa: E402
    register_synthetic_docs,
)


THRESHOLD = 0.8


def build_corpus(spark, n: int):
    toked = (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", 32)
        .load()
        .select("doc_id", F.split(F.col("text"), " ").alias("__t"))
    )

    def filler(i):
        # doc-unique per-position token (6 hex chars)
        return F.substring(
            F.md5(
                F.concat_ws(
                    "_", F.col("doc_id").cast("string"), i.cast("string")
                )
            ),
            1,
            6,
        )

    # interleave a filler after every 2 base tokens — see module
    # docstring (kills base-only shingles, so chance J ~ 0)
    n_groups = F.greatest(
        F.ceil(F.size("__t") / F.lit(2.0)).cast("int"), F.lit(1)
    )
    pieces = F.transform(
        F.sequence(F.lit(0), n_groups - F.lit(1)),
        lambda i: F.concat_ws(
            " ",
            F.array_join(F.slice(F.col("__t"), i * F.lit(2) + F.lit(1), 2), " "),
            filler(i),
        ),
    )
    base = toked.select("doc_id", F.array_join(pieces, " ").alias("text"))
    dups = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.lit("extra")).alias("text"),
    )
    return base.unionByName(dups)


def timed(fn) -> tuple[float, int]:
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 2), n


def release_shuffles(spark) -> None:
    """Nudge the ContextCleaner between ops: shuffle map outputs live on
    disk until their RDD objects are GC'd, so a multi-op size at 5M docs
    otherwise ACCUMULATES every op's shuffle files (~60 GB — the
    attempt-3 'No space left on device'). A JVM System.gc() after each
    timed op lets the cleaner delete the previous op's files."""
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


ALL_OPS = (
    "minhash", "clusters", "incremental", "index",
    # round-7 additions: the three heaviest round-6 queries get their
    # own growth curves (verdict task #6)
    "containment", "entity", "bm25",
    # round-7: the new fixed-iteration graph operator
    "pagerank",
    # round-8: degree-ordered triangle census growth curve
    "triangles",
    # round-9: weighted PageRank + fixed-round label propagation
    # (components / majority-vote communities) growth curves
    "wpagerank", "labelprop", "lpa_comm", "hits", "khop",
    # round-10: exact-recall prefix-filter join growth curve
    "prefix",
    # round-14: boilerplate-skew corpus — the oversized-band-bucket
    # regime the max_bucket cap exists for (r13 verdict #1)
    "skew",
)

# r14: three near-identical ~24-word template families. 20% of the skew
# corpus is drawn from these, so each family forms ONE mega band bucket
# (members share almost every shingle; one doc-unique token appended
# keeps them near- rather than exact-duplicates, J >= ~0.9).
_SKEW_TEMPLATES = [
    "please unsubscribe from this mailing list by clicking the link below "
    "all rights reserved copyright notice terms of service apply to every "
    "subscriber of this newsletter archive",
    "this page uses cookies to improve your browsing experience accept our "
    "cookie policy or manage preferences in the settings panel privacy "
    "statement and legal disclaimer apply throughout",
    "thank you for your order your package will arrive within five business "
    "days track your shipment using the reference number provided contact "
    "customer support with any delivery questions",
]

_SKEW_MAX_BUCKET = 200  # receipt cap: family buckets are 10-100x larger


def build_skew_corpus(spark, n: int):
    """~80% diverse docs (build_corpus's doc-unique-filler scheme, so
    chance inter-doc Jaccard ~ 0) + 20% template boilerplate from the 3
    families above — the real-web shape (footer/cookie/receipt
    boilerplate) where a fraction of the corpus collapses into a few
    mega band buckets and the uncapped self-join goes quadratic."""
    diverse = build_corpus(spark, max(int(n * 0.8 / 1.1), 1))
    n_tmpl = int(n * 0.2)
    fam = spark.range(n_tmpl).select(
        (F.lit(10) * n + F.col("id")).alias("doc_id"),
        F.concat(
            F.element_at(
                F.array(*[F.lit(t) for t in _SKEW_TEMPLATES]),
                (F.col("id") % 3 + 1).cast("int"),
            ),
            F.lit(" zz"),
            F.substring(F.md5(F.col("id").cast("string")), 1, 6),
        ).alias("text"),
    )
    return diverse.unionByName(fam)


# uncapped candidate generation is measured only while the quadratic is
# still countable on one box (3 x C(n*0.2/3, 2) pairs: 67M at 100k docs,
# 6.7e9 at 1M — the receipt extrapolates past this, the phash precedent)
_SKEW_UNCAPPED_MAX = 150_000


def run_size(spark, n: int, ops: tuple[str, ...] = ALL_OPS) -> dict:
    """``ops`` selects which operators this size measures — a single
    local[32] box cannot hold the SIMULTANEOUS spill of all five ops at
    5.5M docs (attempts 3-6 each died at ~80 GB of /tmp), so the
    largest size runs the subset that answers the scale question:
    minhash pair-generation growth and the bucketed-probe path. On a
    real cluster each op has its own executors/disks and the full set
    runs everywhere."""
    docs = build_corpus(spark, n).persist()
    n_docs = docs.count()  # materialize so generation isn't billed to op 1
    out: dict = {"n_docs": n_docs, "ops": list(ops)}

    if "minhash" in ops:
        t_minhash, n_pairs = timed(
            lambda: dedup.minhash_lsh_near_duplicates(
                docs, "doc_id", "text", threshold=THRESHOLD
            ).count()
        )
        out["minhash_sec"], out["minhash_pairs"] = t_minhash, n_pairs
        release_shuffles(spark)

    if "clusters" in ops:
        # materialize the pair relation OUTSIDE the clusters timing: the
        # operator eagerly persists its input, so handing it the lazy
        # minhash plan would re-execute all of pair generation inside the
        # clustering measurement (a first cut showed exactly that — the
        # "clusters" time tracked minhash, not clustering)
        pairs = dedup.minhash_lsh_near_duplicates(
            docs, "doc_id", "text", threshold=THRESHOLD
        ).persist()
        pairs.count()
        t_clusters, n_clustered = timed(
            lambda: dedup.near_duplicate_clusters(pairs, docs, "doc_id").count()
        )
        pairs.unpersist()
        release_shuffles(spark)
        out["clusters_sec"], out["clusters_rows"] = t_clusters, n_clustered

    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    if "incremental" in ops:
        t_incr, n_incr = timed(
            lambda: dedup.minhash_lsh_incremental(
                corpus, delta, "doc_id", "text", threshold=THRESHOLD
            ).count()
        )
        release_shuffles(spark)
        out["incremental_sec"], out["incremental_pairs"] = t_incr, n_incr

    if "index" in ops:
        # the 100 TB shape, separately timed: pay the corpus signature
        # pass ONCE into a (band, sig)-bucketed index table, then the
        # per-batch probe only computes DELTA signatures and equi-joins
        # the bucketed index with no corpus-side Exchange — probe cost
        # should track the delta, not the corpus
        import tempfile

        spark = docs.sparkSession
        tbl = f"t_scale_band_index_{n}"
        t_index, _ = timed(
            lambda: writers.write_bucketed_table(
                dedup.minhash_band_relation(corpus, "doc_id", "text", 3, 16, 8),
                tbl,
                ["band", "sig"],
                num_buckets=16,
                sort_cols=["band", "sig"],
                path=tempfile.mkdtemp(prefix=f"band_idx_{n}_"),
            )
            or 0
        )
        idx = spark.table(tbl)
        t_probe, n_probe = timed(
            lambda: dedup.minhash_lsh_incremental(
                corpus, delta, "doc_id", "text",
                threshold=THRESHOLD, corpus_bands=idx,
            ).count()
        )
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        out["index_build_sec"] = t_index
        out["bucketed_probe_sec"], out["bucketed_probe_pairs"] = t_probe, n_probe

    if "prefix" in ops:
        # exact-recall prefix filtering over the same 3-shingle relation
        # as minhash: the injected 10% dup layer sits at Jaccard >= ~0.85,
        # chance overlap ~0 (doc-unique fillers), so verified pairs track
        # the dup layer and the measurement covers freq aggregate +
        # per-doc prefix window + prefix equi-join + exact verify
        t_pf, n_pf = timed(
            lambda: dedup.prefix_filter_join(
                docs, "doc_id", "text",
                threshold_micro=800000, shingle_k=3,
            ).count()
        )
        release_shuffles(spark)
        out["prefix_sec"], out["prefix_pairs"] = t_pf, n_pf

    if "containment" in ops:
        # asymmetric containment over 3-word shingles: the injected dup
        # layer (base text + one appended word) gives base ⊂ dup
        # containment ≈ 1, so verified pairs track the 10% layer;
        # fillers keep chance shingle overlap ~0, so candidate volume
        # tracks it too
        t_cont, n_cont = timed(
            lambda: dedup.containment_pairs(
                docs, "doc_id", "text", threshold=THRESHOLD, ngram=3, max_df=0.5
            ).count()
        )
        release_shuffles(spark)
        out["containment_sec"], out["containment_pairs"] = t_cont, n_cont

    if "entity" in ops:
        # synthetic record names: groups of 5 consecutive ids share a
        # 10-char prefix and differ in the last char — every in-group
        # pair is an edit-distance-1 match, so the match graph (5-node
        # cliques) grows LINEARLY with the corpus and the measurement
        # covers blocked join + threshold levenshtein + closure, not a
        # quadratic corpus artifact. Blocking on the shared prefix
        # bounds blocks at 5 (the operator's bounded-block contract).
        recs = docs.select(
            "doc_id",
            F.concat(
                F.lit("u"),
                F.lpad((F.col("doc_id") / 5).cast("long").cast("string"), 9, "0"),
                (F.col("doc_id") % 5).cast("string"),
            ).alias("name"),
        )
        t_ent, n_ent = timed(
            lambda: linkage.entity_resolution(
                recs,
                "doc_id",
                "name",
                [F.length("name"), F.substring("name", 1, 10)],
                max_distance=1,
            ).count()
        )
        release_shuffles(spark)
        out["entity_sec"], out["entity_rows"] = t_ent, n_ent

    if "pagerank" in ops:
        # deterministic sparse expander over the doc ids (each node
        # links to id+1 and id*2 mod n): ~2 edges/node at every scale,
        # so growth measures the ITERATION (8 fixed rounds of
        # edge-sized joins/aggregates), not a densifying graph
        n_nodes = docs.selectExpr("max(doc_id) + 1 as m").first()["m"]
        ids = docs.select("doc_id")
        pr_edges = ids.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + 1) % n_nodes).alias("dst"),
        ).unionByName(
            ids.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 2 + 1) % n_nodes).alias("dst"),
            )
        )
        from ai_etl_pipeline_spark.operators import graph

        t_pr, n_pr = timed(
            lambda: graph.pagerank(pr_edges, iterations=8).count()
        )
        release_shuffles(spark)
        out["pagerank_sec"], out["pagerank_nodes"] = t_pr, n_pr

    if "wpagerank" in ops:
        # same sparse expander as "pagerank", with a deterministic
        # small-integer weight per edge ((src % 7) + 1) — growth
        # measures the weighted iteration (the extra per-edge
        # multiply/div and the strength aggregate), not a new topology
        n_nodes = docs.selectExpr("max(doc_id) + 1 as m").first()["m"]
        ids = docs.select("doc_id")
        wpr_edges = ids.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + 1) % n_nodes).alias("dst"),
        ).unionByName(
            ids.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 2 + 1) % n_nodes).alias("dst"),
            )
        ).withColumn("w", (F.col("src") % 7 + 1).cast("bigint"))
        from ai_etl_pipeline_spark.operators import graph

        t_wpr, n_wpr = timed(
            lambda: graph.pagerank(wpr_edges, iterations=8, weight_col="w").count()
        )
        release_shuffles(spark)
        out["wpagerank_sec"], out["wpagerank_nodes"] = t_wpr, n_wpr

    if "labelprop" in ops or "lpa_comm" in ops:
        # disjoint 5-node path components (i—i+1 inside groups of 5):
        # component count grows linearly, radius <= 4 < the 6 fixed
        # rounds, so min-label converges (n_changed = 0) and growth
        # measures the per-round edge join + dst-keyed aggregate
        lp_edges = (
            docs.select("doc_id")
            .where(F.col("doc_id") % 5 < 4)
            .select(
                F.col("doc_id").alias("src"),
                (F.col("doc_id") + 1).alias("dst"),
            )
        )
        from ai_etl_pipeline_spark.operators import graph

        if "labelprop" in ops:
            t_lp, n_lp = timed(
                lambda: graph.label_propagation(
                    lp_edges, iterations=6, mode="components"
                ).count()
            )
            release_shuffles(spark)
            out["labelprop_sec"], out["labelprop_nodes"] = t_lp, n_lp
        if "lpa_comm" in ops:
            # same graph, majority-vote mode: adds the per-round
            # (node,label) count + row_number window — the LPA shuffle
            t_lc, n_lc = timed(
                lambda: graph.label_propagation(
                    lp_edges, iterations=6, mode="communities"
                ).count()
            )
            release_shuffles(spark)
            out["lpa_comm_sec"], out["lpa_comm_nodes"] = t_lc, n_lc

    if "hits" in ops or "khop" in ops:
        # the pagerank sparse expander again (2 edges/node, directed):
        # growth measures the coupled half-steps (hits: 2 edge joins +
        # 2 scalar renormalizations per iteration) / the relaxation
        # rounds (khop: frontier join + node-keyed min per hop), not a
        # densifying graph
        n_nodes = docs.selectExpr("max(doc_id) + 1 as m").first()["m"]
        ids = docs.select("doc_id")
        gk_edges = ids.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + 1) % n_nodes).alias("dst"),
        ).unionByName(
            ids.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 2 + 1) % n_nodes).alias("dst"),
            )
        )
        from ai_etl_pipeline_spark.operators import graph

        if "hits" in ops:
            t_h, n_h = timed(
                lambda: graph.hits(gk_edges, iterations=6).count()
            )
            release_shuffles(spark)
            out["hits_sec"], out["hits_nodes"] = t_h, n_h
        if "khop" in ops:
            seeds = ids.where(F.col("doc_id") % 1024 == 0).select(
                F.col("doc_id").alias("node")
            )
            t_k, n_k = timed(
                lambda: graph.k_hop_distances(
                    gk_edges, seeds, max_hops=4, symmetric=True
                ).count()
            )
            release_shuffles(spark)
            out["khop_sec"], out["khop_reached"] = t_k, n_k

    if "triangles" in ops:
        # deterministic circulant graph over the doc ids (i—i+1, i—i+2
        # mod n): every node closes triangle (i, i+1, i+2), so triangle
        # count is EXACTLY n, edges 2n, max degree 4 — growth measures
        # the wedge join + closure semi-join, not a densifying graph
        n_nodes = docs.selectExpr("max(doc_id) + 1 as m").first()["m"]
        ids = docs.select("doc_id")
        tri_edges = ids.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + 1) % n_nodes).alias("dst"),
        ).unionByName(
            ids.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") + 2) % n_nodes).alias("dst"),
            )
        )
        from ai_etl_pipeline_spark.operators import graph

        t_tri, n_tri = timed(
            lambda: graph.triangle_count(tri_edges).first()["n_triangles"]
        )
        release_shuffles(spark)
        out["triangles_sec"], out["triangles_found"] = t_tri, n_tri

    if "skew" in ops:
        skew = build_skew_corpus(spark, n).persist()
        out["skew_docs"] = skew.count()

        def _sigs():
            return dedup.minhash_signatures(
                dedup.doc_shingles(skew, "doc_id", "text", 3),
                "doc_id", "shingle", 16,
            )

        t_cap, n_cap = timed(
            lambda: dedup.lsh_candidate_pairs(
                _sigs(), "doc_id", 16, 8, max_bucket=_SKEW_MAX_BUCKET
            ).count()
        )
        release_shuffles(spark)
        out["skew_capped_cand_sec"] = t_cap
        out["skew_capped_cand_pairs"] = n_cap
        if n <= _SKEW_UNCAPPED_MAX:
            t_unc, n_unc = timed(
                lambda: dedup.lsh_candidate_pairs(
                    _sigs(), "doc_id", 16, 8, max_bucket=None
                ).count()
            )
            release_shuffles(spark)
            out["skew_uncapped_cand_sec"] = t_unc
            out["skew_uncapped_cand_pairs"] = n_unc
        if n <= 1_200_000:
            # end-to-end capped near-dup (pair gen + exact verify) —
            # verified pairs are candidate-bounded, so the verify tier
            # inherits the cap's linearity
            t_full, n_full = timed(
                lambda: dedup.minhash_lsh_near_duplicates(
                    skew, "doc_id", "text", threshold=THRESHOLD,
                    max_bucket=_SKEW_MAX_BUCKET,
                ).count()
            )
            release_shuffles(spark)
            out["skew_minhash_sec"] = t_full
            out["skew_minhash_pairs"] = n_full
        skew.unpersist()

    if "bm25" in ops:
        # fixed 3-term query from the base vocabulary (every doc has
        # hits, so the in-row tf expressions and the one corpus-stats
        # aggregate both do full work); top-10 via TakeOrderedAndProject
        t_bm, n_bm = timed(
            lambda: textstats.bm25_topk(
                docs, "doc_id", "text", ["data", "model", "corpus"], k=10
            ).count()
        )
        release_shuffles(spark)
        out["bm25_sec"], out["bm25_rows"] = t_bm, n_bm

    docs.unpersist()
    return out


def _parse_size(arg: str) -> tuple[int, tuple[str, ...]]:
    """``SIZE`` or ``SIZE:op1,op2`` (ops ⊆ ALL_OPS)."""
    if ":" in arg:
        size, opspec = arg.split(":", 1)
        ops = tuple(o for o in opspec.split(",") if o)
        bad = [o for o in ops if o not in ALL_OPS]
        if bad:
            raise SystemExit(f"unknown ops {bad}; valid: {ALL_OPS}")
        return int(size), ops
    return int(arg), ALL_OPS


def main() -> None:
    specs = [_parse_size(a) for a in sys.argv[1:]] or [
        (5000, ALL_OPS), (50000, ALL_OPS)
    ]
    spark = get_session("dedup-scale-bench", extra_conf={"spark.io.compression.codec": "zstd", "spark.io.compression.zstd.level": "3"})
    spark.sparkContext.setLogLevel("ERROR")
    register_synthetic_docs(spark)
    # warm-up runs the MEASURED operators on a tiny corpus: JVM, codegen
    # for these exact plan shapes, python workers, shuffle service — a
    # bare count() warm-up left ~15s of first-run init billed to the
    # smallest size's minhash
    warm = build_corpus(spark, 500).persist()
    warm.count()
    dedup.minhash_lsh_near_duplicates(warm, "doc_id", "text", threshold=THRESHOLD).count()
    pairs = dedup.minhash_lsh_near_duplicates(warm, "doc_id", "text", threshold=THRESHOLD)
    dedup.near_duplicate_clusters(pairs, warm, "doc_id").count()
    dedup.minhash_lsh_incremental(
        warm.where(F.col("doc_id") % 10 != 0),
        warm.where(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        threshold=THRESHOLD,
    ).count()
    warm.unpersist()

    out = {"metric": "dedup_scale", "unit": "sec", "sizes": {}}
    for n, ops in specs:
        # fresh context per size: stop() removes this context's shuffle
        # dirs from disk; the per-size warm-up below re-warms codegen so
        # sizes stay comparable
        spark.stop()
        spark = get_session("dedup-scale-bench", extra_conf={"spark.io.compression.codec": "zstd", "spark.io.compression.zstd.level": "3"})
        spark.sparkContext.setLogLevel("ERROR")
        register_synthetic_docs(spark)
        warm = build_corpus(spark, 500).persist()
        dedup.minhash_lsh_near_duplicates(warm, "doc_id", "text", threshold=THRESHOLD).count()
        warm.unpersist()
        out["sizes"][str(n)] = run_size(spark, n, ops)
        # partial line per completed size: a late-phase failure (disk,
        # OOM) must not lose the finished measurements
        print(json.dumps({"partial": n, **out["sizes"][str(n)]}), flush=True)
    ratios = {}
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        growth = sb["n_docs"] / sa["n_docs"]
        r: dict = {"data_growth": round(growth, 1)}
        for op_key in (
            "minhash_sec", "clusters_sec", "incremental_sec",
            "bucketed_probe_sec", "containment_sec", "entity_sec",
            "bm25_sec", "pagerank_sec", "triangles_sec",
            "wpagerank_sec", "labelprop_sec", "lpa_comm_sec",
            "hits_sec", "khop_sec",
        ):
            if op_key in sa and op_key in sb:
                r[op_key.replace("_sec", "_time_growth")] = round(
                    sb[op_key] / max(sa[op_key], 1e-9), 1
                )
        ratios[f"{a}->{b}"] = r
    out["growth"] = ratios
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
