"""Scale-growth evidence for the TEXT-ANALYSIS tier (r12: completes the
per-tier receipt matrix — dedup/relational/graph/ANN/CDC/streaming all
have decade curves; this one covers the per-document scorers and the
token-aggregate scorers that run over every document of a pretraining
corpus).

Four ops at three corpus decades, chosen to bracket the tier's two
plan shapes:

- langid_sec:  stopword-marker language ID — pure projection, zero
               shuffles; the curve proves the scorer is scan-bound.
- gopher_sec:  Gopher rule metrics + keep flag (Rae et al. 2021) —
               single whole-stage-codegen projection, zero shuffles.
- tfidf_sec:   per-(doc, term) TF-IDF — two token-keyed aggregates
               (tf on (doc, term), df on term); the realistic case is
               O(n) vocabulary, so each doc gets three doc-unique
               filler tokens appended (md5-derived, deterministic).
- ppl_sec:     add-k bigram LM perplexity (CCNet idiom) — LM build is
               one bigram aggregate + one context re-aggregate,
               scoring one hash-spread join.
- ppl_fixedvocab_sec: the same perplexity over the BASE docs (no
               doc-unique fillers — bounded 16-word vocabulary). The
               r13 attribution run: this curve tracking the scan
               decade pins the O(n)-vocab curve's extra growth on the
               fixture's rare-token tail, not the operator's plan.

Each op is forced end-to-end through an aggregate OVER ITS COMPUTED
COLUMNS (sum/avg of the scores) — a bare count() would let Catalyst
prune the work being measured. Docs come from the synthetic_docs
Python DataSource (partitioned, deterministic, no driver
materialization). Fresh session per size; 20k warm-up run first.

Usage: python tools/text_scale_bench.py [n ...]
(default 50000 500000 5000000). Artifact: BENCH_SCALE_r{N}_text.json;
>12x/decade flags.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.session import get_session  # noqa: E402
from ai_etl_pipeline_spark.operators import textstats  # noqa: E402
from ai_etl_pipeline_spark.sources.python_datasource import (  # noqa: E402
    register_synthetic_docs,
)


def corpus(spark, n: int):
    base = (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", 32)
        .load()
    )
    # three doc-unique tokens => vocabulary grows O(n), so the df
    # aggregate and the LM bigram table see the realistic rare-token
    # tail instead of a 16-word toy vocab
    h = F.md5(F.col("doc_id").cast("string"))
    return base.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.substring(h, 1, 6),
            F.substring(h, 7, 6),
            F.substring(h, 13, 6),
        ).alias("text"),
    )


def timed(fn):
    t0 = time.monotonic()
    r = fn()
    return round(time.monotonic() - t0, 2), r


def release_shuffles(spark) -> None:
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)


def fixed_vocab_corpus(spark, n: int):
    """The same synthetic docs WITHOUT the doc-unique fillers — a
    bounded (16-word) vocabulary, so the bigram table and df aggregate
    stay O(1)-sized while the corpus decades. The r12 verdict asked for
    this attribution run: if ppl over a FIXED vocabulary tracks the
    scan decade, the O(n)-vocab curve's extra growth belongs to the
    fixture's rare-token tail, not the operator's plan."""
    return (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", 32)
        .load()
        .select("doc_id", "text")
    )


def run_size(spark, n: int) -> dict:
    out: dict = {"n_docs": n}
    docs = corpus(spark, n)

    def langid():
        return (
            textstats.language_id(docs, "text")
            .groupBy("lang_pred")
            .count()
            .collect()
        )

    out["langid_sec"], rows = timed(langid)
    out["langid_langs"] = len(rows)
    release_shuffles(spark)

    def gopher():
        return (
            # min_stop_hits=1: the synthetic vocab carries one stopword
            # ('the'), so the paper default of 2 would flag every doc
            # and leave the keep branch untested
            textstats.gopher_quality_flags(docs, "doc_id", "text", min_stop_hits=1)
            .agg(
                F.sum(F.col("keep_gopher").cast("int")).alias("kept"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )

    out["gopher_sec"], row = timed(gopher)
    out["gopher_kept"] = int(row["kept"])
    release_shuffles(spark)

    def tfidf():
        return (
            textstats.tf_idf(docs, "doc_id", "text")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("tfidf").alias("mass"),
            )
            .collect()[0]
        )

    out["tfidf_sec"], row = timed(tfidf)
    out["tfidf_terms"] = int(row["n"])
    release_shuffles(spark)

    def ppl():
        return (
            textstats.lm_perplexity(docs, "doc_id", "text")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("ppl"), 3).alias("avg_ppl"),
            )
            .collect()[0]
        )

    out["ppl_sec"], row = timed(ppl)
    out["ppl_avg"] = float(row["avg_ppl"])
    release_shuffles(spark)

    fdocs = fixed_vocab_corpus(spark, n)

    def ppl_fixed():
        return (
            textstats.lm_perplexity(fdocs, "doc_id", "text")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("ppl"), 3).alias("avg_ppl"),
            )
            .collect()[0]
        )

    out["ppl_fixedvocab_sec"], row = timed(ppl_fixed)
    release_shuffles(spark)

    # r14 (r13 verdict #6): the same attribution run for TF-IDF — its
    # 5.3x/decade tail at the 5M step was suspected to come from the
    # fixture's O(n) vocabulary (doc-unique fillers make |terms| grow
    # 10x/decade, so the df aggregate and the (doc, term) output decade
    # faster than the scan). Over the FIXED 16-word vocabulary the df
    # table is O(1) rows and tfidf must track the scan.
    def tfidf_fixed():
        return (
            textstats.tf_idf(fdocs, "doc_id", "text")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("tfidf").alias("mass"),
            )
            .collect()[0]
        )

    out["tfidf_fixedvocab_sec"], row = timed(tfidf_fixed)
    out["tfidf_fixedvocab_terms"] = int(row["n"])
    release_shuffles(spark)
    return out


OPS = (
    "langid_sec", "gopher_sec", "tfidf_sec", "ppl_sec", "ppl_fixedvocab_sec",
    "tfidf_fixedvocab_sec",
)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000, 5_000_000]
    out = {"metric": "text_scale", "unit": "sec", "sizes": {}}
    spark = None
    for n in sizes:
        if spark is not None:
            spark.stop()
        spark = get_session("text-scale-bench")
        spark.sparkContext.setLogLevel("ERROR")
        register_synthetic_docs(spark)
        run_size(spark, 20_000)  # warm the exact shapes off the clock
        out["sizes"][str(n)] = run_size(spark, n)
        print(json.dumps({"partial": n, **out["sizes"][str(n)]}), flush=True)
    ratios, flagged = {}, []
    keys = sorted(out["sizes"], key=int)
    for a, b in zip(keys, keys[1:]):
        sa, sb = out["sizes"][a], out["sizes"][b]
        r: dict = {"data_growth": round(sb["n_docs"] / sa["n_docs"], 1)}
        for k in OPS:
            g = round(sb[k] / max(sa[k], 1e-9), 1)
            r[k.replace("_sec", "_growth")] = g
            if g > 12:
                flagged.append({"step": f"{a}->{b}", "op": k, "growth": g})
        ratios[f"{a}->{b}"] = r
    out["growth"] = ratios
    out["flagged"] = flagged
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
