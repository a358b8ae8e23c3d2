"""Phase attribution for containment_pairs' scale curve (round-8 task:
BENCH_SCALE_r07 showed 8.3x time growth in the 500k->5.5M decade vs
4.4x the decade before — attribute the dominant term).

Times CUMULATIVE plan prefixes of the operator's phases on the same
synthetic corpus the scale bench uses, plus an experimental variant
that hashes gram keys to the portable 60-bit bigint before the posting
join (string 3-gram keys are ~30-40 bytes through TWO corpus-sized
shuffles — the df aggregate and the posting self-join).

Usage: python tools/containment_profile.py [size ...]   (default 500000)
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.functions.portable import md5_i64  # noqa: E402
from ai_etl_pipeline_spark.operators import dedup  # noqa: E402
from ai_etl_pipeline_spark.operators.dedup import doc_shingles  # noqa: E402
from ai_etl_pipeline_spark.session import get_session  # noqa: E402
from ai_etl_pipeline_spark.sources.python_datasource import (  # noqa: E402
    register_synthetic_docs,
)
from tools.dedup_scale_bench import build_corpus, release_shuffles  # noqa: E402


def t(fn):
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 2), n


def profile(spark, n: int) -> dict:
    docs = build_corpus(spark, n).persist()
    n_docs_total = docs.count()
    out = {"n_docs": n_docs_total}
    max_df, ngram = 0.5, 3

    items = doc_shingles(docs, "doc_id", "text", ngram).withColumnRenamed(
        "shingle", "token"
    )
    out["p1_grams_sec"], out["grams"] = t(items.count)
    release_shuffles(spark)

    out["p2_ndocs_sec"], nd = t(docs.select("doc_id").distinct().count)
    hot = (
        items.groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df * nd)
        .select("token")
    )
    out["p3_hot_agg_sec"], out["hot_tokens"] = t(hot.count)
    release_shuffles(spark)

    cand_items = items.join(F.broadcast(hot), "token", "left_anti")
    a = cand_items.withColumnRenamed("doc_id", "id_a")
    b = cand_items.withColumnRenamed("doc_id", "id_b")
    inter_cold = (
        a.join(b, on=["token"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out["p4_posting_join_sec"], out["cand_pairs"] = t(inter_cold.count)
    release_shuffles(spark)

    out["p5_full_op_sec"], out["pairs"] = t(
        lambda: dedup.containment_pairs(
            docs, "doc_id", "text", threshold=0.8, ngram=ngram, max_df=max_df
        ).count()
    )
    release_shuffles(spark)

    # experimental: 8-byte portable-hash keys through the same phases
    hitems = items.select("doc_id", md5_i64(F.col("token")).alias("token"))
    hh = (
        hitems.groupBy("token")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df * nd)
        .select("token")
    )
    hcand = hitems.join(F.broadcast(hh), "token", "left_anti")
    ha = hcand.withColumnRenamed("doc_id", "id_a")
    hb = hcand.withColumnRenamed("doc_id", "id_b")
    hinter = (
        ha.join(hb, on=["token"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out["x_hashed_hot_agg_sec"], _ = t(hh.count)
    release_shuffles(spark)
    out["x_hashed_posting_join_sec"], out["x_cand_pairs"] = t(hinter.count)
    release_shuffles(spark)

    docs.unpersist()
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000]
    for n in sizes:
        spark = get_session(
            "containment-profile",
            extra_conf={
                "spark.io.compression.codec": "zstd",
                "spark.io.compression.zstd.level": "3",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        register_synthetic_docs(spark)
        warm = build_corpus(spark, 500).persist()
        warm.count()
        dedup.containment_pairs(
            warm, "doc_id", "text", threshold=0.8, ngram=3, max_df=0.5
        ).count()
        warm.unpersist()
        print(json.dumps({"size": n, **profile(spark, n)}), flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
