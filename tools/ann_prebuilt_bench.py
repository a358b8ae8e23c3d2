"""Per-batch query cost for the sign-LSH tier with a CALLER-OWNED
prebuilt index (r16 — the r15 verdict's one weak mark made measurable):
the r15 frontier showed each ``lsh_knn`` call paying 20–23 s per
64-query panel at 20M vectors, dominated by re-running the sizing
aggregate and rebucketing the corpus. With :func:`similarity.lsh_index`
that O(corpus) work is BUILD cost paid once; this receipt times

- ``inline_sec``:  one index-less ``lsh_knn`` panel (the old shape);
- ``build_sec``:   ``lsh_index`` build + materialization (sizing
  aggregate, bucket hash, repartition+sort by bucket, cache fill);
- ``batch_secs``:  THREE successive disjoint 64-query panels through
  ``lsh_knn(index=)`` — each pays only its probe hash, the
  probed-bucket pushdown against the bucket-sorted cached layout
  (batch-stats pruning), and candidate scoring.

The claim to check across sizes (2M / 20M): batch_secs stay far below
inline_sec and roughly flat per decade — the per-batch path's scan is
bounded by probed buckets, not corpus rows — while build_sec absorbs
the O(n) work a deployment amortizes over every batch.

Usage: python tools/ann_prebuilt_bench.py [n]   (default 2000000)
Prints one JSON line; committed as BENCH_SCALE_r{N}_ann_prebuilt.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ai_etl_pipeline_spark.operators import similarity  # noqa: E402
from ai_etl_pipeline_spark.session import get_session  # noqa: E402

DIM = 64
PANEL = 64
K = 5
BATCHES = 3


def build_corpus(spark, n: int):
    comp = "(pmod(xxhash64('v', id, d), 2000001) - 1000000) / 1000000.0"
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> cast({comp} as double))"
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_session(
        "ann-prebuilt-bench",
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = build_corpus(spark, n).persist()
    n_rows = emb.count()

    panels = [
        similarity.hash_ranked_sample(
            emb, "vec_id", PANEL, salt=f"pb{i}|", corpus_rows=n_rows
        ).localCheckpoint()
        for i in range(BATCHES)
    ]

    # the old shape: every call re-sizes + rebuckets the corpus
    t0 = time.monotonic()
    inline_rows = similarity.lsh_knn(
        emb, panels[0], k=K, multiprobe="auto"
    ).count()
    inline_sec = round(time.monotonic() - t0, 2)

    # build once (sizing + bucket hash + repartition/sort + cache fill)
    t0 = time.monotonic()
    idx = similarity.lsh_index(emb)
    idx.buckets.count()
    build_sec = round(time.monotonic() - t0, 2)

    batch = []
    first_rows = None
    for i, panel in enumerate(panels):
        t0 = time.monotonic()
        got = similarity.lsh_knn(
            emb, panel, k=K, multiprobe="auto", index=idx
        ).count()
        batch.append(round(time.monotonic() - t0, 2))
        if i == 0:
            first_rows = got
    # the amortized path must return exactly what the inline path did
    assert first_rows == inline_rows, (first_rows, inline_rows)

    out = {
        "metric": "ann_prebuilt_lsh",
        "n_vectors": n_rows,
        "panel": PANEL,
        "k": K,
        "num_bits": idx.num_bits,
        "inline_sec": inline_sec,
        "build_sec": build_sec,
        "batch_secs": batch,
        "result_rows": inline_rows,
    }
    idx.buckets.unpersist()
    emb.unpersist()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
