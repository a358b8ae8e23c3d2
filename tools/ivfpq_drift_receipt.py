"""Quantizer-drift DETECTION receipt for incremental IVFADC (r16 — the
r15 verdict's #5): ``ivfpq_index_append``'s contract freezes the
coarse centroids + PQ codebooks, so append ≡ rebuild exactly — but a
distribution-SHIFTED delta is then quantized by codebooks trained on
the old distribution, and the docstring's claim "drift shows up as
falling recall in the recall_report receipt" needs one measured
demonstration to be an operating procedure instead of prose.

Protocol (all deterministic, hash-derived):
1. Train quantizers (√n cells, m=8 PQ) on a hash-ranked sample of the
   BASE corpus (uniform in [-1,1]^64); build the ivfpq index.
2. Measure recall@5 vs brute force for a base-member query panel
   → ``recall_base``.
3. Append a SHIFTED delta (same size as the base, every component
   offset by +1.5 — far outside the training distribution), ids
   disjoint (offset), via ``ivfpq_index_append`` (frozen quantizers).
4. Re-measure the SAME base panel on the appended index
   → ``recall_base_after`` (old-region queries should hold — their
   cells/codes are unchanged and shifted vectors are far away).
5. Measure a panel drawn FROM THE DELTA on the appended index, ground
   truth = brute force over base ∪ delta → ``recall_shifted``. The
   frozen quantizers collapse the shifted region into few cells and
   code it with out-of-distribution codebooks: THIS number falling
   far below recall_base is the retrain trigger.
6. RECOVERY: retrain quantizers on a hash-ranked sample of
   base ∪ delta, full rebuild (the FAISS guidance the append
   docstring cites), re-measure both panels →
   ``recall_shifted_retrained`` / ``recall_base_retrained`` — the
   detect → retrain → recover loop closed in one artifact.

Usage: python tools/ivfpq_drift_receipt.py [n]   (default 200000)
Prints one JSON line; committed as BENCH_SCALE_r{N}_ivfpq_drift.json.
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
SHIFT = 1.5
M_PQ = 8


def build(spark, n: int, id_offset: int = 0, shift: float = 0.0):
    comp = (
        f"(pmod(xxhash64('v', id, d), 2000001) - 1000000) / 1000000.0"
        f" + {shift}"
    )
    return spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> cast({comp} as double))"
        ).alias("embedding"),
    )


def recall(spark, index, cents, books, corpus, panel, nprobe: int) -> int:
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_knn(corpus, panel, k=K).collect()
    }
    # ADC retrieve + exact rerank (the deployment shape): recall then
    # measures whether the TRUE neighbors reached the candidate set —
    # i.e. cell routing + code quality, exactly what drift damages —
    # instead of raw ADC resolution (which is poor on a uniform corpus
    # at any quantizer quality and would mask the drift signal).
    got = similarity.ivfpq_knn(
        corpus, panel, k=K, nprobe=nprobe,
        centroids=cents, codebooks=books, index=index,
        rerank_candidates=64,
    ).collect()
    hits = sum((r.query_id, r.neighbor_id) in truth for r in got)
    return hits * 1_000_000 // max(len(truth), 1)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_session(
        "ivfpq-drift", extra_conf={"spark.io.compression.codec": "zstd"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.monotonic()

    base = build(spark, n).persist()
    base.count()
    cells = similarity.ivf_cells_for(n)
    sample = min(32 * cells, 65536)
    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in similarity.hash_ranked_sample(
            base, "vec_id", sample, corpus_rows=n
        ).collect()
    ]
    cents = similarity.kmeans_centroids_local_np(rows, k=cells, iterations=2)
    books = similarity.pq_train_local(rows, m=M_PQ, codebook_k=16, iterations=2)
    index = similarity.ivfpq_index(base, cents, books)
    index.count()

    panel_base = similarity.hash_ranked_sample(
        base, "vec_id", PANEL, salt="rq|", corpus_rows=n
    ).localCheckpoint()
    nprobe = 8
    recall_base = recall(spark, index, cents, books, base, panel_base, nprobe)

    delta = build(spark, n, id_offset=n, shift=SHIFT).persist()
    delta.count()
    appended = similarity.ivfpq_index_append(index, delta, cents, books)
    full = base.unionByName(delta).persist()
    full.count()

    recall_base_after = recall(
        spark, appended, cents, books, full, panel_base, nprobe
    )
    panel_shift = similarity.hash_ranked_sample(
        delta, "vec_id", PANEL, salt="rq|", corpus_rows=n
    ).localCheckpoint()
    recall_shifted = recall(
        spark, appended, cents, books, full, panel_shift, nprobe
    )

    # how collapsed is the shifted region under the frozen quantizer?
    from ai_etl_pipeline_spark.operators.similarity import ivf_assign_cells

    delta_cells = (
        ivf_assign_cells(
            delta.select("vec_id", F.expr(
                "transform(embedding, x -> cast(x as double))"
            ).alias("dv")), "dv", cents, nprobe=1, out_col="cell",
        ).select("cell").distinct().count()
    )

    # recovery: retrain on the combined distribution, full rebuild
    rows2 = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in similarity.hash_ranked_sample(
            full, "vec_id", sample, corpus_rows=2 * n
        ).collect()
    ]
    cells2 = similarity.ivf_cells_for(2 * n)
    cents2 = similarity.kmeans_centroids_local_np(rows2, k=cells2, iterations=2)
    books2 = similarity.pq_train_local(rows2, m=M_PQ, codebook_k=16, iterations=2)
    rebuilt = similarity.ivfpq_index(full, cents2, books2)
    rebuilt.count()
    recall_shifted_re = recall(
        spark, rebuilt, cents2, books2, full, panel_shift, nprobe
    )
    recall_base_re = recall(
        spark, rebuilt, cents2, books2, full, panel_base, nprobe
    )

    out = {
        "metric": "ivfpq_drift_detection",
        "n_base": n,
        "n_delta": n,
        "shift": SHIFT,
        "cells": cells,
        "nprobe": nprobe,
        "recall_base_micro": recall_base,
        "recall_base_after_append_micro": recall_base_after,
        "recall_shifted_micro": recall_shifted,
        "recall_shifted_retrained_micro": recall_shifted_re,
        "recall_base_retrained_micro": recall_base_re,
        "cells_retrained": cells2,
        "delta_cells_occupied": delta_cells,
        "wall_sec": round(time.monotonic() - t_all, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
