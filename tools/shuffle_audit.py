"""Shuffle-bytes audit: the 100 TB receipt the wall-clock bench can't give.

Wall time at sf0.1 on local[32] hides the quantity that actually decides
whether a plan survives a 1000-executor 100 TB run: how many bytes each
query puts through the shuffle relative to what it reads. A query that
reads 100 MB and shuffles 2 GB is fine on one box and a cluster-killer at
scale; a query that shuffles less than it reads is network-safe at any
size.

This tool runs EVERY registry query once at $SPARK_GRAFT_SF_DIR (default
sf0.1) with the Spark UI status store enabled, and attributes per-stage
metrics (input / shuffle read / shuffle write / memory+disk spill) to the
query that scheduled the stage, via new-stage-id diffing against the
app's /api/v1 stage list — no listener jar, no event-log parsing. Output:

  SHUFFLE_AUDIT.json
    per-query: wall_s, input_mb, shuffle_write_mb, shuffle_read_mb,
               spill_mb, n_stages, write_amp (shuffle_write / input)
    summary:   totals, flagged list (write_amp > AMP_LIMIT and
               shuffle_write > ABS_FLOOR, minus ATTRIBUTED families),
               attributed-but-amplified list with the written reason

Attribution ledger: iterative graph ops (k rounds of edge-sized
shuffles), recall receipts (run two full pipelines by design), and
sort/repartition layout ops (whose OUTPUT is the shuffle) legitimately
amplify — they are listed with reasons instead of flagged, so the flag
list stays a real alarm, not noise.

Usage: python tools/shuffle_audit.py [--only q_a,q_b] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMP_LIMIT = 3.0          # shuffle_write > 3x input is worth a look
ABS_FLOOR = 32 * 2**20   # ...but only if it's real volume (32 MB)

# Families where shuffle >> input is the algorithm, not a plan bug.
# Prefix-matched against query names; each entry carries the reason the
# amplification is inherent AND why it still scales (bounded rounds /
# bounded candidate sets / output-sized shuffles).
ATTRIBUTED: dict[str, str] = {
    "q_graph_pagerank": "iterative: k rounds of edge-sized rank exchange; "
    "rounds fixed (4/8), per-round volume O(edges) — linear in input at any scale",
    "q_graph_components": "pointer-halving: O(log n) rounds of edge-sized "
    "label exchange; volume O(edges * log n)",
    "q_graph_kcore": "iterative peel: bounded rounds of edge-sized degree "
    "exchange until fixpoint",
    "q_graph_khop": "k BFS rounds, frontier join per round; volume O(edges * k)",
    "q_graph_communities": "label propagation rounds over the LSH-blocked "
    "edge set; volume O(edges * rounds)",
    "q_graph_triangles": "degree-ordered wedge join shuffles the oriented "
    "edge list twice; O(m^1.5) work is the algorithm's lower bound",
    "q_graph_link_prediction": "wedge self-join on hub-capped adjacency; "
    "candidate volume bounded by the cap, not the corpus",
    "q_graph_hits": "iterative: k rounds of edge-sized hub/authority exchange",
    "q_dedup_lsh_recall": "recall receipt runs TWO full dedup pipelines "
    "(LSH + exact ground truth) by construction",
    "q_knn_recall_report": "recall receipt runs the index path AND the "
    "exact ground-truth path by construction",
    "q_dedup_cross_source": "source-pair matrix joins each band bucket "
    "across sources; candidate-sized, bounded by band collisions",
    "q_sort_": "global sort: the shuffle IS the operator (range exchange)",
    "q_layout_zorder": "layout rewrite: the clustered write is the product; "
    "shuffle volume = table volume by definition",
    "q_layout_hilbert": "layout rewrite: clustered write is the product",
    "q_repartition": "explicit repartition receipt",
    "q_shard_": "shard write: the exchange is the product",
}


def _attribution(name: str) -> str | None:
    for prefix, why in ATTRIBUTED.items():
        if name.startswith(prefix):
            return why
    return None


class StageStore:
    """Minimal client for the local app's /api/v1 stage list."""

    def __init__(self, ui_port: int = 4040):
        self.base = f"http://localhost:{ui_port}/api/v1"
        apps = self._get("/applications")
        self.app_id = apps[0]["id"]

    def _get(self, path: str):
        with urllib.request.urlopen(self.base + path, timeout=10) as r:
            return json.loads(r.read())

    def stages(self) -> dict[tuple[int, int], dict]:
        # ?details=false keeps the payload bounded at tens of KB even
        # with thousands of retained stages
        data = self._get(f"/applications/{self.app_id}/stages?details=false")
        return {(s["stageId"], s["attemptId"]): s for s in data}


METRICS = {
    "input_bytes": "inputBytes",
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "mem_spill_bytes": "memoryBytesSpilled",
    "disk_spill_bytes": "diskBytesSpilled",
}


def _settled_stages(store: StageStore) -> dict[tuple[int, int], dict]:
    """The status store updates off the event bus asynchronously; poll
    until no stage is ACTIVE/PENDING and the snapshot is stable.

    Stability requires the METRIC PAYLOADS — not just the stage-ID
    set — to be unchanged between consecutive polls: per-stage metric
    values keep draining from the event bus after a stage completes,
    and accepting a key-stable-but-value-moving snapshot attributes
    the late-arriving bytes to the NEXT query (or loses them),
    skewing write-amplification."""

    def signature(snap):
        return {
            k: tuple(s.get(v) for v in METRICS.values())
            for k, s in snap.items()
        }

    prev = None
    for _ in range(50):
        snap = store.stages()
        busy = any(s["status"] in ("ACTIVE", "PENDING") for s in snap.values())
        if not busy and prev is not None and signature(snap) == prev:
            return snap
        prev = signature(snap)
        time.sleep(0.1)
    return store.stages()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SHUFFLE_AUDIT.json"))
    args = ap.parse_args()
    only = {q for q in args.only.split(",") if q}

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ai_etl_pipeline_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session(
        "shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            # the audit diffs NEW stage ids per query, so eviction of old
            # stages is harmless — but keep one query's stages alive
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm-up

    store = StageStore(int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]))
    qs = entrymod.queries()
    per_query: dict[str, dict] = {}
    seen = set(_settled_stages(store))

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        snap = _settled_stages(store)
        new = [s for k, s in snap.items() if k not in seen]
        seen |= set(snap)
        rec = {"wall_s": round(wall, 3), "n_stages": len(new)}
        for out_key, api_key in METRICS.items():
            rec[out_key] = sum(int(s.get(api_key, 0) or 0) for s in new)
        inp = rec["input_bytes"]
        rec["write_amp"] = round(rec["shuffle_write_bytes"] / inp, 3) if inp else None
        per_query[name] = rec
        print(
            f"# {name}: in={inp/2**20:.1f}MB "
            f"sw={rec['shuffle_write_bytes']/2**20:.1f}MB "
            f"sr={rec['shuffle_read_bytes']/2**20:.1f}MB "
            f"spill={(rec['mem_spill_bytes']+rec['disk_spill_bytes'])/2**20:.1f}MB "
            f"stages={len(new)} {wall:.1f}s",
            file=sys.stderr,
        )

    flagged, attributed_hot = [], []
    for name, rec in per_query.items():
        hot = (
            rec["shuffle_write_bytes"] > ABS_FLOOR
            and rec["input_bytes"] > 0
            and rec["shuffle_write_bytes"] > AMP_LIMIT * rec["input_bytes"]
        )
        if not hot:
            continue
        why = _attribution(name)
        if why is None:
            flagged.append(name)
        else:
            attributed_hot.append({"query": name, "why": why})

    totals = {
        k: sum(r[k] for r in per_query.values())
        for k in ("input_bytes", "shuffle_read_bytes", "shuffle_write_bytes",
                  "mem_spill_bytes", "disk_spill_bytes")
    }
    out = {
        "metric": "shuffle_audit",
        "sf_dir": sf_dir,
        "amp_limit": AMP_LIMIT,
        "abs_floor_bytes": ABS_FLOOR,
        "n_queries": len(per_query),
        "totals": totals,
        "flagged": sorted(flagged),
        "attributed_amplified": sorted(attributed_hot, key=lambda d: d["query"]),
        "queries": per_query,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
    print(json.dumps({
        "metric": "shuffle_audit",
        "n_queries": len(per_query),
        "total_input_mb": round(totals["input_bytes"] / 2**20, 1),
        "total_shuffle_write_mb": round(totals["shuffle_write_bytes"] / 2**20, 1),
        "total_spill_mb": round(
            (totals["mem_spill_bytes"] + totals["disk_spill_bytes"]) / 2**20, 1),
        "flagged": sorted(flagged),
        "n_attributed_amplified": len(attributed_hot),
        "detail": os.path.basename(args.out),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
