"""Round-7 guard/hardening tests — one test per ADVICE.md item so each
guard has executable evidence:

- decode_bmp truncation + dimension guards (multimodal.py)
- zorder_value runtime range guard (writers.py)
- domain_blocklist_filter shuffled fallback above the broadcast bound
  (textstats.py)
- numeric_profile NULL-coalesce on empty input (distinct.py)
- read_events_stream per-file ts-unit probe: mixed-unit dir and
  missing-ts rejection (streaming/windows.py)
- correlation_matrix with hostile column names (distinct.py)
- minhash_lsh_incremental stale-index schema assertion (dedup.py)
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import dedup, distinct, multimodal, textstats
from ai_etl_pipeline_spark.sources import writers


# ---------------------------------------------------------------------------
# decode_bmp guards
# ---------------------------------------------------------------------------

def _tiny_bmp() -> bytes:
    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    return multimodal.encode_bmp_rgb24(2, 2, rows)


def test_decode_bmp_truncation_guard():
    good = _tiny_bmp()
    assert multimodal.decode_bmp(good)["n_pixels"] == 4
    # strip pixel bytes: header still passes is_bmp, decode must raise
    truncated = good[:-5]
    with pytest.raises(ValueError, match="truncated BMP"):
        multimodal.decode_bmp(truncated)


def test_decode_bmp_dimension_guard():
    import struct

    good = bytearray(_tiny_bmp())
    # lie about width: 2 -> 2^25 (out of the sane range)
    struct.pack_into("<i", good, 18, 1 << 25)
    with pytest.raises(ValueError, match="dimensions out of range"):
        multimodal.decode_bmp(bytes(good))


# ---------------------------------------------------------------------------
# zorder_value range guard
# ---------------------------------------------------------------------------

def test_zorder_value_range_guard(spark):
    ok = spark.createDataFrame([(1, 2), (3, 4)], "x long, y long")
    z = writers.zorder_value(["x", "y"], bits=8)
    assert ok.select(z.alias("z")).count() == 2
    bad = spark.createDataFrame([(1, 2), (300, 4)], "x long, y long")
    with pytest.raises(Exception, match="zorder_value"):
        bad.select(writers.zorder_value(["x", "y"], bits=8).alias("z")).collect()
    neg = spark.createDataFrame([(-1, 2)], "x long, y long")
    with pytest.raises(Exception, match="zorder_value"):
        neg.select(writers.zorder_value(["x", "y"], bits=8).alias("z")).collect()


# ---------------------------------------------------------------------------
# blocklist broadcast threshold fallback
# ---------------------------------------------------------------------------

def test_blocklist_shuffled_fallback_matches_broadcast(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.spam.example/x"),
            (2, "https://ok.example.org/y"),
            (3, "http://deep.a.spam.example/z"),
            (4, "https://fine.net/w"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("spam.example",)], "domain string")
    # bound=0 forces the shuffled fallback; bound=None forces broadcast
    fb = textstats.domain_blocklist_filter(
        docs, "url", bl, broadcast_hits_bound=0
    )
    bc = textstats.domain_blocklist_filter(
        docs, "url", bl, broadcast_hits_bound=None
    )
    assert sorted(r["doc_id"] for r in fb.collect()) == [2, 4]
    assert sorted(r["doc_id"] for r in fb.collect()) == sorted(
        r["doc_id"] for r in bc.collect()
    )
    # keep_blocked inverts both renderings identically
    fb_k = textstats.domain_blocklist_filter(
        docs, "url", bl, keep_blocked=True, broadcast_hits_bound=0
    )
    assert sorted(r["doc_id"] for r in fb_k.collect()) == [1, 3]


# ---------------------------------------------------------------------------
# numeric_profile on empty input
# ---------------------------------------------------------------------------

def test_numeric_profile_empty_input_zero_nulls(spark):
    empty = spark.createDataFrame([], "v double, w long")
    rows = {r["column"]: r for r in distinct.numeric_profile(empty, ["v", "w"]).collect()}
    for c in ("v", "w"):
        assert rows[c]["n"] == 0
        assert rows[c]["nulls"] == 0  # coalesced, not NULL
        assert rows[c]["n_distinct"] == 0
        assert rows[c]["mean"] is None  # value measures stay NULL on empty


# ---------------------------------------------------------------------------
# read_events_stream ts-unit probe (per-file validation)
# ---------------------------------------------------------------------------

def test_events_stream_rejects_mixed_ts_units(spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_etl_pipeline_spark.streaming.windows import read_events_stream

    d = tempfile.mkdtemp(prefix="mixed_ts_")
    try:
        # micros file via pyarrow (us) + nanos file via pyarrow (ns)
        cols = {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
        }
        t_us = pa.table({**cols, "ts": pa.array([1000000], pa.timestamp("us"))})
        t_ns = pa.table({**cols, "ts": pa.array([1000000000], pa.timestamp("ns"))})
        pq.write_table(t_us, os.path.join(d, "micros.parquet"))
        pq.write_table(t_ns, os.path.join(d, "nanos.parquet"))
        with pytest.raises(ValueError, match="mixed ts units"):
            read_events_stream(spark, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_events_stream_rejects_missing_ts(spark):
    from ai_etl_pipeline_spark.streaming.windows import read_events_stream

    d = tempfile.mkdtemp(prefix="no_ts_")
    try:
        spark.createDataFrame([(1,)], "event_id long").write.mode(
            "overwrite"
        ).parquet(d)
        with pytest.raises(ValueError, match="no 'ts' column"):
            read_events_stream(spark, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# correlation_matrix: hostile column names cannot break/inject
# ---------------------------------------------------------------------------

def test_correlation_matrix_hostile_column_names(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 1.5), (2.0, 4.0, 0.5), (3.0, 6.0, 2.5)],
        ["a'); drop", "b`tick", "plain"],
    )
    out = distinct.correlation_matrix(df, ["a'); drop", "b`tick", "plain"]).collect()
    by_pair = {(r["col_x"], r["col_y"]): r["corr"] for r in out}
    assert by_pair[("a'); drop", "b`tick")] == pytest.approx(1.0)
    assert len(by_pair) == 3


# ---------------------------------------------------------------------------
# minhash incremental: stale string-sig index fails loudly
# ---------------------------------------------------------------------------

def test_incremental_rejects_stale_string_sig_index(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    stale = spark.createDataFrame(
        [(1, 0, "deadbeef")], "doc_id long, band int, sig string"
    )
    with pytest.raises(TypeError, match="re-index"):
        dedup.minhash_lsh_incremental(corpus, delta, corpus_bands=stale)
    # and the valid bigint index passes the assertion
    good = dedup.minhash_band_relation(corpus)
    out = dedup.minhash_lsh_incremental(corpus, delta, corpus_bands=good)
    assert out.count() == 1
