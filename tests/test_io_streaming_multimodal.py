"""Sources/sinks (S1-S6), streaming (§2.7), multimodal plumbing."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import multimodal
from ai_etl_pipeline_spark.sources import readers, writers
from ai_etl_pipeline_spark.streaming import windows as sw


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    path = str(tmp_path / "out_csv")
    writers.write_csv(df, path)
    back = readers.read_csv(spark, path)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", "2024"), (2, "y", "2025")], "id int, v string, yr string")
    path = str(tmp_path / "out_parq")
    writers.write_parquet(df, path, partition_by=["yr"])
    assert os.path.isdir(os.path.join(path, "yr=2024"))  # partition pruning layout
    back = readers.read_parquet(spark, path)
    assert back.count() == 2


def test_unsupported_extension_rejected(spark):
    with pytest.raises(ValueError, match="Unsupported file extension"):
        readers.load_source_file(spark, "/tmp/data.docx")  # preprocess.py:25-26


def test_json_checkpoint_timestamp_safe(tmp_path):
    payload = {"when": datetime.datetime(2024, 1, 5, 10, 30), "n": 3}
    path = str(tmp_path / "cp.json")
    writers.store_json_checkpoint(payload, path)
    back = writers.load_json_checkpoint(path)
    assert back == {"when": "2024-01-05T10:30:00", "n": 3}  # preprocess.py:96-98 isoformat


def test_excel_roundtrip_sheet_truncation(spark, tmp_path):
    # runs with openpyxl when present, else the vendored stdlib engine
    df = spark.createDataFrame([(1, "a")], "id bigint, v string")
    path = str(tmp_path / "book.xlsx")
    long_name = "S" * 40
    writers.write_excel_sheets({long_name: df, "Dim": df}, path)
    sheets = readers.read_excel_sheets(spark, path)
    assert set(sheets) == {"S" * 31, "Dim"}  # 31-char Excel limit, mapper.py:134
    assert sheets["Dim"].count() == 1
    rows = sheets["Dim"].collect()
    assert (rows[0]["id"], rows[0]["v"]) == (1, "a")


def test_xlsx_lite_typed_roundtrip(tmp_path):
    from ai_etl_pipeline_spark.sources import _xlsx_lite

    path = str(tmp_path / "lite.xlsx")
    cols = ["i", "f", "s", "b", "n"]
    rows = [
        (1, 2.5, "héllo <&> world", True, None),
        (-7, 0.0, "", False, None),
    ]
    _xlsx_lite.write_xlsx(path, {"T": (cols, rows)})
    back = _xlsx_lite.read_xlsx(path)
    bcols, brows = back["T"]
    assert bcols == cols
    assert brows == [
        (1, 2.5, "héllo <&> world", True, None),
        (-7, 0, "", False, None),  # 0.0 round-trips as int 0 (integral float)
    ]


def test_xlsx_lite_quoted_sheet_name_roundtrip(tmp_path):
    # '"' in a sheet name lands in an XML *attribute*: plain escape()
    # leaves it unescaped and corrupts workbook.xml
    from ai_etl_pipeline_spark.sources import _xlsx_lite

    path = str(tmp_path / "quoted.xlsx")
    name = 'Q3 "final" & <draft>'
    _xlsx_lite.write_xlsx(path, {name: (["a"], [(1,)])})
    back = _xlsx_lite.read_xlsx(path)
    assert list(back) == [name]
    assert back[name] == (["a"], [(1,)])


def test_nanos_parquet_reader(spark, sf_dir):
    ev = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ("ts",))
    # nanos files convert to "timestamp"; micros files read back
    # "timestamp_ntz" untouched — the generator has shipped both units,
    # and session tz is pinned UTC so the wall clock is identical
    assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert ev.count() > 0


def _write_events_fixture(path, unit):
    """Tiny events parquet in the requested ts unit — the generator has
    changed units once (nanos→micros between r3 and r4) and may change
    back, so BOTH renderings stay under test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20 UTC in micros
    ts_us = [base_us + i * 90_000_000 for i in range(8)]  # 90 s apart
    tbl = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(
                [t * 1000 for t in ts_us] if unit == "ns" else ts_us,
                pa.timestamp(unit),
            ),
            "user_id": pa.array([i % 3 for i in range(8)], pa.int64()),
            "event_type": pa.array(["click", "view"] * 4),
            "value": pa.array([float(i) for i in range(8)]),
            "props": pa.array(["{}"] * 8),
        }
    )
    pq.write_table(tbl, path, version="2.6", coerce_timestamps=None)
    return ts_us


def _write_events_at(path, ts_us_list, event_type="click"):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(ts_us_list)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts_us_list, pa.timestamp("us")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array([event_type] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, path, version="2.6")


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """Append-mode windowed agg with a 30-minute watermark across four
    micro-batches: batch 0 fills the anchor window (4 events), batches
    1-2 advance event time +3h (finalizing the anchor window), batch 3
    replays events INSIDE the anchor window — by then they are hours
    older than the watermark and must be DROPPED, so the emitted count
    stays 4 and no second appended row appears.

    The settling batch (file c) matters: the late-row filter of batch N
    uses the watermark computed from data through batch N-2 (one batch
    behind the eviction threshold — measured on this engine), so late
    data arriving in the very batch after the advance is still
    accepted. That lag is why the fixture separates advance and late
    arrival by a batch."""
    import os
    import time

    h = 3_600_000_000  # one hour in micros
    t0 = 1_700_000_000_000_000  # anchor window start (22:13 UTC)
    d = tmp_path / "late"
    d.mkdir()
    files = {
        "a.parquet": [t0, t0 + 60_000_000, t0 + 120_000_000, t0 + 180_000_000],
        "b.parquet": [t0 + 3 * h, t0 + 3 * h + 60_000_000],     # advance
        "c.parquet": [t0 + 3 * h + 120_000_000],                 # settle
        "d.parquet": [t0 + 240_000_000, t0 + 300_000_000],       # LATE
    }
    now = time.time()
    for i, (name, ts) in enumerate(files.items()):
        p = str(d / name)
        _write_events_at(p, ts)
        os.utime(p, (now - 400 + i * 100, now - 400 + i * 100))  # fix order

    stream = sw.read_events_stream(spark, str(d))
    agg = sw.tumbling_window_agg(sw.with_watermark(stream, "30 minutes"), "1 hour")
    out = sw.run_stream_to_memory(agg, "append")
    rows = out.collect()
    # exactly one emitted row: the finalized anchor window with the
    # original 4 events — late replays dropped, +3h window still held
    assert len(rows) == 1
    assert rows[0]["n_events"] == 4


def test_streaming_multi_batch_state_accumulates(spark, tmp_path):
    """Three source files + maxFilesPerTrigger=1 → three real
    micro-batches; the complete-mode tumbling aggregate must equal the
    batch answer over ALL files, proving window state survives and
    merges across triggers (a single-file stream never exercises
    this)."""
    d = tmp_path / "ev_multi"
    d.mkdir()
    for part in range(3):
        _write_events_fixture(str(d / f"part{part}.parquet"), "us")
    stream = sw.read_events_stream(spark, str(d))
    result = sw.run_stream_to_memory(sw.tumbling_window_agg(stream, "1 hour"), "complete")
    batch = sw.tumbling_window_agg(
        readers.read_parquet_nanos_ts(spark, str(d), ("ts",)), "1 hour"
    )
    got = sorted(map(str, result.collect()))
    want = sorted(map(str, batch.collect()))
    assert got == want
    # the three identical files triple every count
    assert result.agg(F.sum("n_events")).first()[0] == 24


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_event_readers_unit_adaptive(spark, tmp_path, unit):
    """Batch AND stream readers must produce the same wall-clock
    timestamps whether the file stores TIMESTAMP(NANOS) or micros —
    the r4 regression was the stream reader dividing micros by 1000."""
    d = tmp_path / f"ev_{unit}"
    d.mkdir()
    path = str(d / "events.parquet")
    ts_us = _write_events_fixture(path, unit)

    # compare epoch-micros Spark-side (session tz is UTC in conftest;
    # collect-side datetime conversion would depend on driver-local tz)
    us = F.unix_micros(F.col("ts").cast("timestamp")).alias("us")

    batch = readers.read_parquet_nanos_ts(spark, path, ("ts",))
    assert sorted(r["us"] for r in batch.select(us).collect()) == sorted(ts_us)

    stream = sw.read_events_stream(spark, path)
    streamed = sw.run_stream_to_memory(stream.select("ts"), "append")
    assert sorted(r["us"] for r in streamed.select(us).collect()) == sorted(ts_us)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, f"{sf_dir}/events.parquet")
    result = sw.run_stream_to_memory(sw.tumbling_window_agg(stream, "1 hour"), "complete")
    batch_ev = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ("ts",))
    batch = sw.tumbling_window_agg(batch_ev, "1 hour")
    assert sorted(map(str, result.collect())) == sorted(map(str, batch.collect()))


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    clicks_s = sw.read_events_stream(spark, path).where(F.col("event_type") == "click")
    buys_s = sw.read_events_stream(spark, path).where(F.col("event_type") == "purchase")
    joined = sw.stream_stream_interval_join(clicks_s, buys_s, within="10 minutes")
    streamed = sw.run_stream_to_memory(joined, "append")

    ev = readers.read_parquet_nanos_ts(spark, path, ("ts",))
    batch = sw.stream_stream_interval_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        within="10 minutes",
    )
    assert sorted(map(str, streamed.collect())) == sorted(map(str, batch.collect()))


def test_stream_static_enrich_equals_batch_and_broadcasts(spark, sf_dir):
    dim = spark.createDataFrame(
        [("click", "browse"), ("purchase", "transact")],
        "event_type string, category string",
    )
    stream = sw.read_events_stream(spark, f"{sf_dir}/events.parquet")
    enriched = sw.stream_static_enrich(stream, dim, "event_type")
    streamed = sw.run_stream_to_memory(enriched, "append")
    got = {r["category"]: r["n"] for r in streamed.groupBy("category").agg(F.count("*").alias("n")).collect()}

    ev = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ("ts",))
    batch = sw.stream_static_enrich(ev, dim, "event_type")
    # the dim side is a broadcast hash join — no fact-side shuffle
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    want = {r["category"]: r["n"] for r in batch.groupBy("category").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_streaming_dedup_bounded_state(spark, sf_dir):
    stream = sw.read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = sw.run_stream_to_memory(sw.streaming_dedup(stream, ["event_id"], "60 minutes"), "append")
    n = out.count()
    batch_n = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet").count()
    assert n == batch_n  # event_id unique -> nothing dropped


def test_session_window_agg_batch(spark, sf_dir):
    ev = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ("ts",))
    native = sw.session_window_agg(ev, "5 minutes")
    manual = sw.sessionize_batch(ev, 5)
    # both formulations agree on the number of sessions per user
    a = {(r["user_id"],): 0 for r in native.collect()}
    assert native.count() == manual.count()


def test_watermark_marker(spark, sf_dir):
    stream = sw.read_events_stream(spark, f"{sf_dir}/events.parquet")
    wm = sw.with_watermark(stream, "10 minutes")
    assert wm.isStreaming


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    # REAL late-data semantics (r10 verdict #4): three mtime-ordered
    # files = three micro-batches. Batch 1 sets max event time 01:00
    # (watermark 00:50 for batch 2); batch 2's end-of-batch eviction
    # finalizes window [00:00, 00:10); batch 3 replays an event at
    # 00:05 — older than the operative watermark, targeting an evicted
    # window — which the aggregation must DROP, plus a fresh in-
    # watermark event at 01:06. Append mode must emit exactly the
    # windows with end <= final watermark, late row absent.
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )

    def write(path, rows):
        df = pd.DataFrame(rows, columns=[f.name for f in schema])
        df["ts"] = pd.to_datetime(df["ts"])
        pq.write_table(pa.Table.from_pandas(df, schema=schema), path)

    src = tmp_path / "late_src"
    src.mkdir()
    a, b, c = (str(src / f"{n}.parquet") for n in "abc")
    write(a, [(1, "2024-01-01 00:02:00", 7, "view", 1.0, ""),
              (2, "2024-01-01 00:07:00", 7, "view", 2.0, ""),
              (3, "2024-01-01 01:00:00", 7, "view", 4.0, "")])
    write(b, [(5, "2024-01-01 01:05:00", 7, "view", 16.0, "")])
    write(c, [(4, "2024-01-01 00:05:00", 7, "view", 8.0, ""),   # LATE
              (6, "2024-01-01 01:06:00", 7, "view", 32.0, "")])
    for i, f in enumerate((a, b, c)):
        os.utime(f, (1_700_000_000 + 100 * i,) * 2)

    stream = sw.read_events_stream(spark, str(src))
    agg = sw.tumbling_window_agg(sw.with_watermark(stream, "10 minutes"), "10 minutes")
    out = sw.run_stream_to_memory(agg, "append")
    rows = out.collect()

    # exactly one finalized window: [00:00, 00:10) with batch-1 rows
    # only — the late 8.0 event was dropped, NOT merged or re-emitted
    assert len(rows) == 1
    r = rows[0]
    assert r["window_start"].minute == 0 and r["window_start"].hour == 0
    assert r["n_events"] == 2
    assert r["sum_value"] == 3.0
    # the [01:00, 01:10) window (end > final watermark 00:56) must
    # still be held in state, not emitted
    assert all(row["window_start"].hour == 0 for row in rows)

    # batch-oracle cross-check: the same aggregation over the
    # non-late rows, restricted to windows the watermark finalized
    batch = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 0, 2), 7, "view", 1.0, ""),
         (2, datetime.datetime(2024, 1, 1, 0, 7), 7, "view", 2.0, ""),
         (3, datetime.datetime(2024, 1, 1, 1, 0), 7, "view", 4.0, ""),
         (5, datetime.datetime(2024, 1, 1, 1, 5), 7, "view", 16.0, ""),
         (6, datetime.datetime(2024, 1, 1, 1, 6), 7, "view", 32.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    final_wm = datetime.datetime(2024, 1, 1, 0, 56)
    want = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in sw.tumbling_window_agg(batch, "10 minutes")
        .where(F.col("window_end") <= F.lit(final_wm))
        .collect()
    )
    got = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in rows
    )
    assert got == want


def test_multimodal_features_deterministic(spark):
    df = spark.createDataFrame([(0, "hello world"), (1, "spark")], "doc_id long, text string")
    media = multimodal.documents_as_media(df)
    feats = multimodal.extract_features(media, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows[0]["feature"]) == 8
    again = {r["media_id"]: r for r in multimodal.extract_features(media, dim=8).collect()}
    assert rows[0]["feature"] == again[0]["feature"]  # deterministic stub
    assert rows[0]["content_sha"] != rows[1]["content_sha"]


def test_multimodal_strict_decode_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"bytes", "image", strict=True)


def test_mjpeg_split_and_video_frames(spark):
    # three block-constant gray frames, concatenated = raw MJPEG
    def frame(val):
        px = [[val] * 8 for _ in range(8)]
        return multimodal.encode_jpeg_gray8(8, 8, px)

    frames = [frame(10), frame(20), frame(30)]
    blob = b"".join(frames)
    got = multimodal.split_mjpeg_frames(blob)
    assert got == frames  # marker walk recovers exact frame boundaries
    # a DQT-like payload containing FFD8 must not fool the splitter:
    # frame bytes themselves contain no spurious split (round-trip above
    # already proves it); malformed input raises
    with pytest.raises(ValueError):
        multimodal.split_mjpeg_frames(blob + b"\xff\xd8\xff")  # truncated
    with pytest.raises(ValueError):
        multimodal.split_mjpeg_frames(b"\x00\x01")

    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    out = multimodal.extract_video_frames(media, every_n=2).collect()
    rows = {r["frame_no"]: r for r in out}
    assert sorted(rows) == [0, 2]  # frames 0 and 2 sampled, 1 skipped
    assert all(r["n_frames"] == 3 for r in out)
    assert rows[0]["mean_r"] == 10.0 and rows[2]["mean_r"] == 30.0


def test_wav_roundtrip_exact_samples():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    blob = multimodal.encode_wav_pcm16(samples, 16000)
    assert multimodal.is_wav(blob) and not multimodal.is_wav(b"RIFFxxxx")
    d = multimodal.decode_wav(blob)
    assert d["n_channels"] == 1 and d["sample_rate"] == 16000
    assert d["n_samples"] == len(samples)
    assert d["peak"] == 32768  # abs(-32768)
    import math

    assert d["rms"] == round(math.sqrt(sum(s * s for s in samples) / len(samples)), 3)


def test_wav_decode_is_real_even_in_strict_mode():
    blob = multimodal.encode_wav_pcm16([100, -100], 8000)
    feats = multimodal.decode_media(blob, "audio", dim=8, strict=True)
    assert feats[0] == 1.0 and feats[1] == 8000.0 and feats[2] == 2.0
    # non-WAV still raises in strict mode
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"not audio at all" * 4, "audio", strict=True)


def test_bmp_roundtrip_exact_channel_means():
    # 3x2 image with known pixels; stride padding (3*3=9 -> 12) exercised
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    blob = multimodal.encode_bmp_rgb24(3, 2, rows)
    assert multimodal.is_bmp(blob) and not multimodal.is_bmp(b"PNG...whatever")
    d = multimodal.decode_bmp(blob)
    assert (d["width"], d["height"], d["bpp"], d["n_pixels"]) == (3, 2, 24, 6)
    flat = [p for r in rows for p in r]
    assert d["mean_r"] == round(sum(p[0] for p in flat) / 6, 3)
    assert d["mean_g"] == round(sum(p[1] for p in flat) / 6, 3)
    assert d["mean_b"] == round(sum(p[2] for p in flat) / 6, 3)


def test_bmp_decode_dispatch_and_strict():
    blob = multimodal.encode_bmp_rgb24(2, 1, [[(1, 2, 3), (5, 6, 7)]])
    feats = multimodal.decode_media(blob, "image", dim=8, strict=True)
    assert feats[:4] == [2.0, 1.0, 24.0, 2.0]
    assert feats[4] == 3.0  # mean_r of (1,5)


def test_gif_roundtrip_exact_channel_means():
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (255, 0, 0)],
    ]
    blob = multimodal.encode_gif_rgb24(3, 2, rows)
    assert multimodal.is_gif(blob) and not multimodal.is_gif(b"BM...whatever" * 2)
    d = multimodal.decode_gif(blob)
    assert (d["width"], d["height"], d["n_pixels"]) == (3, 2, 6)
    flat = [p for r in rows for p in r]
    assert d["mean_r"] == round(sum(p[0] for p in flat) / 6, 3)
    assert d["mean_g"] == round(sum(p[1] for p in flat) / 6, 3)
    assert d["mean_b"] == round(sum(p[2] for p in flat) / 6, 3)


def test_gif_large_palette_and_clear_cadence():
    # 16x16 image, 256 distinct colors -> 8-bit codes, 9-bit LZW width,
    # multiple CLEAR resets and >255-byte sub-block splitting exercised
    rows = [
        [((y * 16 + x), (y * 16 + x) * 3 % 256, 255 - (y * 16 + x)) for x in range(16)]
        for y in range(16)
    ]
    d = multimodal.decode_gif(multimodal.encode_gif_rgb24(16, 16, rows))
    flat = [p for r in rows for p in r]
    assert d["n_pixels"] == 256
    assert d["mean_r"] == round(sum(p[0] for p in flat) / 256, 3)
    assert d["mean_b"] == round(sum(p[2] for p in flat) / 256, 3)


def test_gif_guards():
    blob = multimodal.encode_gif_rgb24(2, 2, [[(1, 2, 3), (4, 5, 6)]] * 2)
    with pytest.raises(ValueError, match="not a GIF"):
        multimodal.decode_gif(b"JUNK" * 10)
    with pytest.raises(ValueError):
        multimodal.decode_gif(blob[:-6])  # truncated: trailer+EOI gone
    with pytest.raises(ValueError, match="palette overflow"):
        multimodal.encode_gif_rgb24(
            32, 32, [[(x, y, (x * y) % 256) for x in range(32)] for y in range(32)]
        )


def test_extract_image_features_decodes_gif(spark):
    blob = multimodal.encode_gif_rgb24(2, 2, [[(9, 9, 9)] * 2] * 2)
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(b"not an image" * 5))],
        "media_id long, content binary",
    )
    out = multimodal.extract_image_features(df).collect()
    assert [r["media_id"] for r in out] == [0]
    assert out[0]["n_pixels"] == 4 and out[0]["mean_g"] == 9.0


def test_extract_image_features_skips_non_bmp(spark):
    blob = multimodal.encode_bmp_rgb24(2, 2, [[(9, 9, 9)] * 2] * 2)
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(b"not an image" * 5))],
        "media_id long, content binary",
    )
    out = multimodal.extract_image_features(df).collect()
    assert [r["media_id"] for r in out] == [0]
    assert out[0]["n_pixels"] == 4 and out[0]["mean_r"] == 9.0


def test_extract_audio_features_skips_non_wav(spark):
    blob = multimodal.encode_wav_pcm16([5, -5, 7], 8000)
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(b"plain text payload" * 4))],
        "media_id long, content binary",
    )
    out = multimodal.extract_audio_features(df).collect()
    assert [r["media_id"] for r in out] == [0]
    assert out[0]["n_samples"] == 3 and out[0]["peak"] == 7


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(0, "x" * 200)], "doc_id long, text string")
    media = multimodal.documents_as_media(df)
    frames = multimodal.frame_sample_plan(media, every_n=2, bytes_per_frame=64)
    got = [r["frame_no"] for r in frames.collect()]
    assert got == [0, 2]  # 200 bytes -> 4 fake frames -> sample 0,2


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    from ai_etl_pipeline_spark.streaming.stateful import running_user_totals

    stream = sw.read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = sw.run_stream_to_memory(running_user_totals(stream), "update")
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out.collect()}
    ev = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ("ts",))
    exp = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    assert got == exp


def test_translate_one_fallback():
    from ai_etl_pipeline_spark.semantic.providers import HeuristicProvider, translate_one

    p = HeuristicProvider(translation_overlay={"hola": "hello"})
    assert translate_one("hola", p) == "hello"
    assert translate_one("unknown", p) == "unknown"

    class Broken:
        def translate_batch(self, values):
            raise RuntimeError("down")

    assert translate_one("x", Broken()) == "x"  # translate.py:145-149


def test_sampling_helpers(spark, documents):
    from ai_etl_pipeline_spark.operators import distinct

    sample = distinct.head_sample(documents, 2)
    assert len(sample["doc_id"]) == 2
    rnd = distinct.random_value_sample(documents, "lang", 3, seed=42)
    assert len(rnd) == 3
    assert rnd == distinct.random_value_sample(documents, "lang", 3, seed=42)  # seeded


def test_python_datasource_partitioned_generator(spark):
    """Spark-4 custom Python DataSource: N rows across P independent
    splits, deterministic content, no driver materialization."""
    from ai_etl_pipeline_spark.sources.python_datasource import (
        register_synthetic_docs,
    )

    register_synthetic_docs(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 57)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 57
    assert sorted(r["doc_id"] for r in rows) == list(range(57))
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["n_chars"] == len(by_id[0]["text"])
    # deterministic: a second read yields identical content
    again = spark.read.format("synthetic_docs").option("n", 57).load().collect()
    assert {r["doc_id"]: r["text"] for r in again} == {
        r["doc_id"]: r["text"] for r in rows
    }


def test_xlsx_lite_reads_shared_strings(tmp_path):
    """Files produced by real Excel/openpyxl store text in a
    sharedStrings part (not inline) — build one by hand and read it."""
    import zipfile

    from ai_etl_pipeline_spark.sources import _xlsx_lite

    path = str(tmp_path / "shared.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _xlsx_lite._CONTENT_TYPES.format(
            sheet_overrides='<Override PartName="/xl/worksheets/sheet1.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        ))
        zf.writestr("_rels/.rels", _xlsx_lite._ROOT_RELS)
        zf.writestr(
            "xl/workbook.xml",
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<si><t>name</t></si><si><r><t>sp</t></r><r><t>lit</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            '<sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7</v></c></row>'
            "</sheetData></worksheet>",
        )
    cols, rows = _xlsx_lite.read_xlsx(path)["S"]
    assert cols == ["name", "col1"]          # ragged header padded
    assert rows == [("split", 7)]            # multi-run si concatenated


def test_streaming_file_sink_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Durable sink semantics: parquet sink + checkpointLocation gives
    exactly-once file output; re-running the query against the same
    checkpoint (no new source files) must append NOTHING."""
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    def run_once():
        stream = sw.read_events_stream(spark, f"{sf_dir}/events.parquet")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # same checkpoint: source offset already committed
    n2 = spark.read.parquet(out).count()
    batch_n = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet").count()
    assert n1 == n2 == batch_n


def test_streaming_foreachbatch_upsert_keyed_state(spark, sf_dir, tmp_path):
    """Streaming CDC sink: foreachBatch + cdc.merge_upsert maintain a
    keyed latest-state table (one row per user, latest event wins)
    across micro-batches — the standard 'streaming upsert into a
    snapshot' pattern. End state must equal the batch answer."""
    from ai_etl_pipeline_spark.operators import cdc

    state_dir = str(tmp_path / "state")
    cp = str(tmp_path / "cp")

    def upsert(batch_df, batch_id):
        changes = batch_df.select("user_id", "ts", "event_type", "value")
        try:
            base = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            base = changes.limit(0)
        # compact the batch first (max-ts row per key), then merge — the
        # skew-safe order the cdc module documents; ts ties break on the
        # incoming side, matching the batch oracle's last-wins ordering
        merged = cdc.merge_upsert(base, changes, ["user_id"], "ts")
        merged.write.mode("overwrite").parquet(state_dir + ".tmp")
        batch_df.sparkSession.read.parquet(state_dir + ".tmp").write.mode(
            "overwrite"
        ).parquet(state_dir)

    stream = sw.read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r.user_id: r.ts for r in spark.read.parquet(state_dir).collect()}
    batch = readers.read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet")
    want = {
        r.user_id: r.mx
        for r in batch.groupBy("user_id").agg(F.max("ts").alias("mx")).collect()
    }
    assert got == want


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    from ai_etl_pipeline_spark.sources.writers import compact_parquet

    path = str(tmp_path / "fragmented")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(24).write.parquet(path)
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 24
    rows_before = spark.read.parquet(path).count()
    after = compact_parquet(spark, path, target_files=2)
    assert after == 2
    assert spark.read.parquet(path).count() == rows_before
    # content identical, not just counts
    assert (
        spark.read.parquet(path)
        .exceptAll(orders)
        .count()
        == 0
    )
