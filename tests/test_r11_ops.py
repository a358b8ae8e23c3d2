"""Round-11 operators: Hilbert layout, compaction planner, readability,
BMP resize, touch attribution, calibration."""

import datetime

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import behavior, layout, multimodal, validate


def test_hilbert_key_is_a_unit_step_path(spark):
    # the defining Hilbert property: sorting the 2^b x 2^b grid by key
    # yields a Hamiltonian path of unit steps (Morton keys jump) — and
    # the keys are a permutation of 0..4^b-1
    bits = 3
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    keyed = layout.hilbert_key(grid, ["x", "y"], bits=bits, key_col="d")
    rows = {r["d"]: (r["x"], r["y"]) for r in keyed.collect()}
    assert sorted(rows) == list(range(n * n))
    for i in range(n * n - 1):
        (x0, y0), (x1, y1) = rows[i], rows[i + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, f"jump at d={i}"


def test_hilbert_key_validation(spark):
    grid = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="exactly 2"):
        layout.hilbert_key(grid, ["a", "b", "c"])
    with pytest.raises(ValueError, match="exceeds int64"):
        layout.hilbert_key(grid, ["a", "b"], bits=32)


def test_compaction_plan_packs_per_directory(spark):
    man = spark.createDataFrame(
        [
            ("d1", "a", 60), ("d1", "b", 30), ("d1", "c", 30), ("d1", "d", 500),
            ("d1", "e", 10),
            ("d2", "a", 10),
        ],
        "dir string, path string, size_bytes long",
    )
    plan = {
        (r["dir"], r["path"]): r
        for r in layout.compaction_plan(man, target_bytes=100).collect()
    }
    # d1 in path order: a(60) b(30) c(30) d(500) e(10) with prefix sums
    # 0/60/90/120/620 -> groups 0,0,0,1,6
    assert plan[("d1", "a")]["compact_group"] == 0
    assert plan[("d1", "b")]["compact_group"] == 0
    assert plan[("d1", "c")]["compact_group"] == 0
    assert plan[("d1", "d")]["compact_group"] == 1  # oversized: own group
    assert plan[("d1", "e")]["compact_group"] == 6
    assert plan[("d1", "a")]["group_bytes"] == 120
    assert plan[("d1", "a")]["group_files"] == 3
    # directories plan independently
    assert plan[("d2", "a")]["compact_group"] == 0
    with pytest.raises(ValueError, match="positive"):
        layout.compaction_plan(man, target_bytes=0)


def test_readability_known_text(spark):
    from ai_etl_pipeline_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "doc_id long, text string"
    )
    r = textstats.readability_report(df).collect()[0]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    # vowel groups: e, a, a, e, o, a -> 6
    assert r["n_syllables"] == 6
    # flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6)
    assert r["flesch"] == round(206.835 - 1.015 * 3 - 84.6, 4)


def test_resize_bmp_nearest_neighbor_exact():
    # 4x2 image, resize to 2x1: samples (0,0) and (2,0)
    px = [
        [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)],
        [(0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3)],
    ]
    blob = multimodal.encode_bmp_rgb24(4, 2, px)
    d = multimodal.resize_bmp(blob, 2, 1)
    assert (d["src_width"], d["src_height"]) == (4, 2)
    assert (d["width"], d["height"]) == (2, 1)
    assert d["mean_r"] == (10 + 70) / 2
    assert d["mean_g"] == (20 + 80) / 2
    assert d["mean_b"] == (30 + 90) / 2
    with pytest.raises(ValueError, match=">= 1x1"):
        multimodal.resize_bmp(blob, 0, 1)
    with pytest.raises(ValueError, match="not a BMP"):
        multimodal.resize_bmp(b"nope", 2, 2)


def test_touch_attribution_first_and_last(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    ev = spark.createDataFrame(
        [
            # user 1: click -> view -> purchase(10) -> purchase(5)
            (1, ts(0), 1, "click", 0.0),
            (2, ts(1), 1, "view", 0.0),
            (3, ts(2), 1, "purchase", 10.0),
            (4, ts(3), 1, "purchase", 5.0),
            # user 2: purchase with NO prior touch
            (5, ts(0), 2, "purchase", 7.0),
            # user 3: touch at the SAME ts as the purchase counts
            # (touches sort before purchases at equal ts)
            (6, ts(0), 3, "click", 0.0),
            (7, ts(0), 3, "purchase", 2.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {
        (r["model"], r["channel"]): r
        for r in behavior.touch_attribution(ev).collect()
    }
    # last-touch: u1 purchases -> view (most recent), u2 -> none, u3 -> click
    assert rows[("last_touch", "view")]["n_purchases"] == 2
    assert rows[("last_touch", "view")]["revenue_micro"] == 15_000_000
    assert rows[("last_touch", "(none)")]["revenue_micro"] == 7_000_000
    assert rows[("last_touch", "click")]["revenue_micro"] == 2_000_000
    # first-touch: u1 purchases -> click (earliest)
    assert rows[("first_touch", "click")]["n_purchases"] == 3
    assert rows[("first_touch", "click")]["revenue_micro"] == 17_000_000
    assert rows[("first_touch", "(none)")]["revenue_micro"] == 7_000_000


def test_calibration_report_bins_and_rates(spark):
    df = spark.createDataFrame(
        [(i, float(i), 1 if i >= 50 else 0) for i in range(100)],
        "id long, score double, label int",
    )
    rep = validate.calibration_report(
        df, "score", "label = 1", bins=10, tiebreak_col="id"
    ).collect()
    assert [r["bin"] for r in rep] == list(range(1, 11))
    assert all(r["n_rows"] == 10 for r in rep)
    # perfectly separable: bins 1-5 rate 0, bins 6-10 rate 1
    assert [r["positive_rate_micro"] for r in rep] == [0] * 5 + [1_000_000] * 5
    # bin 1 = scores 0..9 -> mean cents = 450
    assert rep[0]["mean_score_cents"] == 450
    with pytest.raises(ValueError, match="bins"):
        validate.calibration_report(df, "score", "label = 1", bins=1)
