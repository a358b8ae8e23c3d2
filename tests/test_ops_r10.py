"""Round-10 operator tests: link prediction, journey mining, TWAP,
integer OLS, Benford, PMI, chi-square association, prefix-filter join,
frame-level audio DSP."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import (
    behavior,
    dedup,
    graph,
    multimodal,
    textstats,
    validate,
)


# ---------------------------------------------------------------- graph


def test_link_prediction_scores_by_hand(spark):
    # bipartite: customers 1..3 -> suppliers a,b,c; 4 -> x (isolated)
    e = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"), (3, "b"), (3, "c"), (4, "x")],
        ["src", "dst"],
    )
    got = {
        (r["node_a"], r["node_b"]): r
        for r in graph.link_prediction(e, min_common=1, max_src_degree=10).collect()
    }
    # (a,b): shared custs {1,2}; deg(a)=2, deg(b)=3 -> J = 2/3
    ab = got[("a", "b")]
    assert ab["common_neighbors"] == 2
    assert ab["jaccard_micro"] == 666666
    # AA = floor(1e6/ln2) + floor(1e6/ln3)
    assert ab["adamic_adar_micro"] == math.floor(1e6 / math.log(2)) + math.floor(
        1e6 / math.log(3)
    )
    # isolated supplier never appears
    assert not any("x" in k for k in got)


def test_link_prediction_hub_exclusion_keeps_degrees_honest(spark):
    # hub customer 99 connects to everything; with max_src_degree=2 it
    # generates no wedges, but dst degrees still count it
    e = spark.createDataFrame(
        [(1, "a"), (1, "b"), (99, "a"), (99, "b"), (99, "c")], ["src", "dst"]
    )
    rows = graph.link_prediction(e, min_common=1, max_src_degree=2).collect()
    got = {(r["node_a"], r["node_b"]): r for r in rows}
    assert set(got) == {("a", "b")}  # hub wedges (a,c),(b,c) excluded
    # deg(a)=2 (cust 1 + hub), deg(b)=2, cn=1 -> J = 1/3
    assert got[("a", "b")]["jaccard_micro"] == 333333


# ------------------------------------------------------------- behavior


def test_event_sequences_orders_by_ts_then_id(spark):
    t0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (2, 1, "b", t0),  # same ts as event 1: id breaks the tie
            (1, 1, "a", t0),
            (3, 1, "c", t0 + datetime.timedelta(seconds=1)),
        ],
        "event_id: bigint, user_id: bigint, event_type: string, ts: timestamp",
    )
    rows = behavior.event_sequences(ev, n=3).collect()
    assert [(r["step_1"], r["step_2"], r["step_3"], r["n_occurrences"]) for r in rows] == [
        ("a", "b", "c", 1)
    ]


def test_event_sequences_rejects_n1(spark):
    ev = spark.createDataFrame([], "user_id: bigint, event_type: string, ts: timestamp")
    with pytest.raises(ValueError):
        behavior.event_sequences(ev, n=1)


def test_time_weighted_avg_locf_weighting(spark):
    t0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            # user 1: 1.0 held 10 s, then 3.0 (no next -> excluded)
            (1, 1, "m", t0, 1.0),
            (2, 1, "m", t0 + datetime.timedelta(seconds=10), 3.0),
            # user 2: 5.0 held 30 s
            (3, 2, "m", t0, 5.0),
            (4, 2, "m", t0 + datetime.timedelta(seconds=30), 7.0),
        ],
        "event_id: bigint, user_id: bigint, event_type: string, ts: timestamp, value: double",
    )
    row = behavior.time_weighted_avg(ev).collect()[0]
    assert row["n_intervals"] == 2 and row["total_seconds"] == 40
    # twap = (1e6*10 + 5e6*30)/40 = 4_000_000
    assert row["twap_micro"] == 4_000_000
    # plain avg over interval starts = (1e6 + 5e6)/2
    assert row["plain_avg_micro"] == 3_000_000


# ------------------------------------------------------------- validate


def test_benford_report_digits_and_exclusions(spark):
    df = spark.createDataFrame(
        [(19.5,), (120.0,), (0.4,), (None,), (2.0,), (13.0,)], "v: double"
    )
    rows = {r["digit"]: r for r in validate.benford_report(df, "v").collect()}
    assert len(rows) == 9  # zero-observation digits still report
    assert rows[1]["n_obs"] == 3 and rows[2]["n_obs"] == 1
    assert rows[9]["n_obs"] == 0
    # 0.4 and NULL excluded
    assert rows[1]["n_rows_considered"] == 4
    assert rows[1]["exp_share_micro"] == validate.BENFORD_MICRO[0]
    assert rows[9]["chi2_term_micro"] is not None


def test_linreg_report_exact_line_and_degenerate_group(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 3.0), ("g", 2.0, 5.0), ("g", 3.0, 7.0), ("h", 4.0, 1.0), ("h", 4.0, 9.0)],
        ["grp", "x", "y"],
    )
    got = {r["grp"]: r for r in validate.linreg_report(df, ["grp"], "x", "y").collect()}
    # y = 2x + 1 exactly
    assert got["g"]["slope_micro"] == 2_000_000
    assert got["g"]["intercept_micro"] == 1_000_000
    assert got["g"]["r2"] == 1.0
    # constant x -> NULLs, not a crash
    assert got["h"]["slope_micro"] is None and got["h"]["r2"] is None


# ------------------------------------------------------------- textstats


def test_pmi_collocations_hand_value(spark):
    docs = spark.createDataFrame(
        [(1, "new york is big"), (2, "new york new york"), (3, "big data is fun")],
        ["doc_id", "text"],
    )
    rows = textstats.pmi_collocations(docs, "text", min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["token_a"], r["token_b"], r["pair_count"]) == ("new", "york", 3)
    # c_ab=3, N_uni=12, N_big=9, c_new=3, c_york=3
    expect = math.floor(1e6 * math.log((3 * 12.0 * 12.0) / (9.0 * 3.0 * 3.0)))
    assert r["pmi_micro"] == expect


def test_chi2_token_association_independent_token_scores_zero(spark):
    # token 'x' appears in exactly half of each class -> chi2 == 0
    docs = spark.createDataFrame(
        [
            (1, "x a", True),
            (2, "b c", True),
            (3, "x d", False),
            (4, "e f", False),
        ],
        ["doc_id", "text", "pos"],
    )
    rows = {
        r["token"]: r
        for r in textstats.chi2_token_association(
            docs, "text", "pos", min_doc_freq=1
        ).collect()
    }
    assert rows["x"]["chi2_micro"] == 0
    # class-exclusive token: chi2 = N * (1*2 - 0)^2 / (1*3*2*2) = 4/3
    assert rows["a"]["chi2_micro"] == math.floor(1e6 * 4 / 3.0)


# ----------------------------------------------------------------- dedup


def test_prefix_filter_join_matches_bruteforce_jaccard(spark):
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = rng.randint(3, 12)
        docs.append((i, " ".join(rng.sample(vocab, n))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    t_micro = 500000
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_micro"]
        for r in dedup.prefix_filter_join(df, threshold_micro=t_micro).collect()
    }
    # brute force over token SETS
    sets = {i: set(t.split()) for i, t in docs}
    expect = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        jm = inter * 1000000 // union
        if jm >= t_micro:
            expect[(a, b)] = jm
    assert got == expect  # exact recall AND exact scores


def test_prefix_filter_join_shingles_mode(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),
            (2, "the quick brown fox jumps away"),
            (3, "a completely different document here now"),
        ],
        ["doc_id", "text"],
    )
    rows = dedup.prefix_filter_join(
        df, threshold_micro=400000, shingle_k=3
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard_micro"] for r in rows}
    # docs 1,2 share 3 of their 4+4 shingles -> J = 3/5
    assert got == {(1, 2): 600000}


# ------------------------------------------------------------ multimodal


def test_decode_audio_samples_roundtrip(spark):
    samples = [0, 1000, -1000, 32767, -32768, 5]
    wav = multimodal.encode_wav_pcm16(samples, 8000)
    df = spark.createDataFrame([(1, bytearray(wav))], "media_id: bigint, content: binary")
    row = multimodal.decode_audio_samples(df).collect()[0]
    assert row["sample_rate"] == 8000
    assert list(row["samples"]) == samples


def test_audio_frame_features_by_hand(spark):
    samples = [100, -100, 200, -50, 60, 70, -80, 90, 10]
    df = spark.createDataFrame([(1, samples)], "media_id: bigint, samples: array<bigint>")
    rows = {
        r["frame_idx"]: r
        for r in multimodal.audio_frame_features(df, frame_size=4).collect()
    }
    f0 = rows[0]
    assert f0["n_samples"] == 4 and f0["energy"] == 62500
    assert f0["mean_square"] == 15625 and f0["peak"] == 200
    assert f0["zero_crossings"] == 3
    f1 = rows[1]
    assert f1["energy"] == 23000 and f1["zero_crossings"] == 2
    # the (-50, 60) boundary pair is counted in NEITHER frame
    # last partial frame: one sample, no pairs
    f2 = rows[2]
    assert f2["n_samples"] == 1 and f2["zero_crossings"] == 0 and f2["energy"] == 100


def test_audio_frame_features_rejects_tiny_frame(spark):
    df = spark.createDataFrame([(1, [1, 2])], "media_id: bigint, samples: array<bigint>")
    with pytest.raises(ValueError):
        multimodal.audio_frame_features(df, frame_size=1)


# --------------------------------------------------------------- wave C


def test_ewma_smooth_binary_weights(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (j + 1, 1, "m", t0 + datetime.timedelta(seconds=j), float(j + 1))
        for j in range(9)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id: bigint, user_id: bigint, event_type: string, ts: timestamp, value: double",
    )
    out = behavior.ewma_smooth(ev, "value", k=8).orderBy("ts").collect()
    # only rows 8 and 9 have full 8-history
    assert len(out) == 2
    # row 8: values 8..1 weighted 128,64,...,1
    num = sum((8 - j) * (1 << (7 - j)) for j in range(8)) * 1_000_000
    assert out[0]["ewma_micro"] == num // 255
    with pytest.raises(ValueError):
        behavior.ewma_smooth(ev, "value", k=1)


def test_rfm_segments_partitions_and_scores(spark):
    import datetime

    rows = []
    for u in range(8):
        for o in range(u + 1):  # frequency strictly increases with u
            rows.append(
                (u, datetime.datetime(1998, 1 + u, 1), 100.0 * (u + 1))
            )
    orders = spark.createDataFrame(
        rows, "o_custkey: bigint, o_orderdate: timestamp, o_totalprice: double"
    )
    seg = behavior.rfm_segments(orders, buckets=4).collect()
    assert sum(r["n_customers"] for r in seg) == 8
    # customer 7: most recent, most frequent, biggest spend -> 4/4/4
    top = [r for r in seg if (r["r_score"], r["f_score"], r["m_score"]) == (4, 4, 4)]
    assert len(top) == 1 and top[0]["n_customers"] >= 1


def test_concentration_report_uniform_is_gini_near_zero(spark):
    df = spark.createDataFrame(
        [(k, 10.0) for k in range(100)], "k: bigint, v: double"
    )
    rows = validate.concentration_report(df, "k", "v", buckets=10).collect()
    assert len(rows) == 10
    assert all(r["gini_micro"] == 0 for r in rows)  # perfectly equal
    assert rows[-1]["cum_share_micro"] == 1_000_000
    # each decile owns exactly 10%
    assert rows[0]["cum_share_micro"] == 100_000


def test_concentration_report_whale(spark):
    # one key owns ~all the value -> gini near 1
    df = spark.createDataFrame(
        [(0, 1_000_000.0)] + [(k, 0.01) for k in range(1, 100)],
        "k: bigint, v: double",
    )
    rows = validate.concentration_report(df, "k", "v", buckets=10).collect()
    assert rows[0]["gini_micro"] > 900_000


def test_centroid_drift_identical_labels_cosine_one(spark):
    from ai_etl_pipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0]),
            (0, [1.0, 2.0, 3.0]),
            (1, [2.0, 4.0, 6.0]),  # same direction, scaled
            (2, [-3.0, 0.0, 1.0]),
        ],
        "label: int, embedding: array<double>",
    )
    rows = {
        (r["label_a"], r["label_b"]): r
        for r in similarity.centroid_drift_report(df).collect()
    }
    assert rows[(0, 1)]["cosine"] == 1.0
    assert rows[(0, 1)]["n_a"] == 2 and rows[(0, 1)]["n_b"] == 1
    assert abs(rows[(0, 2)]["cosine"]) < 1.0


def test_group_mode_deterministic_ties(spark):
    from ai_etl_pipeline_spark.operators import distinct as dst

    df = spark.createDataFrame(
        [("g", "b"), ("g", "a"), ("g", "b"), ("g", "a"), ("h", "z")],
        ["grp", "v"],
    )
    got = {r["grp"]: r for r in dst.group_mode(df, ["grp"], "v").collect()}
    # tie between a and b at 2 -> lexically smallest wins
    assert got["g"]["mode_value"] == "a" and got["g"]["mode_count"] == 2
    assert got["h"]["mode_value"] == "z"


# --------------------------------------------------------------- wave D


def test_adoption_curve_first_touch_and_cumsum(spark):
    import datetime

    d = lambda day: datetime.datetime(2024, 1, day, 12, 0, 0)
    ev = spark.createDataFrame(
        [(1, d(1)), (1, d(2)), (2, d(2)), (2, d(2)), (3, d(4))],
        "user_id: bigint, ts: timestamp",
    )
    rows = behavior.adoption_curve(ev).orderBy("day").collect()
    got = [(str(r["day"]), r["n_new_users"], r["n_active_users"], r["cum_users"]) for r in rows]
    assert got == [
        ("2024-01-01", 1, 1, 1),
        ("2024-01-02", 1, 2, 2),  # user 1 active but not new
        ("2024-01-04", 1, 1, 3),
    ]


def test_weighted_percentile_vs_row_median(spark):
    from ai_etl_pipeline_spark.operators import distinct as dst

    # value 1.00 carries weight 9, value 100.00 weight 1:
    # weighted median = 1.00; a row median would say 50.5
    df = spark.createDataFrame(
        [("g", 1.0, 9), ("g", 100.0, 1)], ["grp", "v", "w"]
    )
    row = dst.weighted_percentile(df, ["grp"], "v", "w").collect()[0]
    assert row["pctl_value_cents"] == 100 and row["total_weight"] == 10
    # p=1.0 -> max value
    row = dst.weighted_percentile(df, ["grp"], "v", "w", p_micro=1000000).collect()[0]
    assert row["pctl_value_cents"] == 10000
    with pytest.raises(ValueError):
        dst.weighted_percentile(df, ["grp"], "v", "w", p_micro=0)


def test_degree_distribution_buckets(spark):
    # star: hub degree 8 (bucket 3), leaves degree 1 (bucket 0)
    e = spark.createDataFrame([("h", f"l{i}") for i in range(8)], ["src", "dst"])
    rows = {r["bucket"]: r for r in graph.degree_distribution(e).collect()}
    assert rows[3]["n_nodes"] == 1 and rows[3]["min_degree"] == 8
    assert rows[0]["n_nodes"] == 8 and rows[0]["max_degree"] == 1


# --------------------------------------------------------------- wave E


def test_token_frequency_histogram_buckets(spark):
    # 'a' x8 (bucket 3), 'b' x2 (bucket 1), c,d singletons (bucket 0)
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a a a b b c d")], ["doc_id", "text"]
    )
    rows = {
        r["bucket"]: r
        for r in textstats.token_frequency_histogram(docs).collect()
    }
    assert rows[3]["n_tokens"] == 1 and rows[3]["min_freq"] == 8
    assert rows[1]["n_tokens"] == 1 and rows[1]["min_freq"] == 2
    assert rows[0]["n_tokens"] == 2 and rows[0]["total_occurrences"] == 2


def test_lsh_recall_receipt_subset_invariant(spark, sf_dir):
    import __spark_entry__ as entrymod

    row = entrymod.queries()["q_dedup_lsh_recall"](spark, sf_dir).collect()[0]
    # verified LSH pairs are a subset of the exact ground truth by
    # construction; recall is a valid micro-ratio
    assert row["lsh_subset_of_exact"] is True
    assert row["n_common"] <= row["n_exact_pairs"]
    assert row["recall_micro"] is None or 0 <= row["recall_micro"] <= 1000000


# --------------------------------------------------------------- wave F


def test_impute_with_group_mean(spark):
    from ai_etl_pipeline_spark.operators import clean

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", None)],
        "grp: string, v: double",
    )
    rows = {
        (r["grp"], r["v"]): r
        for r in clean.impute_with_group_mean(df, "v", ["grp"]).collect()
    }
    assert rows[("a", None)]["v_imputed_micro"] == 2_000_000
    assert rows[("a", None)]["was_imputed"] is True
    assert rows[("a", 1.0)]["was_imputed"] is False
    # group with no observations keeps NULL, flagged false
    assert rows[("b", None)]["v_imputed_micro"] is None
    assert rows[("b", None)]["was_imputed"] is False


def test_asof_forward_picks_next_at_or_after(spark):
    import datetime

    from ai_etl_pipeline_spark.operators import relational

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30))], "user_id: bigint, ts: timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(10), 7), (1, t(20), 8)], "user_id: bigint, ts: timestamp, x: int"
    )
    m = relational.asof_join(
        left, right, on="user_id", right_cols=["x"], direction="forward"
    ).collect()
    got = {r["ts"].second: (r["__asof_ts"].second if r["__asof_ts"] else None, r["x"])
           for r in m}
    assert got[10] == (10, 7)  # tie matches (>=)
    assert got[30] == (None, None)  # nothing after


def test_streaming_ewma_multi_batch_ring_state(spark, tmp_path):
    # two micro-batches: the ring must carry the first batch's readings
    # into the second, and emit NULL until 8 readings exist
    import datetime

    from ai_etl_pipeline_spark.streaming.stateful import running_user_ewma

    t0 = datetime.datetime(2024, 1, 1)
    rows1 = [
        (j + 1, 1, "m", t0 + datetime.timedelta(seconds=j), float(j + 1))
        for j in range(5)
    ]
    rows2 = [
        (j + 6, 1, "m", t0 + datetime.timedelta(seconds=j + 5), float(j + 6))
        for j in range(4)
    ]
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(rows1, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_ewma(stream)
        .writeStream.format("memory")
        .queryName("ewma_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = spark.sql("select * from ewma_t").collect()
    assert first[0]["n_events"] == 5 and first[0]["ewma_micro"] is None
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    q2 = (
        running_user_ewma(spark.readStream.schema(schema).parquet(src))
        .writeStream.format("memory")
        .queryName("ewma_t2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("select * from ewma_t2").collect()
    # fresh checkpoint -> one batch over all 9 rows: values 9..2 weighted
    num = sum((9 - j) * (1 << (7 - j)) for j in range(8)) * 1_000_000
    assert rows[-1]["n_events"] == 9
    assert rows[-1]["ewma_micro"] == num // 255


def test_moment_report_known_distribution(spark):
    # symmetric {1,2,3}: skew 0, excess kurtosis -1.5; constant group NULL
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("h", 5.0), ("h", 5.0)],
        ["grp", "v"],
    )
    got = {r["grp"]: r for r in validate.moment_report(df, ["grp"], "v").collect()}
    g = got["g"]
    assert g["mean"] == 2.0 and abs(g["variance"] - 2.0 / 3.0) < 1e-6
    assert g["skewness"] == 0.0 and g["kurtosis_excess"] == -1.5
    assert got["h"]["skewness"] is None and got["h"]["variance"] == 0.0
