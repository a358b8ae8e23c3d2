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


def test_average_hash_and_banded_near_dups(spark):
    def img(v0):
        # 16x16: left half dark, right half bright, one corner tweak v0
        px = [
            [((v0 if (x == 0 and y == 0) else (0 if x < 8 else 255)),) * 3
             for x in range(16)]
            for y in range(16)
        ]
        return multimodal.encode_bmp_rgb24(16, 16, px)

    lo_a, hi_a = multimodal.average_hash_bmp(img(0))
    lo_b, hi_b = multimodal.average_hash_bmp(img(255))  # corner flipped bright
    ham = bin((lo_a ^ lo_b)).count("1") + bin((hi_a ^ hi_b)).count("1")
    assert 1 <= ham <= 3  # one sampled cell changed -> tiny hamming
    media = spark.createDataFrame(
        [(1, bytearray(img(0))), (2, bytearray(img(255))),
         (3, bytearray(multimodal.encode_bmp_rgb24(
             16, 16, [[(y * 16, y * 16, y * 16)] * 16 for y in range(16)])))],
        "media_id long, content binary",
    )
    hashes = multimodal.phash_features(media)
    pairs = multimodal.phash_near_duplicates(hashes, max_hamming=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.phash_near_duplicates(hashes, max_hamming=4)


def test_trim_silence_in_row(spark):
    blob = multimodal.encode_wav_pcm16([0, 0, 5, -9, 0, 7, 0], 8000)
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    decoded = multimodal.decode_audio_samples(media)
    r = multimodal.trim_silence(decoded, threshold=0).collect()[0]
    assert (r["n_samples"], r["first_loud"], r["last_loud"]) == (7, 2, 5)
    assert r["n_trimmed"] == 4  # interior zero kept
    assert r["peak"] == 9
    silent = spark.createDataFrame(
        [(2, bytearray(multimodal.encode_wav_pcm16([0, 0, 0], 8000)))],
        "media_id long, content binary",
    )
    r2 = multimodal.trim_silence(
        multimodal.decode_audio_samples(silent), threshold=0
    ).collect()[0]
    assert r2["first_loud"] is None and r2["n_trimmed"] == 0 and r2["peak"] is None


def test_retrieval_eval_perfect_tier_scores_one(spark):
    from ai_etl_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 3)
    exact = similarity.brute_force_knn(emb, qs, k=5)
    rep = {
        r["tier"]: r
        for r in similarity.retrieval_eval_report(
            exact, {"self": exact}, k=5
        ).collect()
    }
    # a tier identical to ground truth has nDCG 1 and MRR 1 exactly
    assert rep["self"]["ndcg_micro"] == 1_000_000
    assert rep["self"]["mrr_micro"] == 1_000_000
    assert rep["self"]["n_queries"] == 3


def test_standardize_embeddings_roundtrip(spark):
    from ai_etl_pipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [2.0, 10.0]), (3, [4.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    stats = {r["pos"]: r for r in similarity.standardize_report(df).collect()}
    assert stats[1]["mean"] == 2.0 and stats[1]["std"] == round((8 / 3) ** 0.5, 6)
    assert stats[2]["std"] == 0.0 and stats[2]["z_min"] is None  # constant dim
    z = similarity.standardize_embeddings(
        df, means=[2.0, 10.0], stds=[(8 / 3) ** 0.5, 0.0]
    ).collect()
    zmap = {r["vec_id"]: r["z_vec"] for r in z}
    assert zmap[2][0] == 0.0 and zmap[2][1] == 0.0  # centered + constant->0
    assert zmap[3][0] > 0 and abs(zmap[1][0] + zmap[3][0]) < 1e-12


def test_bloom_index_skips_files(spark, tmp_path):
    from ai_etl_pipeline_spark.sources.readers import (
        bloom_index_manifest,
        bloom_index_pruned_scan,
    )

    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = str(tmp_path / "bloomed")
    df.repartition(8, "k").write.parquet(out)
    man = bloom_index_manifest(spark, out, "k")
    assert man.count() == 8
    scan = bloom_index_pruned_scan(spark, out, man, "k", 1234)
    rows = scan.collect()
    assert len(rows) == 1 and rows[0]["v"] == 1234 % 7
    # the point of the index: the scan read a strict subset of files
    # (hash layout puts key 1234 in exactly one file; Bloom FPs may
    # keep a couple more, never all 8)
    assert 1 <= len(scan.inputFiles()) < 8
    # a key that exists nowhere: empty result, regardless of pruning
    assert bloom_index_pruned_scan(spark, out, man, "k", 999_999).count() == 0
    # type-tagged hashing guard: probing with the wrong declared type
    # must not crash (it just fails to prune/match structurally)
    with pytest.raises(Exception):
        bloom_index_manifest(spark, out, "k", m_bits=100)  # not mult of 64


def test_versioned_store_copy_on_write_and_time_travel(spark, tmp_path):
    from ai_etl_pipeline_spark.sources import versioned

    base = str(tmp_path / "store")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 9).cast("long").alias("v")
    )
    v1 = versioned.versioned_write(df, base, n_files=4)
    assert v1 == 1
    upd = spark.createDataFrame([(7, 100), (1000, 5)], "k long, v long")
    v2 = versioned.versioned_upsert(spark, base, upd, ["k"])
    assert v2 == 2 and versioned.list_versions(base) == [1, 2]

    s1 = versioned.snapshot_read(spark, base, 1)
    s2 = versioned.snapshot_read(spark, base, 2)
    # time travel: v1 unchanged by the upsert
    assert s1.count() == 400
    assert s1.where("k = 7").collect()[0]["v"] == 7 % 9
    # v2: update applied, insert present, everything else intact
    assert s2.count() == 401
    assert s2.where("k = 7").collect()[0]["v"] == 100
    assert s2.where("k = 1000").collect()[0]["v"] == 5
    # COPY-ON-WRITE: v2's manifest reuses v1 files untouched by key 7
    import json, os

    m1 = json.load(open(os.path.join(base, "_manifests", "v1.json")))
    m2 = json.load(open(os.path.join(base, "_manifests", "v2.json")))
    shared = set(m1["files"]) & set(m2["files"])
    assert len(shared) == 3  # 4 v1 files, exactly 1 touched (k=7's file)
    with pytest.raises(FileNotFoundError):
        versioned.snapshot_read(spark, base, 9)


def test_hilbert_layout_prunes_both_dims(spark, sf_dir, tmp_path):
    # the CLUSTERING claim, exercised: range-partitioning on the
    # Hilbert key keeps BOTH participating columns locally narrow per
    # file, so zone maps prune files for a narrow window on EITHER
    # dimension (a single-column sort only serves its own column)
    from ai_etl_pipeline_spark.sources.readers import (
        zone_map_manifest,
        zone_map_pruned_scan,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    keyed = layout.hilbert_key(li, ["l_partkey", "l_suppkey"], bits=8)
    path = str(tmp_path / "li_hilbert")
    keyed.repartitionByRange(8, "__hkey").drop("__hkey").write.parquet(path)
    man = zone_map_manifest(spark, path, ["l_partkey", "l_suppkey"])
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    p_lo = bounds[0] + (bounds[1] - bounds[0]) * 45 // 100
    p_hi = bounds[0] + (bounds[1] - bounds[0]) * 55 // 100
    s_lo = bounds[2] + (bounds[3] - bounds[2]) * 45 // 100
    s_hi = bounds[2] + (bounds[3] - bounds[2]) * 55 // 100
    for col, lo, hi in (
        ("l_partkey", p_lo, p_hi),
        ("l_suppkey", s_lo, s_hi),
    ):
        pruned = zone_map_pruned_scan(spark, path, man, col, lo=lo, hi=hi)
        assert len(pruned.inputFiles()) < 8, f"no pruning on {col}"
        want = li.where(F.col(col).between(lo, hi)).count()
        assert pruned.count() == want  # skipping invisible to results


def test_fixed_width_roundtrip_and_overflow(spark, tmp_path):
    from ai_etl_pipeline_spark.sources.readers import read_fixed_width
    from ai_etl_pipeline_spark.sources.writers import write_fixed_width

    df = spark.createDataFrame(
        [(1, "A", 123), (22, "B", -4), (333, None, 0)],
        "k long, s string, v long",
    )
    out = str(tmp_path / "fw")
    write_fixed_width(df, out, [("k", 4), ("s", 2), ("v", 5)])
    back = read_fixed_width(
        spark, out, [("k", 4, "bigint"), ("s", 2, "string"), ("v", 5, "bigint")]
    )
    rows = {r["k"]: r for r in back.collect()}
    assert rows[1]["s"] == "A" and rows[1]["v"] == 123
    assert rows[22]["v"] == -4  # sign survives the pad/trim
    assert rows[333]["s"] is None and rows[333]["v"] == 0  # NULL -> blank -> NULL
    # a value wider than its field must fail LOUDLY, not shift offsets
    import py4j.protocol

    wide = spark.createDataFrame([(123456, "A", 1)], "k long, s string, v long")
    with pytest.raises(Exception, match="fixed-width overflow"):
        write_fixed_width(wide, str(tmp_path / "fw2"), [("k", 4), ("s", 2), ("v", 5)])


def test_bucketed_sorted_join_has_no_exchange_or_sort(spark, sf_dir, tmp_path):
    # the bucketing contract, asserted in-plan: two tables bucketed AND
    # sorted on the join key with the same bucket count join with NO
    # Exchange and NO Sort - the shuffle was paid once at write time
    from ai_etl_pipeline_spark.sources.writers import write_bucketed_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    )
    for t in ("t_r11_bo", "t_r11_bc"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed_table(
        orders, "t_r11_bo", ["o_custkey"], 8, sort_cols=["o_custkey"],
        path=str(tmp_path / "bo"),
    )
    write_bucketed_table(
        cust, "t_r11_bc", ["c_custkey"], 8, sort_cols=["c_custkey"],
        path=str(tmp_path / "bc"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Spark 3+ exposes per-bucket sort order to the planner only behind
    # this flag (and only with one file per bucket, which
    # write_bucketed_table's repartition guarantees)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        j = spark.table("t_r11_bo").join(
            spark.table("t_r11_bc"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # buckets co-locate the keys
        assert "Sort\n" not in plan and "+- Sort " not in plan, plan
        # and the answer is the same as the plain (shuffling) join
        want = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        for t in ("t_r11_bo", "t_r11_bc"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_language_mix_report_shares_and_ties(spark):
    from ai_etl_pipeline_spark.operators import textstats

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog"),       # en only: 3 hits
            (2, "el perro y the cat"),        # es 1 + en 1 -> tie, 'es' > 'en'
            (3, "zzz qqq"),                   # no markers
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.language_mix_report(df).collect()}
    assert rows[1]["dominant_lang"] == "en"
    assert rows[1]["n_langs"] == 1
    assert rows[1]["dominant_share_micro"] == 1_000_000
    assert rows[2]["n_langs"] == 2
    assert rows[2]["dominant_lang"] == "es"  # tie -> alphabetically last
    assert rows[2]["dominant_share_micro"] == 500_000
    assert rows[3]["dominant_lang"] == "und"
    assert rows[3]["dominant_share_micro"] is None


def test_phash_multiprobe_band_scheme_equivalent(spark):
    """The 32-bit-band + 1-flip multiprobe candidate scheme (the 100 TB
    path: ~4000x fewer random band collisions) must return EXACTLY the
    16-bit-band pair set — both are complete for hamming <= 3 and both
    verify with exact bit_count(xor)."""
    import random

    rng = random.Random(13)
    rows = []
    for i in range(200):
        lo = rng.getrandbits(32)
        hi = rng.getrandbits(32)
        rows.append((i, lo, hi))
        if i % 7 == 0:  # near-dup: flip 1-3 bits across both halves
            nl, nh = lo, hi
            for b in rng.sample(range(64), rng.randint(1, 3)):
                if b < 32:
                    nl ^= 1 << b
                else:
                    nh ^= 1 << (b - 32)
            rows.append((i + 10_000, nl, nh))
        if i % 11 == 0:  # exact dup
            rows.append((i + 20_000, lo, hi))
    hashes = spark.createDataFrame(
        rows, "media_id long, phash_lo long, phash_hi long"
    )
    p16 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in multimodal.phash_near_duplicates(hashes, band_bits=16).collect()
    }
    p32 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in multimodal.phash_near_duplicates(hashes, band_bits=32).collect()
    }
    assert p16 == p32
    assert len(p16) >= 29 * 2 // 2  # every injected near/exact dup found
    # brute-force ground truth on the collected hashes
    hs = {r[0]: (r[1], r[2]) for r in rows}
    want = set()
    ids = sorted(hs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(
                hs[a][1] ^ hs[b][1]
            ).count("1")
            if ham <= 3:
                want.add((a, b, ham))
    assert p16 == want
    with pytest.raises(ValueError, match="band_bits"):
        multimodal.phash_near_duplicates(hashes, band_bits=8)
