"""Tests for the training-batch packing tier (operators/packing.py),
the CDC tier (operators/cdc.py), and the quantile quality gate
(textstats.quantile_threshold_filter)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import cdc, packing, textstats


# ---------------------------------------------------------------------------
# shuffle_shard
# ---------------------------------------------------------------------------

def test_shuffle_shard_deterministic_and_complete(spark, documents):
    out1 = packing.shuffle_shard(documents, "doc_id", 8).select(
        "doc_id", "shard", "pos"
    )
    out2 = packing.shuffle_shard(documents, "doc_id", 8).select(
        "doc_id", "shard", "pos"
    )
    r1 = {r.doc_id: (r.shard, r.pos) for r in out1.collect()}
    r2 = {r.doc_id: (r.shard, r.pos) for r in out2.collect()}
    assert r1 == r2  # reproducible
    assert len(r1) == documents.count()  # permutation: every doc placed once
    # pos is 1..n contiguous within each shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in r1.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    assert set(by_shard) <= set(range(8))


def test_shuffle_shard_rejects_bad_shards(spark, documents):
    with pytest.raises(ValueError):
        packing.shuffle_shard(documents, "doc_id", 0)


# ---------------------------------------------------------------------------
# chunk_pack
# ---------------------------------------------------------------------------

def _chunk_rows(spark, rows, capacity):
    df = spark.createDataFrame(rows, "grp string, id long, n long")
    return packing.chunk_pack(df, "id", "n", capacity, "grp").select(
        "grp", "id", "chunk_id", "tok_from", "tok_to"
    )


def test_chunk_pack_spans_boundaries(spark):
    # stream: id1 has 3 tokens [0,3), id2 has 4 tokens [3,7) with cap 5
    # -> id2 spans chunks 0 and 1: [3,5) are its tokens 0..2, [5,7) are 2..4
    rows = [("a", 1, 3), ("a", 2, 4)]
    got = {
        (r.id, r.chunk_id): (r.tok_from, r.tok_to)
        for r in _chunk_rows(spark, rows, 5).collect()
    }
    assert got == {
        (1, 0): (0, 3),
        (2, 0): (0, 2),
        (2, 1): (2, 4),
    }


def test_chunk_pack_drops_empty_and_isolates_groups(spark):
    rows = [("a", 1, 0), ("a", 2, 5), ("b", 3, 5)]
    out = _chunk_rows(spark, rows, 5).collect()
    ids = {r.id for r in out}
    assert ids == {2, 3}  # zero-length doc dropped
    # each group starts its own stream at chunk 0
    assert {(r.id, r.chunk_id) for r in out} == {(2, 0), (3, 0)}


def test_chunk_pack_token_conservation(spark, documents):
    toks = textstats.token_counts(documents, "text").select(
        "source", "doc_id", F.col("ws_tokens").cast("bigint").alias("n_tok")
    )
    out = packing.chunk_pack(toks, "doc_id", "n_tok", 128, "source")
    # every token of every doc lands in exactly one chunk slice
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.sum(F.col("tok_to") - F.col("tok_from")).alias("covered"),
            F.first("n_tok").alias("n_tok"),
        )
        .where(F.col("covered") != F.col("n_tok"))
    )
    assert per_doc.count() == 0
    # chunk fill never exceeds capacity
    fill = out.groupBy("source", "chunk_id").agg(
        F.sum(F.col("tok_to") - F.col("tok_from")).alias("fill")
    )
    assert fill.where(F.col("fill") > 128).count() == 0


# ---------------------------------------------------------------------------
# next_fit_pack
# ---------------------------------------------------------------------------

def test_next_fit_pack_semantics(spark):
    rows = [("a", 1, 3), ("a", 2, 3), ("a", 3, 5), ("a", 4, 9), ("a", 5, 1)]
    df = spark.createDataFrame(rows, "grp string, id long, n long")
    out = {
        r.id: (r.seq_id, r.offset)
        for r in packing.next_fit_pack(df, ["grp"], "id", "n", 7).collect()
    }
    # cap 7: [1(3), 2(3)] -> seq0; 3(5) -> seq1; 4(9) oversized -> seq2 alone;
    # 5(1) -> seq3 (next-fit never looks back at seq0's free space)
    assert out == {1: (0, 0), 2: (0, 3), 3: (1, 0), 4: (2, 0), 5: (3, 0)}


def test_next_fit_pack_never_splits_and_respects_capacity(spark, documents):
    toks = textstats.token_counts(documents, "text").select(
        "source", "doc_id", F.col("ws_tokens").cast("bigint").alias("n_tok")
    )
    out = packing.next_fit_pack(toks, ["source"], "doc_id", "n_tok", 256)
    assert out.count() == documents.count()  # one row per doc, never split
    fill = out.groupBy("source", "seq_id").agg(
        F.sum("n_tok").alias("fill"), F.count("*").alias("n_docs")
    )
    # a sequence over capacity can only be a single oversized doc
    assert fill.where((F.col("fill") > 256) & (F.col("n_docs") > 1)).count() == 0
    # offsets tile each sequence exactly: max(offset + n_tok) == fill
    tiled = (
        out.groupBy("source", "seq_id")
        .agg(
            F.max(F.col("offset") + F.col("n_tok")).alias("hi"),
            F.sum("n_tok").alias("fill"),
        )
        .where(F.col("hi") != F.col("fill"))
    )
    assert tiled.count() == 0


# ---------------------------------------------------------------------------
# quantile_threshold_filter
# ---------------------------------------------------------------------------

def test_quantile_filter_per_stratum(spark, documents):
    out = textstats.quantile_threshold_filter(
        documents, "n_chars", 0.25, strata_col="source"
    )
    # every survivor clears its own stratum's threshold
    assert out.where(F.col("n_chars") < F.col("threshold")).count() == 0
    # roughly the top 75% survive per stratum (exact percentile, >=)
    kept = out.groupBy("source").count()
    totals = documents.groupBy("source").count().withColumnRenamed("count", "total")
    bad = (
        kept.join(totals, "source")
        .where(
            (F.col("count") < F.col("total") * 0.7)
            | (F.col("count") > F.col("total"))
        )
        .count()
    )
    assert bad == 0


def test_quantile_filter_global_and_below(spark, documents):
    out = textstats.quantile_threshold_filter(documents, "n_chars", 0.5, keep="below")
    assert out.where(F.col("n_chars") > F.col("threshold")).count() == 0
    with pytest.raises(ValueError):
        textstats.quantile_threshold_filter(documents, "n_chars", 1.5)
    with pytest.raises(ValueError):
        textstats.quantile_threshold_filter(documents, "n_chars", 0.5, keep="sideways")


def test_numeric_profile_single_pass_values(spark):
    from ai_etl_pipeline_spark.operators import distinct as dd

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (3.0, None), (2.0, 40)],
        "a double, b int",
    )
    rep = {r["column"]: r for r in dd.numeric_profile(df, ["a", "b"]).collect()}
    ra, rb = rep["a"], rep["b"]
    assert (ra["n"], ra["nulls"], ra["n_distinct"]) == (4, 0, 3)
    assert (ra["min"], ra["max"], ra["mean"], ra["p50"]) == (1.0, 3.0, 2.0, 2.0)
    assert (rb["n"], rb["nulls"], rb["n_distinct"]) == (3, 1, 3)
    assert rb["p50"] == 20.0  # exact interpolated median of (10,20,40)
    # two one-row aggregates (plain + distinct legs), crossJoined: the
    # r11 split that keeps the DISTINCT aggregates out of the
    # percentile leg's Expand (a single mixed agg replayed every row
    # once per distinct column and ran the percentile buffers on the
    # multiplied relation). No MORE than those two passes — and the
    # plain leg must NOT plan an Expand.
    qe = dd.numeric_profile(df, ["a", "b"])._jdf.queryExecution()
    plan = qe.optimizedPlan().toString()
    assert plan.count("Aggregate") <= 4  # partial+final of TWO aggregates
    lines = plan.splitlines()
    expands = [i for i, l in enumerate(lines) if "Expand" in l]
    # any Expand must sit under the distinct leg (below the crossJoin's
    # second child), never in the percentile leg
    perc = [i for i, l in enumerate(lines) if "percentile" in l]
    assert perc, plan
    assert all(e > max(perc) for e in expands), plan
    with pytest.raises(ValueError):
        dd.numeric_profile(df, [])


def test_expectations_counts_and_null_conventions(spark):
    from ai_etl_pipeline_spark.operators import validate as V

    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT"),
            (1, -5.0, "X", "9-BOGUS"),      # dup key, range, set, regex
            (None, None, None, None),       # null key; nulls skip other rules
            (3, 50.0, "F", "2-HIGH"),
        ],
        "k int, price double, status string, prio string",
    )
    rules = [
        V.not_null("k"),
        V.unique("k"),
        V.in_range("price", 0.0, 100.0),
        V.accepted_values("status", ["O", "F"]),
        V.matches("prio", "^[1-5]-"),
    ]
    rep = {r["rule"]: (r["n_violations"], r["passed"]) for r in V.expect(df, rules).collect()}
    assert rep["k_not_null"] == (1, False)
    assert rep["k_unique"] == (1, False)          # one duplicated non-null key
    assert rep["price_in_range"] == (1, False)    # -5.0; NULL skipped
    assert rep["status_accepted_values"] == (1, False)
    assert rep["prio_matches"] == (1, False)

    with pytest.raises(ValueError, match="expectations failed"):
        V.enforce(df, rules)
    clean_df = df.where("k = 3")
    assert V.enforce(clean_df, rules) is clean_df  # gate passes through

    with pytest.raises(ValueError, match="duplicate rule name"):
        V.expect(df, [V.not_null("k"), V.not_null("k")])
    with pytest.raises(ValueError):
        V.expect(df, [])


def test_overlap_chunks_boundaries_and_overlap(spark):
    from ai_etl_pipeline_spark.operators import packing

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "only three tokens"), (3, "   ")],
        "doc_id long, text string",
    )
    out = packing.overlap_chunks(df, "doc_id", "text", chunk_tokens=4, stride=3)
    rows = {(r["doc_id"], r["chunk_no"]): r for r in out.collect()}
    # doc 1: 10 tokens, starts 0,3,6,9 -> lens 4,4,4,1
    assert [rows[(1, i)]["chunk_len"] for i in range(4)] == [4, 4, 4, 1]
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"   # overlap of 1 at stride 3
    assert rows[(1, 3)]["chunk_text"] == "t9"
    # doc 2: 3 tokens -> single short chunk; doc 3: empty -> no rows
    assert rows[(2, 0)]["chunk_text"] == "only three tokens"
    assert {k[0] for k in rows} == {1, 2}
    # codegen only: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        packing.overlap_chunks(df, "doc_id", "text", chunk_tokens=0)


def test_top_k_per_stratum_exact_nested_deterministic(spark, documents):
    from ai_etl_pipeline_spark.operators import sampling

    k5 = sampling.top_k_per_stratum(documents, "doc_id", "lang", 5)
    sizes = {r["lang"]: r["n"] for r in k5.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(5, per_lang[lang])
    # deterministic and nested: k=5 within k=10, identical across runs
    ids5 = {r["doc_id"] for r in k5.collect()}
    ids10 = {r["doc_id"] for r in sampling.top_k_per_stratum(documents, "doc_id", "lang", 10).collect()}
    assert ids5 <= ids10
    assert ids5 == {r["doc_id"] for r in sampling.top_k_per_stratum(documents, "doc_id", "lang", 5).collect()}
    with pytest.raises(ValueError):
        sampling.top_k_per_stratum(documents, "doc_id", "lang", 0)


# ---------------------------------------------------------------------------
# cdc
# ---------------------------------------------------------------------------

def test_merge_upsert_latest_wins_and_tiebreak(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 5)], "k long, v string, ver long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 2), (3, "C", 5), (4, "D", 1)], "k long, v string, ver long"
    )
    out = {
        r.k: (r.v, r.ver)
        for r in cdc.merge_upsert(base, updates, ["k"], "ver").collect()
    }
    # k=1 untouched, k=2 newer version wins, k=3 tie -> updates side wins,
    # k=4 pure insert
    assert out == {1: ("a", 1), 2: ("B", 2), 3: ("C", 5), 4: ("D", 1)}


def test_merge_upsert_delete_then_reinsert(spark):
    base = spark.createDataFrame(
        [(1, "a", 1, "U"), (2, "b", 1, "U"), (3, "c", 1, "U")],
        "k long, v string, ver long, op string",
    )
    updates = spark.createDataFrame(
        [
            (1, None, 2, "D"),   # delete k=1 -> gone
            (2, None, 2, "D"),   # delete k=2 ...
            (2, "b2", 3, "U"),   # ... then re-insert at a later version
            (3, None, 1, "D"),   # stale tombstone: ties break to updates
        ],
        "k long, v string, ver long, op string",
    )
    out = {
        r.k: (r.v, r.ver)
        for r in cdc.merge_upsert(base, updates, ["k"], "ver", op_col="op").collect()
    }
    # k=1 deleted; k=2 revived by the later upsert; k=3's same-version
    # tombstone wins the tie (updates side is newer by contract)
    assert out == {2: ("b2", 3)}


def test_merge_upsert_null_op_is_upsert(spark):
    base = spark.createDataFrame([(1, "a", 1, None)], "k long, v string, ver long, op string")
    updates = spark.createDataFrame([(1, "A", 2, None)], "k long, v string, ver long, op string")
    out = cdc.merge_upsert(base, updates, ["k"], "ver", op_col="op").collect()
    assert [(r.k, r.v) for r in out] == [(1, "A")]


def test_scd2_delete_closes_key(spark):
    rows = [
        (1, "2024-01-01", 10, "U"),
        (1, "2024-02-01", 11, "D"),   # closes v10, emits nothing
        (1, "2024-03-01", 12, "U"),   # re-insert opens a new interval
        (2, "2024-01-15", 20, "U"),
        (2, "2024-04-01", 21, "D"),   # key 2 ends deleted: no current row
    ]
    df = spark.createDataFrame(rows, "k long, eff string, id long, op string").withColumn(
        "eff", F.col("eff").cast("date")
    )
    out = cdc.scd2_snapshot(df, ["k"], "eff", "id", op_col="op")
    rows_by_id = {r.id: r for r in out.collect()}
    assert set(rows_by_id) == {10, 12, 20}  # tombstones emit no rows
    assert str(rows_by_id[10].valid_to) == "2024-02-01"  # closed by delete
    assert not rows_by_id[10].is_current
    assert rows_by_id[12].valid_to is None and rows_by_id[12].is_current
    assert str(rows_by_id[20].valid_to) == "2024-04-01"
    assert not rows_by_id[20].is_current
    # key 2 was deleted last: zero current rows for it
    assert out.where("k = 2 and is_current").count() == 0


def test_scd2_snapshot_ranges(spark):
    rows = [
        (1, "2024-01-01", 10),
        (1, "2024-02-01", 11),
        (1, "2024-02-01", 12),  # same effective date: tiebreak on id
        (2, "2024-03-01", 20),
    ]
    df = spark.createDataFrame(rows, "k long, eff string, id long").withColumn(
        "eff", F.col("eff").cast("date")
    )
    out = cdc.scd2_snapshot(df, ["k"], "eff", "id")
    rows_by_id = {r.id: r for r in out.collect()}
    assert str(rows_by_id[10].valid_to) == "2024-02-01"
    assert str(rows_by_id[11].valid_to) == "2024-02-01"  # closed by the tied row
    assert rows_by_id[12].valid_to is None and rows_by_id[12].is_current
    assert rows_by_id[20].valid_to is None and rows_by_id[20].is_current
    # exactly one current row per key
    cur = out.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_incremental_agg_equals_full_recompute(spark):
    rows = [(k, float(v)) for k in (1, 2, 3) for v in range(1, 6)]
    df = spark.createDataFrame(rows, "k long, v double")
    hist = df.where("v <= 3")
    delta = df.where("v > 3")
    state = hist.groupBy("k").agg(
        F.sum("v").alias("v"), F.count("*").cast("long").alias("n_rows")
    )
    inc = {
        r["k"]: (r["v"], r["n_rows"])
        for r in cdc.incremental_agg(state, delta, ["k"], ["v"]).collect()
    }
    full = {
        r["k"]: (r["v"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("v"), F.count("*").alias("n"))
        .collect()
    }
    assert inc == full == {1: (15.0, 5), 2: (15.0, 5), 3: (15.0, 5)}
    # delta containing a NEW key materializes it in the merged state
    delta2 = spark.createDataFrame([(9, 2.0)], "k long, v double")
    merged = {
        r["k"]: (r["v"], r["n_rows"])
        for r in cdc.incremental_agg(state, delta2, ["k"], ["v"]).collect()
    }
    assert merged[9] == (2.0, 1) and merged[1] == (6.0, 3)


def test_guards_reject_nonpositive_knobs(spark, documents):
    from ai_etl_pipeline_spark.operators.dedup import passage_dedup
    from ai_etl_pipeline_spark.operators.similarity import kmeans_lloyd

    with pytest.raises(ValueError):
        passage_dedup(documents, window=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(documents.limit(1), "doc_id", "n_chars", k=0)


def test_corpus_profile_keeps_all_empty_strata(spark):
    from ai_etl_pipeline_spark.operators.textstats import corpus_profile

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "", "xx"), (3, "   ", "xx")],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in corpus_profile(df, "doc_id", "text", "lang").collect()}
    assert out["xx"].n_docs == 2
    assert out["xx"].total_tokens == 0 and out["xx"].vocab == 0
    assert out["en"].total_tokens == 2


def test_shard_manifest_order_insensitive_and_deterministic(spark):
    from ai_etl_pipeline_spark.operators import packing

    df = spark.createDataFrame(
        [(i, i % 3, f"t{i}") for i in range(30)], "id long, shard int, text string"
    )
    m1 = {r["shard"]: (r["n_rows"], r["content_hash"])
          for r in packing.shard_manifest(df, "shard", ["id", "text"]).collect()}
    # same rows, different partitioning/order -> identical manifest
    df2 = df.orderBy(F.col("id").desc()).repartition(7)
    m2 = {r["shard"]: (r["n_rows"], r["content_hash"])
          for r in packing.shard_manifest(df2, "shard", ["id", "text"]).collect()}
    assert m1 == m2 and len(m1) == 3
    # a single changed cell changes exactly that shard's hash
    df3 = df.withColumn(
        "text", F.when(F.col("id") == 4, F.lit("CHANGED")).otherwise(F.col("text"))
    )
    m3 = {r["shard"]: (r["n_rows"], r["content_hash"])
          for r in packing.shard_manifest(df3, "shard", ["id", "text"]).collect()}
    assert m3[4 % 3] != m1[4 % 3]
    assert all(m3[s] == m1[s] for s in m1 if s != 4 % 3)


def test_key_skew_report_orders_and_fractions(spark):
    from ai_etl_pipeline_spark.operators import relational

    df = spark.createDataFrame(
        [(1,)] * 50 + [(2,)] * 30 + [(3,)] * 20, "k long"
    )
    out = relational.key_skew_report(df, "k", top_k=2).collect()
    assert [(r["k"], r["n_rows"], r["frac"]) for r in out] == [
        (1, 50, 0.5),
        (2, 30, 0.3),
    ]
    import pytest

    with pytest.raises(ValueError):
        relational.key_skew_report(df, "k", top_k=0)
