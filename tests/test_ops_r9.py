"""Round-9 operators: k-core convergence certificate, directed
personalized PageRank (seed-directed dangling), CMS probe-parameter
validation, duplicate-id containment guard, bootstrap one-hash rewrite."""

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import dedup, distinct, graph, sampling


# ---------------------------------------------------------------- k-core

def test_k_core_converged_flag_true_on_clique(spark):
    # K4 is its own 2-core fixpoint after a single round
    nodes = ["a", "b", "c", "d"]
    e = spark.createDataFrame(
        [(u, v) for u in nodes for v in nodes if u < v], ["src", "dst"]
    )
    rows = graph.k_core(e, 2, iterations=2).collect()
    assert len(rows) == 4
    assert all(r["is_converged"] for r in rows)


def test_k_core_unconverged_flag_on_deep_chain(spark):
    # a path of 10 nodes peels one node from each end per round at k=2:
    # depth 5 > iterations=2, so the fixed-depth result is a SUPERSET
    # and the certificate must say so
    e = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(9)], ["src", "dst"]
    )
    out = graph.k_core(e, 2, iterations=2).collect()
    assert len(out) > 0  # superset, not yet empty
    assert all(not r["is_converged"] for r in out)
    # enough rounds: the chain peels to nothing — certificate via count
    assert graph.k_core(e, 2, iterations=6).count() == 0


# ------------------------------------------------- directed personalized PR

def test_pagerank_directed_personalized_seed_proximity(spark):
    # a->x, b->y, x/y sinks; seeding {a} must rank a and its neighbor x
    # above the un-seeded twin branch (b, y)
    e = spark.createDataFrame([("a", "x"), ("b", "y")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    rows = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            e, symmetric=False, iterations=6, seeds=seeds
        ).collect()
    }
    assert set(rows) == {"a", "b", "x", "y"}
    assert rows["a"] > rows["b"]
    assert rows["x"] > rows["y"]
    # non-seed, non-reachable branch decays toward zero (no uniform
    # teleport in personalized mode)
    assert rows["b"] < 100_000


def test_pagerank_directed_personalized_mass_conserved(spark):
    # teleport + seed-directed dangling re-entry keep total rank near
    # n*base (integer truncation drift only) even with genuine sinks
    e = spark.createDataFrame([("a", "x"), ("a", "y"), ("b", "x")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("b",)], ["node"])
    out = graph.pagerank(e, symmetric=False, iterations=8, seeds=seeds)
    total = out.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 4_000_000) < 4_000_000 * 0.02


# --------------------------------------------------------- CMS validation

def test_countmin_probe_depth_mismatch_raises(spark):
    items = spark.createDataFrame([("t", 1)], ["token", "v"])
    sketch = distinct.countmin_rollup(items, [], [], "token", depth=4, width=64)
    with pytest.raises(ValueError, match="depth"):
        distinct.countmin_estimate(
            sketch, items.select("token"), "token", depth=6, width=64
        ).collect()
    with pytest.raises(ValueError, match="width"):
        distinct.countmin_estimate(
            sketch, items.select("token"), "token", depth=4, width=16
        ).collect()


def test_countmin_inner_product_depth_mismatch_raises(spark):
    items = spark.createDataFrame([("t", 1)], ["token", "v"])
    s4 = distinct.countmin_rollup(items, [], [], "token", depth=4, width=64)
    s2 = distinct.countmin_rollup(items, [], [], "token", depth=2, width=64)
    with pytest.raises(ValueError, match="depths differ"):
        distinct.countmin_inner_product(s4, s2)


# ------------------------------------------------- containment dup-id guard

def test_containment_pairs_duplicate_id_raises(spark):
    # include a SECOND id sharing grams with the duplicated one: the
    # duplicate-only corpus has zero cross-id candidates, and AQE's
    # empty-relation propagation may then skip the guard subtree
    # before it runs (a scheduling race — harmless in the operator,
    # empty output can't mis-scale, but flaky as a test); a non-empty
    # candidate join forces the sizes side to evaluate
    df = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta"),
            ("d1", "alpha beta gamma delta"),
            ("d2", "alpha beta gamma delta epsilon"),
        ],
        ["doc_id", "text"],
    )
    with pytest.raises(Exception, match="duplicate doc id"):
        dedup.containment_pairs(df, "doc_id", "text", ngram=2).collect()


# ------------------------------------------------------ bootstrap rewrite

def test_poisson_bootstrap_single_aggregate_no_explode_of_corpus(spark):
    df = spark.createDataFrame(
        [(str(i), float(i)) for i in range(200)], ["id", "v"]
    )
    out = sampling.poisson_bootstrap(df, "id", "v", n_boot=8)
    rows = out.collect()
    assert len(rows) == 8
    # Poisson(1) weights: each replicate's effective n is near 200
    for r in rows:
        assert 140 <= r["n_eff"] <= 260
    # the corpus is never exploded: plan has ONE generate node and it
    # sits above a single-row aggregate (posexplode of the zipped sums)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("generate") == 1


# ------------------------------------------------------------- BPE training

def test_bpe_train_greedy_merge_semantics(spark):
    from ai_etl_pipeline_spark.operators import textstats

    # corpus: 'aaaa' x3, 'ab' x2 — round 1 must pick (a,a) with count 9
    # (greedy left-to-right: 'aaaa' contributes 3 adjacent (a,a) pairs
    # per word); round 2 sees 'aaaa' rewritten as (aa, aa) — i.e. the
    # merged symbol pairs with ITSELF, proving the rewrite is greedy
    # non-overlapping, not naive per-position
    df = spark.createDataFrame(
        [("aaaa aaaa aaaa ab ab",)], ["text"]
    )
    rows = {r["merge_round"]: r for r in textstats.bpe_train(df, rounds=2).collect()}
    r1, r2 = rows[1], rows[2]
    assert (r1["pair_left"], r1["pair_right"], r1["merged"]) == ("a", "a", "aa")
    # 'aaaa' has word frequency 3 and 3 adjacent (a,a) pairs per word
    assert r1["pair_count"] == 3 * 3
    assert r2["pair_left"] == "aa" and r2["pair_right"] == "aa"
    assert r2["merged"] == "aaaa"


def test_bpe_train_multibyte_and_round_count(spark):
    from ai_etl_pipeline_spark.operators import textstats

    df = spark.createDataFrame([("über über ok",)], ["text"])
    out = textstats.bpe_train(df, rounds=3).collect()
    assert len(out) == 3
    assert [r["merge_round"] for r in out] == [1, 2, 3]
    # first merge comes from the repeated word, weighted 2
    assert out[0]["pair_count"] == 2


# ------------------------------------------------------- 4:2:0 JPEG codec

def test_jpeg_420_roundtrip_bit_exact():
    from ai_etl_pipeline_spark.operators import multimodal as mm

    W, H = 32, 32
    yv = {(my, mx): (40 * my + 90 * mx + 17) % 256 for my in range(2) for mx in range(2)}
    cb = {(my, mx): (60 * my + 30 * mx + 80) % 256 for my in range(2) for mx in range(2)}
    cr = {(my, mx): (25 * my + 70 * mx + 150) % 256 for my in range(2) for mx in range(2)}
    y_rows = [[yv[(y // 16, x // 16)] for x in range(W)] for y in range(H)]
    cb_rows = [[cb[(y // 8, x // 8)] for x in range(W // 2)] for y in range(H // 2)]
    cr_rows = [[cr[(y // 8, x // 8)] for x in range(W // 2)] for y in range(H // 2)]
    d = mm.decode_jpeg(
        mm.encode_jpeg_ycbcr420(W, H, y_rows, cb_rows, cr_rows, restart_interval=1)
    )
    assert (d["width"], d["height"], d["bpp"]) == (W, H, 24)

    def clamp(v):
        return 0 if v < 0 else 255 if v > 255 else v

    rs = gs = bs = 0
    for key in yv:
        p, b, r = yv[key], cb[key] - 128, cr[key] - 128
        rs += clamp(int(round(p + 1.402 * r))) * 256
        gs += clamp(int(round(p - 0.344136 * b - 0.714136 * r))) * 256
        bs += clamp(int(round(p + 1.772 * b))) * 256
    n = W * H
    assert d["mean_r"] == round(rs / n, 3)
    assert d["mean_g"] == round(gs / n, 3)
    assert d["mean_b"] == round(bs / n, 3)


def test_jpeg_420_encoder_rejects_bad_dims_and_decoder_scope():
    import pytest as _pytest

    from ai_etl_pipeline_spark.operators import multimodal as mm

    with _pytest.raises(ValueError, match="multiples of 16"):
        mm.encode_jpeg_ycbcr420(8, 8, [[0] * 8] * 8, [[0] * 4] * 4, [[0] * 4] * 4)
    # lossless SOF3 still raises (progressive SOF2 is supported as of
    # r9 — see test_jpeg_progressive_*; subsampled SOF2 raises its own
    # error, tested separately)
    w = 16
    y_rows = [[128] * w for _ in range(w)]
    data = bytearray(
        mm.encode_jpeg_ycbcr420(w, w, y_rows, [[128] * 8] * 8, [[128] * 8] * 8)
    )
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC3
    with _pytest.raises(ValueError, match="baseline"):
        mm.decode_jpeg(bytes(data))
    # sampling factors beyond 2x2 rejected (Y hv byte: FF C0 len(2)
    # precision(1) height(2) width(2) nc(1) comp1-id(1) -> +11)
    data = bytearray(
        mm.encode_jpeg_ycbcr420(w, w, y_rows, [[128] * 8] * 8, [[128] * 8] * 8)
    )
    data[sof + 11] = 0x44  # Y sampling 4x4
    with _pytest.raises(ValueError, match="beyond 2x2"):
        mm.decode_jpeg(bytes(data))
    # truncated SOF (corrupt component count) raises cleanly, not a
    # struct.error that would leak past decode_media's ValueError guard
    data = bytearray(
        mm.encode_jpeg_ycbcr420(w, w, y_rows, [[128] * 8] * 8, [[128] * 8] * 8)
    )
    data[sof + 9] = 68
    with _pytest.raises(ValueError, match="truncated JPEG SOF"):
        mm.decode_jpeg(bytes(data))


def test_bpe_apply_compression_consistent_with_train(spark):
    from ai_etl_pipeline_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "hello hello world"), (2, "hello world world ok")],
        ["doc_id", "text"],
    )
    merges = textstats.bpe_train(df, rounds=4)
    out = {r["doc_id"]: r for r in textstats.bpe_apply(df, merges).collect()}
    # every merge strictly reduces symbol count where it applies;
    # tokens never exceed chars, never drop below word count
    for d, r in out.items():
        assert r["n_bpe_tokens"] <= r["n_chars"]
        assert r["n_bpe_tokens"] >= r["n_words"]
    assert out[1]["n_words"] == 3 and out[1]["n_chars"] == 15
    # 4 merges on this tiny corpus collapse repeated words hard
    assert out[1]["n_bpe_tokens"] < out[1]["n_chars"]
    # max_merges guard
    with pytest.raises(ValueError, match="max_merges"):
        textstats.bpe_apply(df, merges, max_merges=2)


# ----------------------------------------------------- progressive JPEG

def test_jpeg_progressive_equals_baseline_decode():
    # successive approximation is lossless once all refinement scans
    # land: the progressive decode must be IDENTICAL to the baseline
    # decode of the same pixels — full-content cross-check (DC first +
    # refine, AC first with EOB runs, AC correction-bit refinement)
    from ai_etl_pipeline_spark.operators import multimodal as mm

    W, H = 24, 16
    rows = [
        [(x * 7 + y * 13 + ((x * y) % 5) * 11) % 256 for x in range(W)]
        for y in range(H)
    ]
    for quant in (None, [1 + (k % 7) for k in range(64)]):
        db = mm.decode_jpeg(mm.encode_jpeg_gray8(W, H, rows, quant=quant))
        dp = mm.decode_jpeg(
            mm.encode_jpeg_progressive_gray8(W, H, rows, quant=quant)
        )
        assert db == dp


def test_jpeg_progressive_negative_dc_and_sparse_ac():
    from ai_etl_pipeline_spark.operators import multimodal as mm

    # dark image (negative DC after level shift) with one bright pixel
    # per block (sparse AC across all magnitudes/signs)
    W = H = 16
    rows = [[3] * W for _ in range(H)]
    rows[2][5] = 250
    rows[10][13] = 199
    db = mm.decode_jpeg(mm.encode_jpeg_gray8(W, H, rows))
    dp = mm.decode_jpeg(mm.encode_jpeg_progressive_gray8(W, H, rows))
    assert db == dp


def test_jpeg_progressive_420_equals_baseline_420():
    # subsampled PROGRESSIVE (the real-photo progressive layout):
    # interleaved DC scans over 16x16 MCUs + per-component AC scans
    # walking each component's own grid; lossless once refinements
    # complete, so it must equal the baseline 4:2:0 decode exactly
    from ai_etl_pipeline_spark.operators import multimodal as mm

    W, H = 32, 16
    y_rows = [
        [(x * 5 + y * 9 + ((x + y) % 7) * 13) % 256 for x in range(W)]
        for y in range(H)
    ]
    cb_rows = [[(x * 11 + y * 3) % 256 for x in range(W // 2)] for y in range(H // 2)]
    cr_rows = [
        [(x * 2 + y * 17 + 40) % 256 for x in range(W // 2)] for y in range(H // 2)
    ]
    for quant in (None, [1 + (k % 5) for k in range(64)]):
        db = mm.decode_jpeg(
            mm.encode_jpeg_ycbcr420(W, H, y_rows, cb_rows, cr_rows, quant=quant)
        )
        dp = mm.decode_jpeg(
            mm.encode_jpeg_progressive_ycbcr420(
                W, H, y_rows, cb_rows, cr_rows, quant=quant
            )
        )
        assert db == dp


# ------------------------------------------------- receipts & overlap

def test_pagerank_delta_receipt_shrinks_with_iterations(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")], ["src", "dst"]
    )
    d2 = graph.pagerank(e, iterations=2, delta_receipt=True).collect()[0][
        "max_delta"
    ]
    d10 = graph.pagerank(e, iterations=10, delta_receipt=True).collect()[0][
        "max_delta"
    ]
    # power iteration converges geometrically: the late delta must be
    # far below the early one, and the receipt is the same on all rows
    assert d10 < d2
    assert d10 < 50_000  # < 0.05 rank units at base=1e6 after 10 iters
    rows = graph.pagerank(e, iterations=3, delta_receipt=True).collect()
    assert len({r["max_delta"] for r in rows}) == 1
    # without the flag the column is absent (schema unchanged for old callers)
    assert "max_delta" not in graph.pagerank(e, iterations=2).columns


def test_hll_overlap_report_bounds(spark):
    # two segments with known overlap: A = 0..999, B = 500..1499
    rows = [("A", str(i)) for i in range(1000)] + [
        ("B", str(i)) for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, ["seg", "val"])
    r = distinct.hll_overlap_report(df, "seg", "val").collect()
    assert len(r) == 1
    row = r[0]
    assert (row["seg_a"], row["seg_b"]) == ("A", "B")
    assert abs(row["approx_union"] - 1500) / 1500 < 0.10
    assert abs(row["approx_intersection"] - 500) / 500 < 0.25


# -------------------------------------------- weighted PR / temperature mix

def test_pagerank_weighted_follows_volume(spark):
    # a-b with weight 99 vs a-c with weight 1: b must far outrank c
    e = spark.createDataFrame(
        [("a", "b", 99), ("a", "c", 1)], ["src", "dst", "w"]
    )
    rows = {
        r["node"]: r
        for r in graph.pagerank(e, iterations=6, weight_col="w").collect()
    }
    assert rows["b"]["rank"] > 2 * rows["c"]["rank"]
    # degree column is now out-STRENGTH
    assert rows["a"]["degree"] == 100
    # unweighted on the same topology treats b and c equally
    u = {
        r["node"]: r["rank"]
        for r in graph.pagerank(e.drop("w"), iterations=6).collect()
    }
    assert u["b"] == u["c"]
    # non-positive weights fail loudly
    bad = spark.createDataFrame([("a", "b", 0)], ["src", "dst", "w"])
    with pytest.raises(Exception, match="positive"):
        graph.pagerank(bad, iterations=2, weight_col="w").collect()


def test_temperature_mixture_rebalances_toward_uniform(spark):
    # 900 docs in A, 100 in B: tau=2 rates ~ sqrt -> B up-samples, A thins
    rows = [(i, "A") for i in range(900)] + [(i + 900, "B") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.temperature_mixture(df, "doc_id", "source", temperature=2.0)
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # weights sqrt(900)=30 vs sqrt(100)=10 -> p_A=3/4 of N=1000 -> rate
    # 750/900 = 0.833 (thinning), p_B=1/4 -> rate 250/100 = 2.5 (x2 + 50%)
    assert abs(by["A"] - 750) <= 40
    assert abs(by["B"] - 250) <= 25
    # total preserved in expectation (pure rebalance)
    assert abs((by["A"] + by["B"]) - 1000) <= 60
    with pytest.raises(ValueError, match="temperature"):
        sampling.temperature_mixture(df, "doc_id", "source", temperature=0)


# ------------------------------------------------------- label propagation

def test_label_propagation_components_two_islands(spark):
    # two disjoint paths: labels converge to each island's min id
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z")], ["src", "dst"]
    )
    out = graph.label_propagation(
        e, iterations=4, mode="components", change_receipt=True
    ).collect()
    lab = {r["node"]: r["label"] for r in out}
    assert lab == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}
    assert all(r["n_changed"] == 0 for r in out)  # 4 rounds >= radius


def test_label_propagation_receipt_flags_short_rounds(spark):
    # a 8-node path needs 7 rounds from the min end; 2 rounds must
    # report unfinished propagation through n_changed > 0
    e = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(7)], ["src", "dst"]
    )
    out = graph.label_propagation(
        e, iterations=2, mode="components", change_receipt=True
    ).collect()
    assert out[0]["n_changed"] > 0
    done = graph.label_propagation(
        e, iterations=8, mode="components", change_receipt=True
    ).collect()
    assert all(r["n_changed"] == 0 for r in done)
    assert len({r["label"] for r in done}) == 1


def test_label_propagation_communities_two_cliques(spark):
    # two triangles joined by one bridge edge: majority vote locks each
    # triangle onto its min label; the single bridge vote never wins
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("p", "q"), ("q", "r"), ("p", "r")]
    e = spark.createDataFrame(tri1 + tri2 + [("c", "p")], ["src", "dst"])
    out = graph.label_propagation(e, iterations=4, mode="communities").collect()
    lab = {r["node"]: r["label"] for r in out}
    assert len({lab["a"], lab["b"], lab["c"]}) == 1
    assert len({lab["p"], lab["q"], lab["r"]}) == 1
    assert lab["a"] != lab["p"]


def test_label_propagation_validates(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError, match="iterations"):
        graph.label_propagation(e, iterations=0)
    with pytest.raises(ValueError, match="mode"):
        graph.label_propagation(e, mode="majority")


# ------------------------------------------------------- JL projection

def test_random_projection_shape_and_norms(spark):
    from ai_etl_pipeline_spark.operators import similarity
    import math
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.random_projection(
        df, in_dim=8, out_dim=4, salt="t"
    ).collect()
    assert all(len(r["proj"]) == 4 for r in out)
    # JL: mean squared-norm ratio close to 1 across vectors
    ratios = []
    for r in out:
        on = math.sqrt(sum(x * x for x in r["embedding"]))
        pn = math.sqrt(sum(x * x for x in r["proj"]))
        if on > 0:
            ratios.append((pn / on) ** 2)
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 1.5
    # replayable sign matrix
    s = similarity.random_projection_signs(8, 4, "t")
    assert len(s) == 4 and len(s[0]) == 8
    assert all(v in (1, -1) for row in s for v in row)
    r0 = out[0]
    j = 0
    expect = round(
        (1.0 / math.sqrt(4.0))
        * sum(s[j][i] * r0["embedding"][i] for i in range(8)),
        6,
    )
    assert abs(r0["proj"][j] - expect) < 1e-9


def test_random_projection_ragged_vector_raises(spark):
    from ai_etl_pipeline_spark.operators import similarity
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="expected 2-dim"):
        similarity.random_projection(df, in_dim=2, out_dim=2).collect()
    with pytest.raises(ValueError, match="out_dim"):
        similarity.random_projection(df, in_dim=2, out_dim=0)


# ---------------------------------------------------------------- HITS

def test_hits_star_center_is_authority(spark):
    # leaves all point at the center: center = sole authority with the
    # whole auth mass (n*base), zero hub; leaves = equal hubs, zero auth
    e = spark.createDataFrame(
        [("l1", "c"), ("l2", "c"), ("l3", "c")], ["src", "dst"]
    )
    rows = {r["node"]: r for r in graph.hits(e, iterations=3).collect()}
    assert rows["c"]["auth"] == 4 * 1_000_000 and rows["c"]["hub"] == 0
    hubs = {rows[n]["hub"] for n in ("l1", "l2", "l3")}
    assert len(hubs) == 1 and rows["l1"]["auth"] == 0


def test_hits_integer_exact_vs_python_replica(spark):
    # bit-exactness contract: replicate the integer algorithm in plain
    # Python on a mixed-role graph and demand EXACT equality
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"), ("d", "c")]
    base, iters = 1_000_000, 4
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    total = len(nodes) * base
    hub = {n: base for n in nodes}
    auth = {}
    for _ in range(iters):
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[v] += hub[u]
        s = sum(raw.values())
        auth = {n: raw[n] * total // s for n in nodes}
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[u] += auth[v]
        s = sum(raw.values())
        hub = {n: raw[n] * total // s for n in nodes}
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in graph.hits(
            spark.createDataFrame(edges, ["src", "dst"]), iterations=iters
        ).collect()
    }
    assert got == {n: (hub[n], auth[n]) for n in nodes}


def test_hits_ignores_self_loops_and_parallel_edges(spark):
    clean = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    noisy = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("a", "a"), ("c", "c")],
        ["src", "dst"],
    )
    c = {r["node"]: (r["hub"], r["auth"]) for r in graph.hits(clean).collect()}
    n = {r["node"]: (r["hub"], r["auth"]) for r in graph.hits(noisy).collect()}
    assert c == n


def test_hits_self_loop_only_graph_is_empty(spark):
    # a self-loop is removed, leaving no edges -> no nodes -> zero rows
    e = spark.createDataFrame([("a", "a")], ["src", "dst"])
    assert graph.hits(e, iterations=1).count() == 0


# ------------------------------------------------------------- k-hop BFS

def test_k_hop_chain_distances(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in graph.k_hop_distances(e, seeds, max_hops=3).collect()
    }
    # e is 4 hops away -> absent at max_hops=3
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_k_hop_min_distance_wins_multi_seed(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("z", "c")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",), ("z",)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in graph.k_hop_distances(e, seeds, max_hops=3).collect()
    }
    assert got["c"] == 1  # via z, not the 2-hop path via a


def test_k_hop_symmetric_reaches_backwards(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("b",)], ["node"])
    directed = {
        r["node"]: r["dist"]
        for r in graph.k_hop_distances(e, seeds, max_hops=2).collect()
    }
    undirected = {
        r["node"]: r["dist"]
        for r in graph.k_hop_distances(
            e, seeds, max_hops=2, symmetric=True
        ).collect()
    }
    assert directed == {"b": 0}
    assert undirected == {"b": 0, "a": 1}


def test_k_hop_seed_outside_graph_kept_at_zero(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("q",)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in graph.k_hop_distances(e, seeds, max_hops=2).collect()
    }
    assert got == {"q": 0}


# ------------------------------------------------------ k-anonymity

def test_k_anonymity_report_counts(spark):
    from ai_etl_pipeline_spark.operators import validate

    rows = [
        ("us", "a", 1), ("us", "a", 2), ("us", "a", 2),   # class size 3, l=2
        ("fr", "b", 5),                                    # class size 1, l=1
        ("de", "c", 7), ("de", "c", 7),                    # class size 2, l=1
    ]
    df = spark.createDataFrame(rows, ["nation", "segment", "val"])
    r = validate.k_anonymity_report(
        df, ["nation", "segment"], k=2, sensitive_col="val"
    ).collect()[0]
    assert r["n_rows"] == 6 and r["n_classes"] == 3
    assert r["k_anonymity"] == 1 and not r["meets_k"]
    assert r["n_classes_below_k"] == 1 and r["n_rows_below_k"] == 1
    assert r["l_diversity"] == 1


def test_k_anonymity_meets_k_without_sensitive(spark):
    from ai_etl_pipeline_spark.operators import validate

    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 3), ("y", 4)], ["g", "v"]
    )
    r = validate.k_anonymity_report(df, ["g"], k=2).collect()[0]
    assert r["meets_k"] and r["k_anonymity"] == 2
    assert "l_diversity" not in r.asDict()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate.k_anonymity_report(df, ["g"], k=0)


# ------------------------------------------- semantic decontamination

def test_semantic_decontaminate_drops_near_benchmark(spark):
    # corpus doc 1 is (nearly) identical to benchmark doc 100 -> dropped;
    # doc 2 is orthogonal -> survives even in the same bucket universe
    rows = [
        (1, [1.0, 0.0, 1.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 1.0]),
    ]
    bench = [(100, [1.0, 0.0, 1.0, 0.0])]
    c = spark.createDataFrame(rows, ["vec_id", "embedding"])
    b = spark.createDataFrame(bench, ["vec_id", "embedding"])
    out = dedup.semantic_decontaminate(c, b, min_similarity=0.9, num_bits=2)
    assert [r["vec_id"] for r in out.collect()] == [2]


def test_semantic_decontaminate_keeps_all_on_empty_benchmark(spark):
    c = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    b = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = dedup.semantic_decontaminate(c, b, min_similarity=0.5, num_bits=1)
    assert out.count() == 2


# -------------------------------------------------- target encoding

def test_target_encode_leaves_own_fold_out(spark):
    from ai_etl_pipeline_spark.operators import enrich

    # two folds (k=2): category 'a' rows land in both folds; each
    # fold's encoding must exclude its own fold's rows
    rows = [(i, "a", 100 + i) for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "cat", "t"])
    out = enrich.target_encode(df, "cat", "t", "id", k=2, smoothing=1)
    got = {r["fold"]: r for r in out.collect()}
    total_n, total_s = 40, sum(100 + i for i in range(40))
    prior = total_s // total_n
    for fold, r in got.items():
        assert r["n_out"] + (total_n - r["n_out"]) == total_n
        assert r["n_out"] < total_n  # own fold genuinely excluded
        expect = (r["sum_out"] + 1 * prior) // (r["n_out"] + 1)
        assert r["target_enc"] == expect


def test_target_encode_cold_category_degrades_to_prior(spark):
    from ai_etl_pipeline_spark.operators import enrich

    # category 'cold' has rows in exactly one fold -> that fold's
    # n_out = 0 and the encoding equals the global prior
    rows = [(i, "warm", 1000) for i in range(50)]
    df = spark.createDataFrame(rows + [(999, "cold", 0)], ["id", "cat", "t"])
    out = enrich.target_encode(df, "cat", "t", "id", k=5, smoothing=10)
    cold = [r for r in out.collect() if r["cat"] == "cold"][0]
    prior = (50 * 1000 + 0) // 51
    assert cold["n_out"] == 0
    assert cold["target_enc"] == prior


def test_target_encode_validations(spark):
    from ai_etl_pipeline_spark.operators import enrich

    df = spark.createDataFrame([(1, "a", 2)], ["id", "cat", "t"])
    with pytest.raises(ValueError):
        enrich.target_encode(df, "cat", "t", "id", k=1)
    with pytest.raises(ValueError):
        enrich.target_encode(df, "cat", "t", "id", smoothing=0)


def test_hits_renormalization_survives_wide_mass(spark):
    # n^2 * base^2 ~ 1e24 overflowed a bigint product before the
    # decimal(38,0) intermediate (caught by the 8M-node scale bench)
    n = 200
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], ["src", "dst"]
    )
    rows = graph.hits(e, iterations=2, base=10**9).collect()
    assert len(rows) == n
    assert all(r["hub"] >= 0 and r["auth"] >= 0 for r in rows)


# -------------------------------------------------- multi-probe LSH

def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    from ai_etl_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 20)
    exact = similarity.brute_force_knn(emb, qs, k=5)
    single = similarity.lsh_knn(emb, qs, k=5, num_bits=6)
    multi = similarity.lsh_knn(emb, qs, k=5, num_bits=6, multiprobe=3)
    rep = {
        r["tier"]: r
        for r in similarity.recall_report(
            exact, {"single": single, "multi": multi}
        ).collect()
    }
    assert rep["multi"]["recall_micro"] >= rep["single"]["recall_micro"]
    assert rep["multi"]["n_candidates"] >= rep["single"]["n_candidates"]


def test_lsh_multiprobe_validation(spark):
    from ai_etl_pipeline_spark.operators import similarity

    emb = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        similarity.lsh_knn(emb, emb, num_bits=2, multiprobe=3)


# -------------------------------------------------- mean pooling

def test_mean_pool_integer_exact(spark):
    from ai_etl_pipeline_spark.operators import similarity

    rows = [
        (1, "d1", [1.0, -2.0]),
        (2, "d1", [2.0, -3.0]),
        (3, "d2", [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "doc", "embedding"])
    got = {
        r["doc"]: (r["n_chunks"], list(r["pooled"]))
        for r in similarity.mean_pool_embeddings(df, "doc").collect()
    }
    # d1: sums (3e6, -5e6) over 2 chunks -> (1_500_000, -2_500_000)
    assert got["d1"] == (2, [1_500_000, -2_500_000])
    assert got["d2"] == (1, [500_000, 500_000])


def test_mean_pool_order_invariance(spark):
    from ai_etl_pipeline_spark.operators import similarity

    rows = [(i, "d", [0.1 * i, -0.1 * i]) for i in range(1, 30)]
    a = similarity.mean_pool_embeddings(
        spark.createDataFrame(rows, ["vec_id", "doc", "embedding"]), "doc"
    ).collect()[0]
    b = similarity.mean_pool_embeddings(
        spark.createDataFrame(rows[::-1], ["vec_id", "doc", "embedding"])
        .repartition(7),
        "doc",
    ).collect()[0]
    assert list(a["pooled"]) == list(b["pooled"])


# -------------------------------------------------- basket rules

def test_market_basket_rules_exact_ratios(spark):
    from ai_etl_pipeline_spark.operators import relational

    # 4 txns; {x,y} together in 2; x in 3, y in 2; z rides alone
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "z"),
    ]
    df = spark.createDataFrame(rows, ["txn", "item"])
    out = relational.market_basket_rules(df, "txn", "item", min_pair_count=2)
    r = out.collect()
    assert len(r) == 1 and (r[0]["item_a"], r[0]["item_b"]) == ("x", "y")
    assert r[0]["pair_count"] == 2
    assert r[0]["support_micro"] == 2 * 1_000_000 // 4
    assert r[0]["conf_a_to_b_micro"] == 2 * 1_000_000 // 3
    assert r[0]["conf_b_to_a_micro"] == 1_000_000
    # lift = (2/4) / ((3/4)*(2/4)) = 4/3
    assert r[0]["lift_micro"] == 2 * 4 * 1_000_000 // (3 * 2)


def test_market_basket_rules_dedups_repeat_lines(spark):
    from ai_etl_pipeline_spark.operators import relational

    # the same (txn, item) line twice must count once
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, ["txn", "item"])
    r = relational.market_basket_rules(df, "txn", "item").collect()
    assert r[0]["pair_count"] == 2 and r[0]["conf_a_to_b_micro"] == 1_000_000


# ------------------------------------------- incremental pagerank

def test_pagerank_warm_start_equals_straight_run(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    straight = {
        r["node"]: r["rank"] for r in graph.pagerank(e, iterations=6).collect()
    }
    snap = graph.pagerank(e, iterations=2).select("node", "rank")
    warm = {
        r["node"]: r["rank"]
        for r in graph.pagerank(e, iterations=4, init_ranks=snap).collect()
    }
    assert warm == straight


def test_pagerank_warm_start_new_node_enters_at_base(spark):
    old = spark.createDataFrame([("a", "b")], ["src", "dst"])
    snap = graph.pagerank(old, iterations=2).select("node", "rank")
    grown = spark.createDataFrame(
        [("a", "b"), ("b", "z")], ["src", "dst"]
    )
    out = {r["node"]: r["rank"] for r in graph.pagerank(
        grown, iterations=1, init_ranks=snap
    ).collect()}
    # z was absent from the snapshot; it participates (fresh at base)
    assert "z" in out and out["z"] > 0


# -------------------------------------------------------- ROC-AUC

def test_auc_perfect_and_inverted_separation(spark):
    from ai_etl_pipeline_spark.operators import validate

    rows = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    perfect = validate.auc_report(
        spark.createDataFrame(rows, ["score", "label"]), "score", "label"
    ).collect()[0]
    assert perfect["auc_micro"] == 1_000_000
    inverted = validate.auc_report(
        spark.createDataFrame(
            [(s, 1 - y) for s, y in rows], ["score", "label"]
        ),
        "score",
        "label",
    ).collect()[0]
    assert inverted["auc_micro"] == 0


def test_auc_ties_get_half_credit(spark):
    from ai_etl_pipeline_spark.operators import validate

    # all scores equal: AUC must be exactly 1/2
    rows = [(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)]
    r = validate.auc_report(
        spark.createDataFrame(rows, ["score", "label"]), "score", "label"
    ).collect()[0]
    assert r["auc_micro"] == 500_000
    assert (r["n_pos"], r["n_neg"]) == (2, 2)


def test_auc_matches_sklearn_style_hand_calc(spark):
    from ai_etl_pipeline_spark.operators import validate

    rows = [(0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1)]
    # pairs: (0.35 vs 0.1 win), (0.35 vs 0.4 loss), (0.8 vs both wins)
    # AUC = 3/4
    r = validate.auc_report(
        spark.createDataFrame(rows, ["score", "label"]), "score", "label"
    ).collect()[0]
    assert r["auc_micro"] == 750_000
