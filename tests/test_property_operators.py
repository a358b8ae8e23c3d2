"""Property-based tests (hypothesis) for the operators whose semantics
have clean independent reference implementations:

- near_duplicate_clusters vs a driver-side union-find over the same
  random pair relation;
- asof_join vs pandas.merge_asof (the semantics the operator claims).

Examples are kept small and few: each example pays a Spark job, so the
value is in randomized structure (chains, stars, ties, empty sides), not
example count.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_etl_pipeline_spark.operators import dedup, relational

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _union_find_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labeling: fully compress, then label = root (root IS the
    # component min because unions always parent the larger root)
    return {i: find(i) for i in range(n_nodes)}


@given(
    n_nodes=st.integers(min_value=1, max_value=14),
    edge_idx=st.lists(
        st.tuples(st.integers(0, 13), st.integers(0, 13)), max_size=20
    ),
)
@settings(**_SETTINGS)
def test_clusters_match_union_find(spark, n_nodes, edge_idx):
    edges = [(a % n_nodes, b % n_nodes) for a, b in edge_idx if a % n_nodes != b % n_nodes]
    expected = _union_find_components(n_nodes, edges)
    ids = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup.near_duplicate_clusters(pairs, ids, "doc_id")
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == expected
    sizes = {r["cluster_id"]: r["cluster_size"] for r in out.collect()}
    from collections import Counter

    assert sizes == Counter(expected.values())


@given(
    left_rows=st.lists(
        st.tuples(st.sampled_from(["u", "v"]), st.integers(0, 30)), min_size=1, max_size=12
    ),
    right_rows=st.lists(
        st.tuples(st.sampled_from(["u", "v"]), st.integers(0, 30)), max_size=8
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left_rows)]
    # merge_asof contract: right unique per (key, ts)
    right_rows = sorted({(k, t) for k, t in right_rows})
    right_rows = [(k, t, float(t) + 0.5) for k, t in right_rows]

    left = spark.createDataFrame(left_rows, "event_id long, k string, ts long")
    if right_rows:
        right = spark.createDataFrame(right_rows, "k string, ts long, px double")
    else:
        right = spark.createDataFrame([], "k string, ts long, px double")
    got = {
        r["event_id"]: (r["__asof_ts"], r["px"])
        for r in relational.asof_join(
            left, right, on="k", right_cols=["px"]
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "px"]).sort_values("ts")
    if len(rp):
        merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        expected = {
            int(r.event_id): (
                None if pd.isna(r.px) else int(round(r.px - 0.5)),
                None if pd.isna(r.px) else r.px,
            )
            for r in merged.itertuples()
        }
    else:
        expected = {int(i): (None, None) for i, _, _ in left_rows}
    assert got == expected


def _ref_next_fit(lengths: list[int], cap: int) -> list[tuple[int, int]]:
    """Reference next-fit packer: (seq_id, offset) per doc in order."""
    out, seq, fill = [], -1, cap + 1
    for n in lengths:
        if fill + n > cap:
            seq, fill = seq + 1, n
            out.append((seq, 0))
        else:
            out.append((seq, fill))
            fill += n
    return out


@given(
    lengths=st.lists(st.integers(0, 12), min_size=1, max_size=24),
    cap=st.integers(min_value=1, max_value=16),
)
@settings(**_SETTINGS)
def test_next_fit_pack_matches_reference(spark, lengths, cap):
    from ai_etl_pipeline_spark.operators import packing

    df = spark.createDataFrame(
        [("g", i, n) for i, n in enumerate(lengths)], "grp string, id long, n long"
    )
    out = {
        r.id: (r.seq_id, r.offset)
        for r in packing.next_fit_pack(df, ["grp"], "id", "n", cap).collect()
    }
    expected = dict(enumerate(_ref_next_fit(lengths, cap)))
    assert out == expected


@given(
    lengths=st.lists(st.integers(0, 40), min_size=1, max_size=24),
    cap=st.integers(min_value=1, max_value=16),
)
@settings(**_SETTINGS)
def test_chunk_pack_tiles_the_stream_exactly(spark, lengths, cap):
    from ai_etl_pipeline_spark.operators import packing

    df = spark.createDataFrame(
        [("g", i, n) for i, n in enumerate(lengths)], "grp string, id long, n long"
    )
    rows = packing.chunk_pack(df, "id", "n", cap, "grp").collect()
    # per-doc coverage: slices tile [0, n) without gaps or overlap
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append((r.tok_from, r.tok_to))
    for i, n in enumerate(lengths):
        if n == 0:
            assert i not in by_doc
            continue
        spans = sorted(by_doc[i])
        assert spans[0][0] == 0 and spans[-1][1] == n
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    # per-chunk fill: every chunk except the last is exactly full
    fills: dict[int, int] = {}
    for r in rows:
        fills[r.chunk_id] = fills.get(r.chunk_id, 0) + (r.tok_to - r.tok_from)
    if fills:
        last = max(fills)
        assert all(v == cap for c, v in fills.items() if c != last)
        assert 0 < fills[last] <= cap


@given(
    base=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 5)), max_size=12),
    updates=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 5)), max_size=12),
)
@settings(**_SETTINGS)
def test_merge_upsert_matches_reference(spark, base, updates):
    from ai_etl_pipeline_spark.operators import cdc

    # reference: per key, max version wins; ties -> updates side; within
    # one side the operator may pick either tied row, so make rows
    # unique per (side, key, version) to keep the reference well-defined
    base = list({(k, v): None for k, v in base})
    updates = list({(k, v): None for k, v in updates})
    bdf = spark.createDataFrame(
        [(k, v, f"b{k}-{v}") for k, v in base] or [], "k int, ver int, payload string"
    ) if base else spark.createDataFrame([], "k int, ver int, payload string")
    udf_ = spark.createDataFrame(
        [(k, v, f"u{k}-{v}") for k, v in updates] or [], "k int, ver int, payload string"
    ) if updates else spark.createDataFrame([], "k int, ver int, payload string")
    # reference: rank all rows, updates preferred on version ties
    allrows = [(k, v, 0, f"b{k}-{v}") for k, v in base] + [
        (k, v, 1, f"u{k}-{v}") for k, v in updates
    ]
    expected = {}
    for k, v, src, payload in allrows:
        cur = expected.get(k)
        if cur is None or (v, src) > (cur[0], cur[1]):
            expected[k] = (v, src, payload)
    out = {
        r.k: r.payload for r in cdc.merge_upsert(bdf, udf_, ["k"], "ver").collect()
    }
    assert out == {k: p for k, (v, s, p) in expected.items()}


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-100, 100)), min_size=1, max_size=30
    ),
    split=st.integers(0, 29),
)
@settings(**_SETTINGS)
def test_incremental_agg_matches_full(spark, rows, split):
    """agg(state ∪ agg(delta)) == agg(full) for any split point —
    the decomposability contract, checked against a pandas groupby."""
    from ai_etl_pipeline_spark.operators import cdc
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(rows, columns=["k", "v"]).astype({"v": "float64"})
    split = min(split, len(rows))
    hist, delta = pdf.iloc[:split], pdf.iloc[split:]

    state_pdf = (
        hist.groupby("k").agg(v=("v", "sum"), n_rows=("v", "size")).reset_index()
        if len(hist)
        else pd.DataFrame(columns=["k", "v", "n_rows"])
    )
    state = spark.createDataFrame(
        [(int(r.k), float(r.v), int(r.n_rows)) for r in state_pdf.itertuples()],
        "k long, v double, n_rows long",
    )
    delta_df = spark.createDataFrame(
        [(int(k), float(v)) for k, v in delta.itertuples(index=False)]
        if len(delta)
        else [],
        "k long, v double",
    )
    got = {
        r["k"]: (r["v"], r["n_rows"])
        for r in cdc.incremental_agg(state, delta_df, ["k"], ["v"]).collect()
    }
    want = {
        int(k): (float(g["v"].sum()), int(len(g)))
        for k, g in pdf.groupby("k")
    }
    assert got == want


@given(
    n_tokens=st.integers(0, 40),
    chunk=st.integers(1, 10),
    stride=st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_overlap_chunks_cover_and_reconstruct(spark, n_tokens, chunk, stride):
    """Every token index is covered; non-overlapping configs (stride ==
    chunk) reconstruct the document exactly from concatenated chunks.
    (stride > chunk is rejected by the operator — it would skip tokens,
    an edge this very test caught.)"""
    from ai_etl_pipeline_spark.operators import packing

    if stride > chunk:
        with pytest.raises(ValueError, match="skip tokens"):
            packing.overlap_chunks(
                spark.createDataFrame([(1, "a b")], "doc_id long, text string"),
                "doc_id", "text", chunk_tokens=chunk, stride=stride,
            )
        return
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = packing.overlap_chunks(df, "doc_id", "text", chunk_tokens=chunk, stride=stride)
    rows = sorted(out.collect(), key=lambda r: r["chunk_no"])
    if n_tokens == 0:
        assert rows == []
        return
    covered = set()
    for r in rows:
        start = r["chunk_no"] * stride
        toks = r["chunk_text"].split(" ")
        assert toks == [f"w{i}" for i in range(start, min(start + chunk, n_tokens))]
        assert r["chunk_len"] == len(toks)
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(n_tokens))
    if stride == chunk:
        rebuilt = " ".join(r["chunk_text"] for r in rows)
        assert rebuilt == text.lower()


# ---------------------------------------------------------------------------
# round-6 wave 4: substring spans + BM25 vs reference implementations
# ---------------------------------------------------------------------------

def _ref_duplicate_spans(docs: list[tuple[int, str]], n: int) -> set[tuple[int, int, int]]:
    """Driver-side reference: dup grams -> covered positions -> merged
    maximal spans (1-based, inclusive)."""
    toks = {i: t.lower().split() for i, t in docs}
    gram_docs: dict[tuple, set] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            gram_docs.setdefault(tuple(ts[p : p + n]), set()).add(i)
    spans = set()
    for i, ts in toks.items():
        covered = sorted(
            p
            for p in range(len(ts) - n + 1)
            if len(gram_docs[tuple(ts[p : p + n])]) >= 2
        )
        start = end = None
        for p in covered:
            s, e = p + 1, p + n  # 1-based inclusive token interval
            if start is None or s > end:  # the operator's island rule
                if start is not None:
                    spans.add((i, start, end))
                start, end = s, e
            else:
                end = max(end, e)
        if start is not None:
            spans.add((i, start, end))
    return spans


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_duplicate_spans_match_reference(spark, docs, n):
    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_ngram_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            n=n,
        ).collect()
    }
    assert got == _ref_duplicate_spans(rows, n)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "q"]), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    ),
    terms=st.sets(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=3),
)
@settings(**_SETTINGS)
def test_bm25_matches_reference_randomized(spark, docs, terms):
    import math

    from ai_etl_pipeline_spark.operators import textstats

    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    got = {
        r["doc_id"]: r["bm25"]
        for r in textstats.bm25_scores(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            sorted(terms),
        ).collect()
    }
    k1, b = 1.2, 0.75
    toks = {i: t.split() for i, t in rows}
    n_docs = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    for i, ts in toks.items():
        want = 0.0
        for term in sorted(terms):
            tf = ts.count(term)
            dfreq = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
            want += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(ts) / avgdl)
            )
        assert got[i] == pytest.approx(round(want, 6), abs=2e-6)
