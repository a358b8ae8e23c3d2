"""Property-based tests (hypothesis) for the late-round-9 operators,
each against a clean driver-side reference implementation:

- graph.hits vs a pure-Python integer replica on random digraphs;
- graph.k_hop_distances vs driver-side BFS;
- validate.auc_report vs the O(n²) pair-counting AUC definition;
- relational.market_basket_rules vs itertools pair counting;
- behavior.funnel vs a per-user driver-side walk.

Examples are few (each pays a Spark job); value is randomized
structure, not example count.
"""

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import behavior, graph, relational, validate

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EDGES = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)


def _hits_replica(edges, iters, base=1_000_000):
    edges = sorted(set(edges))
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
    return {n: (hub[n], auth[n]) for n in nodes}


@given(edges=_EDGES, iters=st.integers(1, 3))
@settings(**_SETTINGS)
def test_hits_matches_python_replica(spark, edges, iters):
    expect = _hits_replica(edges, iters)
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in graph.hits(
            spark.createDataFrame(edges, "src int, dst int"), iterations=iters
        ).collect()
    }
    assert got == expect


def _bfs_replica(edges, seeds, max_hops):
    adj = {}
    for u, v in set(edges):
        adj.setdefault(u, set()).add(v)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_hops + 1):
        frontier = {
            v for u in frontier for v in adj.get(u, ()) if v not in dist
        }
        for v in frontier:
            dist[v] = d
    return dist


@given(edges=_EDGES, seed=st.integers(0, 7), hops=st.integers(1, 4))
@settings(**_SETTINGS)
def test_k_hop_matches_bfs(spark, edges, seed, hops):
    expect = _bfs_replica(edges, [seed], hops)
    got = {
        r["node"]: r["dist"]
        for r in graph.k_hop_distances(
            spark.createDataFrame(edges, "src int, dst int"),
            spark.createDataFrame([(seed,)], "node int"),
            max_hops=hops,
        ).collect()
    }
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.sampled_from([0.1, 0.2, 0.3, 0.4]), st.integers(0, 1)),
        min_size=2,
        max_size=24,
    ).filter(lambda rs: 0 < sum(y for _, y in rs) < len(rs))
)
@settings(**_SETTINGS)
def test_auc_matches_pair_counting(spark, rows):
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expect = (2 * wins + ties) * 1_000_000 // (2 * len(pos) * len(neg))
    r = validate.auc_report(
        spark.createDataFrame(rows, "score double, label int"),
        "score",
        "label",
    ).collect()[0]
    assert r["auc_micro"] == expect


@given(
    lines=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["a", "b", "c", "d"])),
        min_size=1,
        max_size=24,
    )
)
@settings(**_SETTINGS)
def test_basket_rules_match_itertools(spark, lines):
    baskets = {}
    for txn, item in lines:
        baskets.setdefault(txn, set()).add(item)
    pair_cnt = {}
    for items in baskets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    item_cnt = {}
    for items in baskets.values():
        for i in items:
            item_cnt[i] = item_cnt.get(i, 0) + 1
    n = len(baskets)
    expect = {}
    for (a, b), c in pair_cnt.items():
        if c < 1:
            continue
        expect[(a, b)] = (
            c,
            c * 1_000_000 // n,
            c * 1_000_000 // item_cnt[a],
            c * 1_000_000 // item_cnt[b],
            c * n * 1_000_000 // (item_cnt[a] * item_cnt[b]),
        )
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_count"],
            r["support_micro"],
            r["conf_a_to_b_micro"],
            r["conf_b_to_a_micro"],
            r["lift_micro"],
        )
        for r in relational.market_basket_rules(
            spark.createDataFrame(lines, "txn int, item string"),
            "txn",
            "item",
            min_pair_count=1,
        ).collect()
    }
    assert got == expect


_T0 = dt.datetime(2024, 1, 1)


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.sampled_from(["view", "click", "buy"]),
            st.integers(0, 40),
        ),
        min_size=1,
        max_size=30,
    ).filter(lambda es: any(t == "view" for _, t, _ in es))
)
@settings(**_SETTINGS)
def test_funnel_matches_per_user_walk(spark, events):
    steps = ["view", "click", "buy"]
    by_user = {}
    for u, t, h in events:
        by_user.setdefault(u, []).append((t, h))
    counts = [0, 0, 0]
    for evs in by_user.values():
        t_prev = min((h for t, h in evs if t == steps[0]), default=None)
        if t_prev is None:
            continue
        counts[0] += 1
        for i, s in enumerate(steps[1:], start=1):
            nxt = min((h for t, h in evs if t == s and h > t_prev), default=None)
            if nxt is None:
                break
            counts[i] += 1
            t_prev = nxt
    rows = [
        (u, t, _T0 + dt.timedelta(hours=h)) for u, t, h in events
    ]
    got = {
        r["step"]: r["n_users"]
        for r in behavior.funnel(
            spark.createDataFrame(rows, ["user_id", "event_type", "ts"]), steps
        ).collect()
    }
    assert [got[1], got[2], got[3]] == counts
