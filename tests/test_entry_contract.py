"""Driver-contract smoke: entry() runs on a bare-config session, every
queries() entry has a callable signature, oracle keys are a subset, and a
representative sample hash-matches DuckDB (the FULL sweep lives in
tools/check_parity.py — this keeps CI fast)."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SAMPLE = [
    "q_pricing_summary",
    "q_join_semi",
    "q_window_topk_per_customer",
    "q_clean_numeric_cast",
    "q_map_values_literal",
    "q_dedup_docs_exact",
    "q_text_tokens",
    "q_events_tumbling",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # oracle coverage must stay near-total: rows-only checks are weaker
    assert len(oracles) >= len(qs) - 2


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(float(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


@pytest.mark.parametrize("name", SAMPLE)
def test_sample_oracle_parity(spark, sf_dir, duck, name):
    sdf = entrymod.queries()[name](spark, sf_dir)
    rel = duck.sql(entrymod.oracle_sql()[name])
    scols, srows = list(sdf.columns), [tuple(r) for r in sdf.collect()]
    dcols, drows = list(rel.columns), rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    a = sorted(tuple(_norm(r[i]) for i in sidx) for r in srows)
    b = sorted(tuple(_norm(r[i]) for i in didx) for r in drows)
    assert a == b
