"""validate.schema_drift_report: added/removed/type_changed/kept plus
exact null-ppm deltas, replayed with plain pandas on the same frames."""

from __future__ import annotations

from ai_etl_pipeline_spark.operators import validate


def test_schema_drift_statuses_and_nulls(spark):
    before = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "c", None), (4, "d", 4.0)],
        "id bigint, name string, score double",
    )
    after = spark.createDataFrame(
        [(1, "1", "x"), (2, None, None), (3, None, "z")],
        "id bigint, score string, tag string",
    )
    rows = {r["column"]: r for r in validate.schema_drift_report(before, after).collect()}
    assert set(rows) == {"id", "name", "score", "tag"}
    assert rows["name"]["status"] == "removed"
    assert rows["tag"]["status"] == "added"
    assert rows["score"]["status"] == "type_changed"
    assert (rows["score"]["before_type"], rows["score"]["after_type"]) == (
        "double", "string",
    )
    assert rows["id"]["status"] == "kept"
    # exact ppm: before name has 1/4 nulls; after score has 2/3
    assert rows["name"]["before_null_ppm"] == 250_000
    assert rows["name"]["after_null_ppm"] is None
    assert rows["score"]["before_null_ppm"] == 250_000
    assert rows["score"]["after_null_ppm"] == 666_666
    assert rows["score"]["null_ppm_delta"] == 416_666
    # removed/added columns carry one-sided stats only
    assert rows["tag"]["before_distinct"] is None and rows["tag"]["after_distinct"] >= 1


def test_schema_drift_exact_distinct(spark):
    before = spark.createDataFrame(
        [(i % 3,) for i in range(30)], "k bigint"
    )
    after = spark.createDataFrame([(i % 7,) for i in range(30)], "k bigint")
    rows = validate.schema_drift_report(
        before, after, approx_distinct=False
    ).collect()
    (r,) = rows
    assert (r["before_distinct"], r["after_distinct"]) == (3, 7)
    assert r["status"] == "kept" and r["null_ppm_delta"] == 0
