"""point_in_interval_join: bucket decomposition must equal the naive
non-equi join exactly — boundaries, overlaps, empty intervals, W-aligned
edges — and must plan as a hash equi-join."""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.ranges import point_in_interval_join


@pytest.fixture(scope="module")
def data(spark):
    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(
            [0.0, 4.999, 5.0, 9.99, 10.0, 14.5, 15.0, 50.0, 96.5, 100.0]
        )],
        "pid long, v double",
    )
    ivs = spark.createDataFrame(
        [
            (1, 0.0, 5.0),     # W-aligned: hi%W==0, spans exactly bucket 0
            (2, 0.0, 10.0),    # overlapping
            (3, 4.0, 4.0),     # empty: matches nothing
            (4, 9.0, 15.1),    # crosses three buckets
            (5, 96.0, 101.0),  # covers the max point
            (6, 200.0, 210.0), # matches nothing
        ],
        "iid long, lo double, hi double",
    )
    return pts, ivs


def _pairs(df):
    return {(r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()}


@pytest.mark.parametrize("width", [1.0, 5.0, 7.3, 100.0])
def test_matches_naive_join(spark, data, width):
    pts, ivs = data
    naive = pts.join(
        ivs, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    fast = point_in_interval_join(pts, ivs, "v", "lo", "hi", width)
    assert _pairs(fast) == _pairs(naive)


def test_boundary_semantics(spark, data):
    pts, ivs = data
    out = _pairs(point_in_interval_join(pts, ivs, "v", "lo", "hi", 5.0))
    assert (0, 1) in out       # lo inclusive
    assert (2, 1) not in out   # hi exclusive: 5.0 not in [0, 5)
    assert (2, 2) in out       # 5.0 in [0, 10)
    assert all(iid != 3 for _, iid in out)  # empty interval dropped
    assert (9, 5) in out       # 100.0 in [96, 101)


def test_plans_as_equi_join(spark, data):
    pts, ivs = data
    out = point_in_interval_join(pts, ivs, "v", "lo", "hi", 5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
