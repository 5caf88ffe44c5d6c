"""operators/scaling.py — the gds.scaleProperties scaler family.

Value tests pin each scaler's convention on a closed-form column; the plan
test pins the 100 TB property (SCALE.md): ONE aggregate pass collapsing to a
single row that broadcasts back, so the node table itself never shuffles.
"""

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.scaling import scale_properties


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 4.0), ("d", -3.0)],
        "id string, x double",
    )


def vals(df):
    return {r["id"]: r["scaled"][0] for r in df.collect()}


def test_minmax_and_mean(spark, frame):
    got = vals(scale_properties(frame, ["x"], "minmax"))
    # min -3, max 4, range 7
    assert got == {
        "a": pytest.approx(4 / 7), "b": pytest.approx(5 / 7),
        "c": pytest.approx(1.0), "d": pytest.approx(0.0),
    }
    got = vals(scale_properties(frame, ["x"], "mean"))
    # avg 1.0
    assert got == {
        "a": pytest.approx(0.0), "b": pytest.approx(1 / 7),
        "c": pytest.approx(3 / 7), "d": pytest.approx(-4 / 7),
    }


def test_max_center_stdscore(spark, frame):
    got = vals(scale_properties(frame, ["x"], "max"))
    # max |x| = 4
    assert got == {
        "a": pytest.approx(0.25), "b": pytest.approx(0.5),
        "c": pytest.approx(1.0), "d": pytest.approx(-0.75),
    }
    got = vals(scale_properties(frame, ["x"], "center"))
    assert got == {
        "a": pytest.approx(0.0), "b": pytest.approx(1.0),
        "c": pytest.approx(3.0), "d": pytest.approx(-4.0),
    }
    sd = math.sqrt((0 + 1 + 9 + 16) / 4)  # population stddev around mean 1
    got = vals(scale_properties(frame, ["x"], "stdscore"))
    assert got == {
        "a": pytest.approx(0.0), "b": pytest.approx(1 / sd),
        "c": pytest.approx(3 / sd), "d": pytest.approx(-4 / sd),
    }


def test_l1_l2_log(spark, frame):
    got = vals(scale_properties(frame, ["x"], "l1norm"))
    # sum |x| = 10
    assert got == {
        "a": pytest.approx(0.1), "b": pytest.approx(0.2),
        "c": pytest.approx(0.4), "d": pytest.approx(-0.3),
    }
    l2 = math.sqrt(1 + 4 + 16 + 9)
    got = vals(scale_properties(frame, ["x"], "l2norm"))
    assert got == {
        "a": pytest.approx(1 / l2), "b": pytest.approx(2 / l2),
        "c": pytest.approx(4 / l2), "d": pytest.approx(-3 / l2),
    }
    pos = spark.createDataFrame([("a", 1.0), ("b", math.e - 1.0)], "id string, x double")
    got = vals(scale_properties(pos, ["x"], "log", log_offset=1.0))
    assert got == {"a": pytest.approx(math.log(2.0)), "b": pytest.approx(1.0)}


def test_degenerate_and_null_handling(spark):
    const = spark.createDataFrame([("a", 5.0), ("b", 5.0)], "id string, x double")
    # zero range / zero stddev => 0.0 (the GDS convention), never a NaN
    assert vals(scale_properties(const, ["x"], "minmax")) == {"a": 0.0, "b": 0.0}
    assert vals(scale_properties(const, ["x"], "stdscore")) == {"a": 0.0, "b": 0.0}
    zeros = spark.createDataFrame([("a", 0.0), ("b", 0.0)], "id string, x double")
    # zero norm => values pass through unchanged
    assert vals(scale_properties(zeros, ["x"], "l1norm")) == {"a": 0.0, "b": 0.0}
    withnull = spark.createDataFrame(
        [("a", 1.0), ("b", None), ("c", 3.0)], "id string, x double"
    )
    got = vals(scale_properties(withnull, ["x"], "minmax"))
    # stats skip the NULL (min 1, max 3); the NULL row keeps a NULL slot
    assert got["a"] == 0.0 and got["c"] == 1.0 and got["b"] is None


def test_multi_property_order_and_refusals(spark, frame):
    two = frame.withColumn("y", F.col("x") * 10.0)
    [row] = (
        scale_properties(two, ["y", "x"], "center")
        .filter(F.col("id") == "c")
        .collect()
    )
    # config order is vector order: y first (40 - 10), then x (4 - 1)
    assert row["scaled"] == [pytest.approx(30.0), pytest.approx(3.0)]
    with pytest.raises(ValueError, match="unknown scaler"):
        scale_properties(frame, ["x"], "bogus")
    with pytest.raises(ValueError, match="at least one"):
        scale_properties(frame, [], "minmax")
    with pytest.raises(ValueError, match="lacks property"):
        scale_properties(frame, ["missing"], "minmax")


def test_plan_single_agg_broadcast_no_node_shuffle(spark):
    """The 100 TB shape: the stats side is a partial-agg collapsing to one
    row that joins back as a broadcast — the node-table side reaches the
    output through zero Exchange hashpartitioning steps, and no Python
    worker enters the plan."""
    nodes = spark.range(1000).select(
        F.concat(F.lit("n"), F.col("id")).alias("id"),
        (F.col("id") * 1.5).alias("x"),
        (F.col("id") % 7.0).alias("y"),
    )
    df = scale_properties(nodes, ["x", "y"], "stdscore")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only shuffle is the stats side collapsing to its single row
    assert plan.count("SinglePartition") == 1
    assert "partial_" in plan  # map-side combine on the aggregate pass


def test_log_scaler_gds_conventions_and_type_refusal(spark):
    """ln(0) = -Inf and ln(negative) = NaN (the GDS double-math behavior,
    not Spark's NULL-on-non-positive F.log) so a NULL output slot always
    means a NULL input; a non-numeric property refuses instead of silently
    casting to NULL (r12c review fixes)."""
    import math

    frame = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0), ("c", -2.0), ("d", None)],
        "id string, x double",
    )
    got = {r["id"]: r["scaled"][0] for r in scale_properties(frame, ["x"], "log").collect()}
    assert got["a"] == pytest.approx(0.0)
    assert got["b"] == float("-inf")
    assert math.isnan(got["c"])
    assert got["d"] is None
    labeled = frame.withColumn("label", F.lit("tag"))
    with pytest.raises(ValueError, match="not numeric"):
        scale_properties(labeled, ["x", "label"], "minmax")
