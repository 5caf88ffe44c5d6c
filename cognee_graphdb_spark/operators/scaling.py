"""Node-property feature scaling — the gds.scaleProperties family.

The reference reaches graph ML through the GDS procedure surface its Neo4j
adapter projects graphs for (cognee reference
`neo4j_driver/neo4j_metrics_utils.py:8-190`, `neo4j_driver/adapter.py:
1100-1197`); ``gds.scaleProperties`` is the feature-preparation step of that
family — normalize numeric node properties into a single vector before
feeding kmeans/knn/fastRP.  A 100 TB training-data pipeline needs the same
verb for feature columns (normalize quality scores, degree features,
per-document statistics before mixing or clustering).

Spark-first layout: ONE aggregate pass computes every per-property statistic
(min/max/avg/stddev_pop/L1/L2) as a single row, which joins back as a 1-row
broadcast — the node table itself is never shuffled, so the operator is a
scan + map at any scale.  All arithmetic is built-in column expressions
(whole-stage codegen; no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scaler name (lower) -> per-value expression over the broadcast stats row.
# Conventions follow the public GDS scaler definitions:
#   minmax:   (x - min) / (max - min)          (0 when max == min)
#   max:      x / max(|x|)                      (x when the max-abs is 0)
#   mean:     (x - avg) / (max - min)           (0 when max == min)
#   log:      ln(x + offset)
#   center:   x - avg
#   stdscore: (x - avg) / stddev_pop            (0 when the stddev is 0)
#   l1norm:   x / sum(|x|)                      (x unchanged when the sum is 0)
#   l2norm:   x / sqrt(sum(x^2))                (x unchanged when the norm is 0)
SCALERS = ("minmax", "max", "mean", "log", "center", "stdscore", "l1norm", "l2norm")


def _scaled_expr(prop: str, scaler: str, log_offset: float):
    x = F.col(prop).cast("double")
    mn = F.col(f"__min_{prop}")
    mx = F.col(f"__max_{prop}")
    avg = F.col(f"__avg_{prop}")
    if scaler == "minmax":
        rng = mx - mn
        return F.when(rng == 0.0, F.lit(0.0)).otherwise((x - mn) / rng)
    if scaler == "max":
        mabs = F.greatest(F.abs(mn), F.abs(mx))
        return F.when(mabs == 0.0, x).otherwise(x / mabs)
    if scaler == "mean":
        rng = mx - mn
        return F.when(rng == 0.0, F.lit(0.0)).otherwise((x - avg) / rng)
    if scaler == "log":
        # match GDS's double-math conventions instead of Spark's NULL-on-
        # non-positive F.log: ln(0) = -Inf, ln(negative) = NaN — a NULL
        # output slot must mean a NULL INPUT, nothing else
        arg = x + F.lit(log_offset)
        return (
            F.when(arg.isNull(), F.lit(None).cast("double"))
            .when(arg > 0.0, F.log(arg))
            .when(arg == 0.0, F.lit(float("-inf")))
            .otherwise(F.lit(float("nan")))
        )
    if scaler == "center":
        return x - avg
    if scaler == "stdscore":
        sd = F.col(f"__std_{prop}")
        return F.when(sd == 0.0, F.lit(0.0)).otherwise((x - avg) / sd)
    if scaler == "l1norm":
        l1 = F.col(f"__l1_{prop}")
        return F.when(l1 == 0.0, x).otherwise(x / l1)
    if scaler == "l2norm":
        l2 = F.sqrt(F.col(f"__l2_{prop}"))
        return F.when(l2 == 0.0, x).otherwise(x / l2)
    raise ValueError(f"unknown scaler {scaler!r}; supported: {SCALERS}")


def scale_properties(
    nodes: DataFrame,
    properties: list[str],
    scaler: str = "minmax",
    id_col: str = "id",
    log_offset: float = 0.0,
) -> DataFrame:
    """(id, scaled): scale the named numeric node properties into one
    ``array<double>`` vector (gds.scaleProperties semantics — one scaler
    applied per-property, properties concatenated in the order given).

    NULL property values pass through as NULL array slots (aggregate
    statistics skip NULLs — identical in Spark and ANSI SQL engines, so the
    behavior is oracle-stable); a property column that is entirely NULL
    scales to all-NULL.  ``log_offset`` mirrors the GDS log scaler's offset
    config (ln(x + offset)).

    Scale: one aggregate over the node table collapses to a SINGLE row
    (partial aggregation map-side; bytes shuffled = one stats tuple per
    task), broadcast back with crossJoin — the node rows themselves never
    shuffle, so the plan is scan + project at 100 TB.
    """
    s = scaler.lower()
    if s not in SCALERS:
        raise ValueError(f"unknown scaler {scaler!r}; supported: {SCALERS}")
    if not properties:
        raise ValueError("scale_properties needs at least one property column")
    missing = [p for p in properties if p not in nodes.columns]
    if missing:
        raise ValueError(f"nodes frame lacks property column(s) {missing}")
    # refuse non-numeric columns: cast('double') would silently turn a
    # mislisted string column into all-NULL feature slots
    dtypes = dict(nodes.dtypes)
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    bad = [
        p for p in properties
        if dtypes[p] not in numeric and not dtypes[p].startswith("decimal")
    ]
    if bad:
        raise ValueError(
            f"property column(s) {bad} are not numeric "
            f"({[dtypes[p] for p in bad]}); scaling needs numeric features"
        )
    aggs = []
    for p in properties:
        x = F.col(p).cast("double")
        aggs += [
            F.min(x).alias(f"__min_{p}"),
            F.max(x).alias(f"__max_{p}"),
            F.avg(x).alias(f"__avg_{p}"),
            F.stddev_pop(x).alias(f"__std_{p}"),
            F.sum(F.abs(x)).alias(f"__l1_{p}"),
            F.sum(x * x).alias(f"__l2_{p}"),
        ]
    stats = nodes.agg(*aggs)
    return (
        nodes.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col).alias("id"),
            F.array(*[_scaled_expr(p, s, log_offset) for p in properties]).alias(
                "scaled"
            ),
        )
    )
