"""SparkSession factory.

Local testing runs on local[32]; the configuration is nevertheless written for a
large multi-executor cluster reading ~100 TB:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting) so the
  same plans survive 1000x data growth without retuning ``shuffle.partitions``.
- Arrow enabled for the few pandas-UDF stages (chunker, mock embedder) so Python
  boundaries are batched, never row-at-a-time.
- Broadcast threshold left at default; dimension tables (region/nation/supplier,
  score maps, stopword lists) are broadcast explicitly where the plan knows better.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_SHIPPED: set[int] = set()


_NON_SCAN_NODES = (
    "Join", "Aggregate", "Repartition", "Window", "Sort", "Deduplicate",
    "MapInPandas", "FlatMapGroupsInPandas",
    # Filter: df.inputFiles() is NOT partition-pruned, so a partition-filtered
    # scan would be estimated at its pre-pruning width and fan_out would skip
    # a needed repartition — filtered plans pay the exact probe instead
    "Filter",
)


def _scan_partition_estimate(df) -> int | None:
    """Partition count of a PURE file scan, from file metadata alone —
    the ``df.rdd.getNumPartitions()`` probe costs a full throwaway physical
    planning pass (~1s cold on the driver), while Spark's own file-split
    rule (size/maxPartitionBytes with per-file open cost) is computable
    from listing RPCs.  None when the plan is not scan-shaped or the
    estimate would be unreliable — callers fall back to the exact probe."""
    try:
        logical = df._jdf.queryExecution().logical().toString()
    except Exception:
        return None
    if any(node in logical for node in _NON_SCAN_NODES):
        return None  # partitioning is shuffle-determined, not file-determined
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > 64:
        return None  # many files: listing RPCs cost more than the probe saves
    spark = df.sparkSession
    jvm = spark._jvm
    jutils = jvm.org.apache.spark.network.util.JavaUtils
    mpb = jutils.byteStringAsBytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    open_cost = jutils.byteStringAsBytes(spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    try:
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen() + open_cost
    except Exception:
        return None
    # Spark's own split rule (FilePartition.maxSplitBytes): the bytes-per-core
    # term means a mid-size scan already splits to ~parallelism partitions —
    # omitting it would call such scans narrow and add a pointless shuffle
    parallelism = spark.sparkContext.defaultParallelism
    min_pn = int(spark.conf.get("spark.sql.files.minPartitionNum", str(parallelism)))
    split = min(mpb, max(open_cost, -(-total // max(1, min_pn))))
    return max(1, -(-total // max(1, split)))


def fan_out(df, target: int | None = None):
    """Repartition a NARROW input up to cluster parallelism before per-row
    heavy work (tokenize/shingle/chunk/extract stages).

    Small parquet inputs arrive as one or two partitions (a 5k-doc file is a
    single row-group ⇒ a single task ⇒ one core does all the Python/expression
    work).  At real scale the input is already wider than the cluster and this
    is a no-op — the repartition only fires when the partition count is BELOW
    parallelism, so it never adds a shuffle to a 100 TB scan.

    Pure file scans answer the narrow/wide question from file metadata
    (see :func:`_scan_partition_estimate`); everything else pays the exact
    ``.rdd`` probe once.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    est = _scan_partition_estimate(df)
    if est is not None:
        return df.repartition(target) if est < target else df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def ship_package(spark: SparkSession) -> None:
    """Make ``cognee_graphdb_spark`` importable on executors.

    Python-worker stages (mapInPandas / applyInPandas / pandas_udf) unpickle
    their closures by importing this package by name on the WORKER — which
    fails whenever the driver was launched from outside the repo directory
    (the package sits on the driver's sys.path only).  Shipping the package
    as a zip via ``addPyFile`` is cheap, idempotent per SparkContext, and a
    no-op burden when the package was importable anyway.  Every public
    function that creates a Python-worker stage calls this first.
    """
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile
    from pathlib import Path

    pkg = Path(__file__).resolve().parent
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="cognee_graphdb_spark_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in pkg.rglob("*.py"):
            zf.write(p, p.relative_to(pkg.parent))
    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))


def get_spark(app_name: str = "cognee-graphdb-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession suitable for tests and the local bench."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
