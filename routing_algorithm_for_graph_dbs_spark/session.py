"""SparkSession factory tuned for the engine.

Local mode is a single JVM; the same settings (AQE, sensible shuffle
partition counts, Arrow) are what we would ship to a 1000-executor cluster,
where ``spark.sql.shuffle.partitions`` is instead sized to ~2-3x total cores
and AQE coalesces from there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "routing_algorithm_for_graph_dbs_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    AQE is on: it coalesces post-shuffle partitions, re-plans skew joins at
    runtime, and converts sort-merge to broadcast joins when a side turns out
    small -- all of which matter far more at 100 TB than on the test boxes.
    """
    if cpus is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus_env}]"
        n_threads = os.cpu_count() or 8 if cpus_env == "*" else int(cpus_env)
    else:
        master = f"local[{cpus}]"
        n_threads = cpus
    if shuffle_partitions is None:
        shuffle_partitions = max(n_threads, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # push COUNT/MIN/MAX without filters down to parquet footer
        # statistics (exact, off by default): several pipelines size
        # themselves with a bare count(*) over a raw table — sqrt(n)
        # centroid counts, DQ profiles — and each such count was a full
        # scan job (guide §6: make the scan do the skipping)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # the broadcast-Dijkstra tier collects the (pruned) edge list to
        # the driver by design; past ~20M edges that exceeds Spark's 1g
        # default cap long before the heap is at risk (r13: 45M-edge
        # scale run). Local-mode driver == executor, so a larger cap
        # costs nothing when unused.
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # Catalyst's constraint propagation hits a rewrite bug
        # (NoSuchElementException in Union.rewriteConstraints) when
        # localCheckpoint()ing iterative plans whose Union branches share
        # attribute ids — which our Pregel-style kernels do every superstep.
        # Constraints only add inferred IsNotNull/filter pushups; disabling
        # them is the standard workaround and costs nothing measurable here.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # the driver's events table stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects by default; read as long (ns since epoch)
        # and convert at the source boundary (sources.testdata).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # async spill read-ahead races file-channel close under sustained
        # spill pressure (JDK NativeThreadSet AIOOBE, observed killing a
        # 7.6M-edge iterative SSSP run); synchronous spill reads cost a few
        # percent on spill-heavy stages and remove the crash entirely.
        .config("spark.unsafe.sorter.spill.read.ahead.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
