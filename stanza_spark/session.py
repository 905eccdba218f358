"""SparkSession factory tuned for the KG-construction workload.

Defaults follow the scale design in SURVEY.md §4/§7: AQE on (skew-join
splitting + dynamic coalescing), Arrow enabled for every pandas UDF path,
modest shuffle partitioning for local[32] (on a real cluster
``spark.sql.shuffle.partitions`` scales with executor count; every shuffle
in this engine keys on url-hash so the setting is a pure throughput knob,
not a correctness one).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def local_values_df(spark: SparkSession, rows, columns: list[str]):
    """Tiny static dictionary -> DataFrame as a pure-JVM ``VALUES``
    LocalRelation (r7, guide §4 "eliminate the Python boundary").

    ``spark.createDataFrame(list)`` parallelizes the rows through a
    PythonRDD with defaultParallelism partitions: every *use* of the
    dictionary then schedules a cores-wide Python-worker stage just to
    re-emit ~50 constant rows (measured 0.4-2.4 s per query at
    local[32] for the alias dictionary's two broadcast builds).  A
    VALUES relation is a LocalRelation: broadcast builds fold it with
    zero tasks and zero Python workers, at any scale.

    Supports str / int / float / None scalars and flat str lists
    (rendered as ``array(...)``); values are static code data
    (vocab tables), escaped for SQL literals."""
    def lit(v):
        if v is None:
            return "CAST(NULL AS STRING)"
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "array(" + ", ".join(lit(x) for x in v) + ")"
        raise TypeError(f"local_values_df: unsupported value {v!r}")

    values = ", ".join("(" + ", ".join(lit(v) for v in row) + ")"
                       for row in rows)
    cols = ", ".join(columns)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t({cols})")


def get_spark(app: str = "stanza-spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 8)
    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PART", "64m"))
        # AQE's coalescing floor: with the default 1m floor a byte-light
        # but compute-heavy intermediate shuffle (window/aggregate over a
        # few MB) coalesces to 1-2 partitions and serializes on one core
        # (measured: a 1.1s single-task mention-decode stage at sf0.1
        # while 31 cores idled).  64k keeps small stages spread up to
        # defaultParallelism (parallelismFirst remains on); large
        # shuffles are governed by the advisory size either way, so this
        # only changes byte-light stages at any scale.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PART", "64k"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "1024"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # modest heap: this VM's full-GC cost grows superlinearly with heap
        # size (measured 5s @12g vs 30s+ @48g for the same job sequence);
        # datasets here are far below 12g anyway
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.driver.maxResultSize", "4g")
        # This VM anti-scales when GC thread pools are sized from the 32
        # vCPUs (G1's concurrent threads + 32 mutator threads interfere
        # catastrophically: measured 4x slowdown on pure map work).
        # Parallel GC capped at 4 threads restores positive scaling.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_GRAFT_JAVA_OPTS",
                               "-XX:+UseParallelGC -XX:ParallelGCThreads=4"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
