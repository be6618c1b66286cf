"""SparkSession factory with the engine's standard tuning.

Local-mode defaults mirror what we would set cluster-side: AQE on (runtime
coalesce + skew-join), shuffle partitions sized to cores not the 200
default, Arrow enabled for every pandas-UDF boundary, UTC session TZ so
TTL/expiry arithmetic is deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scrape_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Under spark-submit (detected by the py4j gateway the PythonRunner
    # launched) the master/conf come from the submit command line — never
    # override them with the local default; explicit callers still win.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER") or (
            None if under_submit else "local[*]"
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master and master.startswith("local[") and shuffle_partitions is None:
        inner = master[len("local[") : -1]
        if inner.isdigit():
            shuffle_partitions = int(inner)
        elif cpus and cpus.isdigit():
            shuffle_partitions = int(cpus)
        else:
            shuffle_partitions = os.cpu_count() or 8
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer shuffled-hash over sort-merge: the engine's big joins stream
        # a 2 KB-html corpus side against a bounded request/key build side —
        # skipping the sort of the heavy side measured +10% end-to-end at 16
        # cores on the 1.3M-page corpus. AQE skew-join still applies.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 (the legacy default) writes NO parquet column statistics;
        # standard TIMESTAMP_MICROS does — the store's manifest records
        # per-file expires min/max from those footers to prune expiry-window
        # scans (and INT96 is deprecated by the parquet spec anyway)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    if shuffle_partitions is not None or not under_submit:
        # cluster runs without an explicit value keep the submit-conf (or
        # AQE-coalesced) width; local runs size shuffles to cores
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or 32)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
