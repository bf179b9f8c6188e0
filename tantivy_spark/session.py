"""SparkSession factory with the settings this engine assumes."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tantivy_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # glibc malloc tuning for the Python workers (they inherit this env
    # through the JVM -> pyspark daemon): numpy/Arrow buffers above the
    # default 128 KB mmap threshold are munmap'd on free and re-faulted
    # on every batch — at 32 concurrent workers the simultaneous
    # page-fault traffic serializes in the kernel (measured: 84-86% sys
    # time; 32-core steady-state build 3.7 s tuned vs 5-17 s default on
    # the same corpus).  256 MB thresholds keep working buffers in the
    # arena; per-worker RSS stays bounded by its peak working set.
    # Must be set BEFORE the JVM spawns; setdefault keeps it overridable.
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
        os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    builder = SparkSession.builder
    # under spark-submit the JVM gateway already exists (PYSPARK_GATEWAY_PORT
    # set) and the master / executor topology comes from the launch command;
    # only force local[k] when running as a plain python process
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        # SPARK_GRAFT_MASTER overrides the master string — used by the
        # scaling bench to run the SAME job on separate executor
        # processes (e.g. local-cluster[4,2,8192]: 4 executor JVMs x 2
        # cores, the literal N-vs-4N-executors experiment) instead of
        # local[k] threads in one JVM
        builder = builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]"))
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize the Python-call overhead of the
        # vectorized UDF stages (tokenize / encode / kernel)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_BATCH", "65536"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # only meaningful under a non-local master (local-cluster / real
        # cluster); harmless under local[k]
        .config("spark.executor.memory",
                os.environ.get("SPARK_EXECUTOR_MEM", "6g"))
        # same malloc tuning for Python workers forked by REMOTE executors
        # (cluster deployments; local workers inherit the os.environ set
        # above)
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_",
                os.environ.get("MALLOC_MMAP_THRESHOLD_", "268435456"))
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_",
                os.environ.get("MALLOC_TRIM_THRESHOLD_", "268435456"))
        .config("spark.ui.enabled", "false")
    )
    # SPARK_LOCAL_DIRS overrides shuffle/spill dirs (A/B-measured: tmpfs
    # shuffle competes with compute for memory bandwidth at 32 cores and
    # loses to /tmp on this box, so no tmpfs default)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
