"""SparkSession builder for the extraction engine.

Local-mode testing stands in for the multi-executor cluster: partitioning
decisions (salting, AQE, shuffle-partition sizing) are made as if 1000
executors were reading 100 TB; ``local[N]`` only changes thread count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_CONFIG


def get_spark(
    app: str = "paddleocr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_CONFIG.arrow_max_records),
        )
        # Small heap ON PURPOSE (override with SPARK_DRIVER_MEM). The sandbox
        # VM faults fresh anonymous pages at ~0.1 GB/s (lazily-restored VM
        # memory), so a big G1 heap that keeps touching new regions runs
        # 10-30x slower than a small heap whose pages stay resident and get
        # reused every young-gen cycle (measured: 20M-row md5 agg 17-35 s at
        # 48g vs 0.6-3.7 s at 4g on the same input). On a real cluster
        # executor heaps are sized per-node as usual; this knob is about the
        # sandbox's memory pathology, not the engine's memory needs.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Prefault the whole heap at JVM start: bulk parallel pretouch runs at
        # ~6 GB/s aggregate (1.4 s for 8g) while fine-grained demand faults
        # serialize in the host at ~20 us each — without this, GC cycling
        # through fresh regions turns the host fault path into a contended
        # serial resource and per-core efficiency halves at high parallelism.
        # GCLockerRetryAllocationCount: at 32 executor threads doing native
        # parquet/zstd I/O (JNI critical sections), G1's default of 2 retries
        # lets tiny allocations (observed: 5 WORDS on a 16g heap) throw
        # spurious OutOfMemoryError under GCLocker starvation — raise the
        # retry budget so only real exhaustion throws.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms" + os.environ.get("SPARK_DRIVER_MEM", "8g")
            + " -XX:+AlwaysPreTouch -XX:+UnlockDiagnosticVMOptions"
            + " -XX:GCLockerRetryAllocationCount=64",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    if os.path.isdir("/dev/shm"):
        # shuffle/spill on tmpfs: the sandbox's single shared disk is not the
        # per-executor local storage a real cluster has (see BENCH.md)
        b = b.config("spark.local.dir", "/dev/shm/spark_local")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
