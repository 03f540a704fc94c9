"""SparkSession factory with the engine's tuned defaults.

Scale posture (100 TB / 1000 executors): AQE on (coalescing + skew splitting),
Arrow exchange for the pandas kernels, bounded Arrow batches, UTC session time,
and a shuffle-partition count the caller sizes to the cluster (tests: 32)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "forex_feature_generator_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    # Python workers inherit the driver env in local mode: pin the numeric
    # libraries (and Arrow's OMP-derived pool) to one thread per worker —
    # N workers x M BLAS/Arrow threads oversubscribes and anti-scales.
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
              "NUMEXPR_NUM_THREADS", "ARROW_IO_THREADS"):
        os.environ.setdefault(v, "1")

    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "268435456")
        # sandbox: shuffle spill dirs on tmpfs — the VM's virtual disk has
        # wildly variable throughput (2-3x run-to-run noise on shuffle-heavy
        # jobs); RAM-backed local dirs make timings reproducible
        .config("spark.local.dir",
                os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        # JVM<->python-worker channels over UNIX DOMAIN SOCKETS (Spark 4):
        # at local[32] this box's loopback TCP intermittently wedges an Arrow
        # channel (observed: cwnd collapsed to 1, 3.6 MB retransmitted on
        # 127.0.0.1, RTO backed off to 120 s — the task stalls for minutes to
        # forever mid-stage). UDS has no congestion control to collapse;
        # it removes that whole failure class and the round-2 local[32]
        # variance with it (BENCH/BASELINE.md).
        .config("spark.python.unix.domain.socket.enabled",
                os.environ.get("SPARK_GRAFT_UDS", "true"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
