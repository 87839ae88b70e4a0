"""SparkSession factory with confs pinned for this engine.

Local mode is the test/bench substrate; the same confs are what we would
ship in ``spark-defaults.conf`` on a real cluster (minus driver memory).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dq-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        # match parallelism of the master, not the 200 default
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = int(master[6:-1])
        else:
            shuffle_partitions = cores
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep post-shuffle parallelism for Python-UDF stages: the default
        # 1MB floor coalesces small-SF text shuffles below core count,
        # starving the ArrowEvalPython stage (irrelevant at TB scale, where
        # partitions are fat; harmless there)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # NOTE: spark.sql.files.maxPartitionBytes stays at Spark's 128m
        # default — at 100 TB that is ~800k scan tasks, the right size.
        # Small-corpus benches must instead pass a split size matched to
        # their input via extra_conf (bench.py sizes it for ~4 splits per
        # core) — baking a small value here would silently explode the
        # task count for every production caller (ADVICE r1).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # batch size tuned for the VECTORIZED enrich kernel (r6): its
        # per-batch numpy/pyarrow transients scale with batch rows, and
        # at 32 concurrent workers sharing this host's memory system a
        # 20k-row batch doubles kernel CPU/doc vs <=10k (measured 105 vs
        # 53 us/doc — LLC/bandwidth saturation against the JVM threads).
        # 4k rows keeps per-batch transients cache-sized while the
        # boundary cost stays amortized (flat 1k..10k, guide §4.2).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # throughput batch jobs: ParallelGC measured 2-3x faster than the
        # G1 default on the text pipeline at local[32] (G1's concurrent
        # threads compound core contention; applies at JVM launch only)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # shuffle writes go through real files even in local mode; with
        # M map x R reduce blocks the default 32k buffer pays a syscall
        # every 32k per block (the r5 cluster-leg sweep measured ~30x
        # fewer write syscalls at 1m; stage metrics here showed 134
        # task-seconds of shuffle write for a 147MB exchange)
        .config("spark.shuffle.file.buffer", "1m")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """addPyFile the package zip (the spark-submit ``--py-files``
    equivalent): executor Python workers otherwise resolve imports from
    their cwd, which need not be the repo root."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = shutil.make_archive(
        os.path.join(tempfile.gettempdir(), "dq_spark_pkg"),
        "zip",
        os.path.dirname(pkg_dir),
        os.path.basename(pkg_dir),
    )
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:  # noqa: BLE001 — already registered in this context
        pass
    _SHIPPED.add(key)
