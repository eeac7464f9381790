"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """One third of physical RAM, clamped to [4g, 48g] — big enough that
    local-mode executors (which share the driver JVM) survive sf-scale
    shuffles/aggregations, small enough to leave room for Python workers
    and the OS page cache."""
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page = os.sysconf("SC_PAGE_SIZE")
        gib = (pages * page) // (1 << 30)
    except (ValueError, OSError, AttributeError):
        gib = 16
    return f"{max(4, min(48, gib // 3))}g"


def spread_small(df):
    """Round-robin repartition a SMALL frame up to the session's
    parallelism. Compute-heavy single-pass operators (per-row cosine /
    mask expressions) otherwise run on the scan's split count, and a
    small parquet input bin-packs into a handful of splits
    (spark.sql.files.openCostInBytes), leaving most cores idle. Only
    fires when the current partition count is below parallelism, so a
    genuinely large input — already many splits — is never reshuffled."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            return df.repartition(par)
    except Exception:
        pass
    return df


def get_spark(app: str = "lucene_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    # Python workers inherit this env: keep large numpy/pandas buffers
    # inside the process between tasks instead of munmap/re-fault cycles —
    # with 32 concurrent workers the kernel page-zeroing otherwise
    # dominates (observed 60-80% sys time on the invert stage).
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(512 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 * 1024 * 1024))
    # each Spark task is one core; BLAS/OpenMP threading inside workers
    # would oversubscribe (n_workers x n_threads)
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
    n = int(cores) if cores.isdigit() else os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(n, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # local-mode: the driver heap IS the executor heap. 16g OOM'd the
        # r6 driver bench at sf1.0 (Java heap space + evicted blocks, 3/3
        # repeats); this sandbox has 128 GiB, so default to a third of
        # physical RAM capped at 48g — still parameterised for real
        # clusters via SPARK_GRAFT_DRIVER_MEM (guide §5: fix stability
        # with memory sizing, not by shrinking the work)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # compute-per-byte here (sha256, tokenize) is high: bin-pack file
        # scans into small splits so the scan side parallelizes
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.files.openCostInBytes", "2m")
        # shuffle scratch on the fast storage tier (tmpfs in this sandbox;
        # NVMe on a real cluster). Override with SPARK_GRAFT_LOCAL_DIR.
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-tmp"))
        .config("spark.ui.enabled", "false")
    )
    # s3mock:// scheme for the cluster-shaped smoke test: Spark serves the
    # scheme via a RawLocalFileSystem subclass (tiny committed jar); the
    # pyarrow side-channel resolves the same scheme to an object-store-
    # semantics handler (fsio._ObjectStoreHandler). Real deployments use
    # genuine s3:// roots; this block is inert unless the scheme is used.
    jar = os.path.join(os.path.dirname(__file__), "resources", "s3mock-fs.jar")
    if os.path.exists(jar):
        builder = (
            builder.config("spark.driver.extraClassPath", jar)
            .config("spark.executor.extraClassPath", jar)
            .config("spark.hadoop.fs.s3mock.impl", "org.lucenespark.testfs.S3MockFileSystem")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
