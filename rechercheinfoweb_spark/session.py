"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Allocator environment for every JVM/python-worker child this
# session spawns.  The engine's hot kernels are Arrow-batched, and
# both allocators in the default path RETURN each batch's buffers to
# the kernel on free (glibc munmaps >128 KiB allocations; pyarrow's
# default jemalloc madvises them away), so every batch re-faults its
# pages — long-lived executors paying a page-fault tax per batch
# forever.  Measured on this host (same churn loop, touch every
# page): glibc default 4.0 GB/s vs 8.5 with a 1 GiB mmap/trim
# threshold; pyarrow jemalloc 2.3 GB/s vs mimalloc 16.0.  On a
# fault-throttled host (this sandbox degrades to ~0.2 GB/s) the gap
# is the difference between CPU-bound and fault-bound executors.
# Children inherit os.environ; local-cluster executors additionally
# get these via spark.executorEnv.* (set in get_spark).
WORKER_ALLOC_ENV = {
    "ARROW_DEFAULT_MEMORY_POOL": "mimalloc",
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
    # mimalloc purges (madvises away) free pages after 10 ms by
    # default — tight loops amortize that, real per-batch gaps do
    # not, and every purged page refaults on the next batch.  100 s
    # keeps buffers resident across batches while still returning
    # memory when a worker goes truly idle.
    "MIMALLOC_PURGE_DELAY": "100000",
    "MIMALLOC_RESET_DELAY": "100000",  # pre-2.x name of the same knob
}


def _machine_ram_gb() -> int:
    """Total physical RAM in GiB (MemTotal), 128 if unreadable."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return max(1, int(line.split()[1]) // (1024 * 1024))
    except OSError:
        pass
    return 128


def _default_driver_memory(master: str) -> str:
    """Size the local-mode heap to the task-thread count.

    local[N] runs N concurrent task threads in ONE JVM, so the heap
    must scale with N at a CONSTANT per-core rate — like a real
    cluster provisions executor memory per core — or the high-N
    config GC-thrashes and any N-vs-4N comparison measures garbage
    collection, not scaling.  Measured on a 90k page-sized-doc
    build at local[8]: 16g heap → 269 s, 48g → 164 s.  ~5g per task
    thread + base, capped at 70% of ACTUAL machine RAM (queried, not
    assumed — bench/scaling also put shuffle dirs and the index on
    RAM-backed /dev/shm, so an overcommitted heap plus tmpfs could
    exceed physical memory on a smaller host)."""
    if master.startswith("local-cluster"):
        # executors are separate JVMs with their own memory — the
        # driver only schedules and collects scalars
        return "8g"
    try:
        n = int(master[master.index("[") + 1:-1]) if "[" in master else 8
    except ValueError:  # local[*]
        n = os.cpu_count() or 8
    cap = max(4, int(0.7 * _machine_ram_gb()))
    return f"{min(cap, max(8, 5 * n + 4))}g"


def get_spark(app_name: str = "rechercheinfoweb-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build a session tuned for the index workload.

    AQE is on (runtime coalescing + skew-join splitting), Arrow is on
    (every custom kernel is a pandas UDF), and shuffle partitions
    default to 2× cores — the same settings we would ship in
    ``spark-submit --py-files`` conf on a real cluster.
    """
    cores = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8
    master = master or f"local[{cores}]"
    for k, v in WORKER_ALLOC_ENV.items():
        os.environ.setdefault(k, v)
    if shuffle_partitions is None:
        n = int(master[master.index("[") + 1:-1]) if "[" in master else 32
        shuffle_partitions = max(8, 2 * n)
    b = (
        SparkSession.builder.appName(app_name).master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY",
                               _default_driver_memory(master)))
    )
    for k, v in WORKER_ALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
