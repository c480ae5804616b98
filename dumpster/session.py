"""SparkSession factory tuned for the encode pipeline.

Local-mode in the sandbox (one JVM, N executor threads); the same settings
express the cluster intent: AQE on, shuffle partitions sized to cores (not
the 200 default — at 100 TB you'd size this to total cores × 2-3), Arrow
batches capped at the engine chunk size so ``mapInArrow`` sees chunk-sized
slices, UTC session timezone so timestamp round-trips are unambiguous.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CHUNK_ROWS = 65536


def _auto_task_cpus(cores: int) -> int:
    """Arrow-UDF stages run a Python worker per task slot NEXT TO the JVM
    task thread that feeds it — at slots ≈ cores that is 2× CPU
    oversubscription plus slots× allocation pressure, and measured encode
    wall at local[32] was 3-13× worse than local[8] on the same input.
    Reserving cores per task removes the inflation entirely: encode wall
    40-80 s → 6 s at 32 cores, and the Arrow-UDF analysis queries sped up
    2× as well.  On a real cluster the same intent is expressed
    per-executor (spark.task.cpus or executor cores < vcores), standard
    practice for Python-UDF-heavy stages.

    Round 3 re-measured the high-core value with fresh JVMs interleaved
    (tc=3/2/1 rotated, 3 rounds, sf0.1): after the codec lost ~2.5× of
    its CPU, tc=2 beats tc=3 by 15-20% on every round (3.9-4.4 s vs
    5.0 s) while tc=1 still thrashes (6-9 s) — the leaner Python worker
    leaves room for more slots, but not for full oversubscription."""
    if cores >= 12:
        return 2
    return 1


def get_spark(app: str = "dumpster", cores: int | str | None = None,
              chunk_rows: int = DEFAULT_CHUNK_ROWS,
              extra: dict | None = None) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    # '*' resolves to the REAL core count, not a literal 32: on a small
    # machine the hardcoded value set task.cpus=2 and halved the already
    # small slot count — the exact configuration _auto_task_cpus exists
    # to avoid at low core counts (round-5 review finding)
    n_cores = (os.cpu_count() or 4) if cores == "*" else int(cores)
    shuffle_parts = max(n_cores, 4)
    task_cpus = _auto_task_cpus(n_cores)
    b = (SparkSession.builder
         .master(f"local[{cores}]")
         .appName(app)
         .config("spark.sql.shuffle.partitions", str(shuffle_parts))
         .config("spark.task.cpus", str(task_cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_rows))
         .config("spark.driver.memory",
                 os.environ.get("DUMPSTER_DRIVER_MEM", "16g"))
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         # Shuffle compression: round 1 measured it off as faster (the
         # html payload is largely incompressible), but an interleaved
         # A/B/A/B re-measurement (round 2, same sessions alternating)
         # shows lz4 ON is ~20-25%% faster on best-of trials: the shared
         # host is memory-bandwidth-bound, so fewer shuffle bytes beats
         # fewer compression cycles — and on a network-shuffle cluster
         # compression is the standard choice anyway.
         .config("spark.shuffle.compress", "true")
         .config("spark.shuffle.spill.compress", "true")
         # lz4 default; DUMPSTER_IO_CODEC=zstd flips shuffle/spill codec
         # (A/B seam — zstd trades compression cycles for fewer bytes
         # through the memory bus / network)
         .config("spark.io.compression.codec",
                 os.environ.get("DUMPSTER_IO_CODEC", "lz4")))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
