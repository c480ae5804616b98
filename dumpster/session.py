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


def get_spark(app: str = "dumpster", cores: int | str | None = None,
              chunk_rows: int = DEFAULT_CHUNK_ROWS,
              extra: dict | None = None) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_parts = 32 if cores == "*" else max(int(cores), 4)
    b = (SparkSession.builder
         .master(f"local[{cores}]")
         .appName(app)
         .config("spark.sql.shuffle.partitions", str(shuffle_parts))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_rows))
         .config("spark.driver.memory",
                 os.environ.get("DUMPSTER_DRIVER_MEM", "16g"))
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         # web-page payloads (html bytes) are largely incompressible, so
         # LZ4-compressing the bucket shuffle burns cores for ~0 byte
         # savings — measured 4.7× encode wall improvement with it off in
         # local mode.  On a network-bound real cluster re-enable with
         # zstd and measure; this is a per-deploy knob, not a constant.
         .config("spark.shuffle.compress", "false")
         .config("spark.shuffle.spill.compress", "false"))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
