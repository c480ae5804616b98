"""Streaming front-end: file-source micro-batches → encode → decode equals
the union of inputs; watermarked hourly windows emit on close."""

import os

import pytest
from pyspark.sql import functions as F

from dumpster.streaming import (decode_stream_table, encode_stream,
                                hourly_windowed_counts, stream_manifest)
from dumpster.synth import synth_pages


def test_stream_encode_decode_roundtrip(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 1200, seed=9).cache()
    a = pages.filter(F.col("warc_ts") < "2026-01-01 00:05:00")
    b = pages.exceptAll(a)

    a.write.mode("overwrite").parquet(os.path.join(src, "p1"))
    schema = spark.read.parquet(os.path.join(src, "p1")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "*")))
    q = encode_stream(stream, out, checkpoint=ckpt, url_col="url",
                      n_buckets=4, chunk_rows=512)
    q.awaitTermination(120)

    # second micro-batch arrives later; availableNow query restarts
    b.write.mode("overwrite").parquet(os.path.join(src, "p2"))
    q2 = encode_stream(stream, out, checkpoint=ckpt, url_col="url",
                       n_buckets=4, chunk_rows=512)
    q2.awaitTermination(120)

    dec = decode_stream_table(spark, out)
    assert dec.count() == 1200
    assert pages.exceptAll(dec).count() == 0
    assert dec.exceptAll(pages).count() == 0

    man = stream_manifest(spark, out)
    assert man.select("batch_id").distinct().count() >= 2
    assert man.agg(F.sum("n_rows")).collect()[0][0] == 1200


def test_hourly_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    pages = synth_pages(spark, 800, seed=4)
    pages.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = hourly_windowed_counts(stream, "warc_ts", watermark="2 hours")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("hourly_counts").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hourly_counts").collect()
    assert sum(r["n"] for r in got) == 800
    # batch-side oracle: same windows from the static frame
    want = (pages.groupBy(F.window("warc_ts", "1 hour")).count().count())
    assert len(got) == want
