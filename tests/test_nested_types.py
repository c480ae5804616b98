"""Engine coverage of struct columns (flatten/rebuild) and list<numeric>
columns — the metadata-enriched table (F2) and the embeddings table both
round-trip through the codec layer."""

from pyspark.sql import Row, functions as F

from dumpster import pipeline
from dumpster.engine import decode_table, encode_table


def _same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_embeddings_table_roundtrips(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = str(tmp_path / "emb")
    man = encode_table(
        emb, out,
        bucket_expr=F.pmod(F.xxhash64("vec_id"), F.lit(4)).cast("int"),
        n_buckets=4, chunk_rows=128)
    dec = decode_table(spark, out)
    assert dec.schema == emb.schema
    _same(emb, dec)


def test_metadata_struct_roundtrips(spark, tmp_path):
    """F2: the reference's P1/P2 metadata-enriched record shape
    (AvroExtendedMessage.java:69-88) through encode/decode."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    enriched = pipeline.meta_project(
        docs.select(F.col("doc_id"), F.col("lang"), F.col("text"),
                    (F.col("doc_id") % 8).cast("int").alias("part"),
                    (F.col("doc_id") * 1000).alias("ts")),
        "doc_id", "doc_id", "part", "ts")
    # add a NULL struct row vs struct-of-null distinction
    with_null = enriched.withColumn(
        "metadata", F.when(F.col("doc_id") % 50 == 0, F.lit(None))
        .otherwise(F.col("metadata")))
    out = str(tmp_path / "meta")
    encode_table(with_null, out,
                 bucket_expr=F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int"),
                 n_buckets=4, chunk_rows=128)
    dec = decode_table(spark, out)
    assert dec.schema == with_null.schema
    _same(with_null, dec)
    # NULL struct stayed NULL (not struct of nulls)
    assert dec.filter(F.col("metadata").isNull()).count() == \
        with_null.filter(F.col("metadata").isNull()).count()


def test_struct_column_pruning(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    enriched = pipeline.meta_project(
        docs.select("doc_id", "lang",
                    (F.col("doc_id") % 4).cast("int").alias("part"),
                    F.col("n_chars").alias("ts")),
        "doc_id", "doc_id", "part", "ts")
    out = str(tmp_path / "prune")
    encode_table(enriched, out,
                 bucket_expr=F.pmod(F.xxhash64("doc_id"), F.lit(2)).cast("int"),
                 n_buckets=2, chunk_rows=256)
    only_meta = decode_table(spark, out, columns=["metadata", "doc_id"])
    assert only_meta.columns == ["metadata", "doc_id"]
    _same(enriched.select("metadata", "doc_id"), only_meta)
