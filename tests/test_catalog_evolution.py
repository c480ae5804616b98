"""Schema-version history + durable catalog (round-1 verdict missing #3/#4)
and the encode_table_partitioned safety rails from round-2 ADVICE."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dumpster.engine import (decode_table, encode_table,
                             encode_table_partitioned, restore_catalog,
                             save_catalog, schema_versions, table_schema)


@pytest.fixture()
def docs(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "lang"))


def test_widened_schema_encodes_into_same_table(spark, docs, tmp_path):
    """A second encode with an added column must evolve the stored schema
    (ALTER ADD COLUMNS parity), not be rejected; old chunks decode with
    nulls for the new column."""
    out = str(tmp_path / "evo")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    encode_table(first, out, bucket_expr=F.lit(0), n_buckets=1,
                 chunk_rows=256, resume=False)
    widened = (docs.filter(F.col("doc_id") % 2 == 1)
               .withColumn("score", (F.col("doc_id") * 2).cast("long")))
    encode_table(widened, out, bucket_expr=F.lit(1), n_buckets=2,
                 chunk_rows=256, resume=False)

    assert [f.name for f in table_schema(out).fields] == \
        ["doc_id", "text", "lang", "score"]
    assert schema_versions(out) == ["_schema.v1.json"]

    dec = decode_table(spark, out)
    assert dec.count() == docs.count()
    # old chunks: score is NULL; new chunks: score == doc_id*2
    assert dec.filter("doc_id % 2 = 0 AND score IS NOT NULL").count() == 0
    assert dec.filter("doc_id % 2 = 1 AND score != doc_id * 2").count() == 0
    # pruned decode of only the evolved column also works
    only = decode_table(spark, out, columns=["doc_id", "score"])
    assert only.columns == ["doc_id", "score"]


def test_type_change_is_rejected_with_clear_error(spark, docs, tmp_path):
    out = str(tmp_path / "evo_bad")
    encode_table(docs, out, bucket_expr=F.lit(0), n_buckets=1,
                 chunk_rows=256, resume=False)
    mutated = docs.withColumn("lang", F.lit(7).cast("long"))
    with pytest.raises(ValueError, match="cannot change column 'lang'"):
        encode_table(mutated, out, bucket_expr=F.lit(1), n_buckets=2,
                     chunk_rows=256, resume=False)


def test_catalog_survives_session_restart_shape(spark, docs, tmp_path):
    """save_catalog + restore_catalog: drop every temp view (the
    stand-in for a fresh session) and restore from the JSON catalog."""
    out = str(tmp_path / "cat_t1")
    encode_table(docs, out, bucket_expr=F.lit(0), n_buckets=1,
                 chunk_rows=512, resume=False)
    cat = str(tmp_path / "_catalog.json")
    save_catalog(cat, "docs_enc", out)
    spark.catalog.dropTempView("docs_enc") if "docs_enc" in [
        t.name for t in spark.catalog.listTables()] else None

    restored = restore_catalog(spark, cat)
    assert set(restored) == {"docs_enc"}
    n = spark.sql("SELECT count(*) AS n FROM docs_enc").collect()[0]["n"]
    assert n == docs.count()
    # a vanished table must not break restoring the others
    out2 = str(tmp_path / "cat_gone")
    encode_table(docs.limit(10), out2, bucket_expr=F.lit(0), n_buckets=1,
                 resume=False)
    save_catalog(cat, "gone", out2)
    import shutil
    shutil.rmtree(out2)
    restored = restore_catalog(spark, cat)
    assert restored["docs_enc"] is not None and restored["gone"] is None


def test_partitioned_null_ts_raises_clear_error(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, "2026-01-01 05:30:00")],
        "id long, ts string").select(
        "id", F.col("ts").cast("timestamp").alias("warc_ts"))
    with pytest.raises(ValueError, match="NULL"):
        encode_table_partitioned(df, str(tmp_path / "hp_null"))


def test_partitioned_resume_rejects_append_into_done_hour(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, "2026-01-01 05:30:00") for i in range(20)],
        "id long, ts string").select(
        "id", F.col("ts").cast("timestamp").alias("warc_ts"))
    out = str(tmp_path / "hp_resume")
    encode_table_partitioned(base, out)
    # identical replay: fine (resume no-op)
    encode_table_partitioned(base, out)
    # new rows in a committed hour: loud failure, not silent loss
    more = spark.createDataFrame(
        [(i, "2026-01-01 05:45:00") for i in range(100, 110)],
        "id long, ts string").select(
        "id", F.col("ts").cast("timestamp").alias("warc_ts"))
    with pytest.raises(ValueError, match="already committed"):
        encode_table_partitioned(base.unionAll(more), out)


def test_decode_tables_unions_evolved_schemas(spark, docs, tmp_path):
    """A stream whose schema widened across restarts decodes as ONE
    table: decode_tables applies the same add-only union as write-side
    evolution, null-filling older batches."""
    from dumpster.engine import decode_tables

    d1 = str(tmp_path / "b1")
    d2 = str(tmp_path / "b2")
    encode_table(docs.filter(F.col("doc_id") < 100), d1,
                 bucket_expr=F.lit(0), n_buckets=1, resume=False)
    encode_table(docs.filter(F.col("doc_id") >= 100)
                 .withColumn("score", (F.col("doc_id") * 3).cast("long")),
                 d2, bucket_expr=F.lit(0), n_buckets=1, resume=False)
    dec = decode_tables(spark, [d1, d2])
    assert set(dec.columns) == {"doc_id", "text", "lang", "score"}
    assert dec.count() == docs.count()
    assert dec.filter("doc_id < 100 AND score IS NOT NULL").count() == 0
    assert dec.filter("doc_id >= 100 AND score != doc_id * 3").count() == 0

    # genuine type conflict still raises
    d3 = str(tmp_path / "b3")
    encode_table(docs.withColumn("lang", F.lit(1).cast("long")), d3,
                 bucket_expr=F.lit(0), n_buckets=1, resume=False)
    with pytest.raises(ValueError, match="cannot change column"):
        decode_tables(spark, [d1, d3]).count()


def test_evolved_store_pruned_and_zone_filtered_decode(spark, docs, tmp_path):
    """Interaction surface: column-pruned + zone-filtered decode over an
    evolved store.  Old chunks lack the added column entirely (no data,
    no zone stats): pruned reads must null-fill it and a zone filter on
    the evolved column must keep statless chunks conservatively."""
    out = str(tmp_path / "evo_zone")
    encode_table(docs.filter("doc_id % 2 = 0"), out, bucket_expr=F.lit(0),
                 n_buckets=1, chunk_rows=64, order_cols=("doc_id",),
                 resume=False)
    encode_table(docs.filter("doc_id % 2 = 1")
                 .withColumn("score", (F.col("doc_id") * 2).cast("long")),
                 out, bucket_expr=F.lit(1), n_buckets=2, chunk_rows=64,
                 order_cols=("doc_id",), resume=False)
    dec = decode_table(spark, out, columns=["doc_id", "score"],
                       zone_filter=("doc_id", 50, 99))
    rows = dec.filter("doc_id BETWEEN 50 AND 99").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(50, 100))
    for r in rows:
        assert r["score"] == (None if r["doc_id"] % 2 == 0
                              else r["doc_id"] * 2)
    # zone filter on the EVOLVED column: old statless chunks stay in scan
    n = decode_table(spark, out, columns=["doc_id", "score"],
                     zone_filter=("score", 100, 120)).count()
    assert n > 0
