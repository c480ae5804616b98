"""Reference-parity extras: schema evolution (G2), SQL view registration
(K4), plain-only fallback path (S3-parity), codec selection report."""

from pyspark.sql import Row, functions as F

from dumpster.engine import encode_table, decode_table, register_decoded_view
from dumpster.pipeline import union_evolving
from dumpster.chunk import encode_chunk, decode_chunk
import pyarrow as pa


def test_union_evolving_superset_schema(spark):
    v1 = spark.createDataFrame([Row(a=1, b="x")])
    v2 = spark.createDataFrame([Row(a=2, c=3.5)])          # b dropped, c added
    out = union_evolving([v1, v2])
    assert set(out.columns) == {"a", "b", "c"}
    rows = {r["a"]: r for r in out.collect()}
    assert rows[1]["c"] is None and rows[2]["b"] is None


def test_register_decoded_view_sql(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "enc")
    encode_table(docs, out,
                 bucket_expr=F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int"),
                 n_buckets=4, chunk_rows=256)
    register_decoded_view(spark, out, "docs_encoded")
    n = spark.sql("SELECT count(*) AS n FROM docs_encoded").collect()[0]["n"]
    assert n == docs.count()
    per_lang = spark.sql(
        "SELECT lang, count(*) n FROM docs_encoded GROUP BY lang").count()
    assert per_lang == docs.select("lang").distinct().count()


def test_plain_only_chunk_roundtrips():
    batch = pa.RecordBatch.from_arrays(
        [pa.array(["aa", "bb", "aa"] * 100), pa.array(list(range(300)),
                                                      type=pa.int64())],
        names=["s", "i"])
    from dumpster.chunk import encode_chunk_pieces
    pieces, stats = encode_chunk_pieces(batch, plain_only=True)
    assert all(s["codec"] == "plain" for s in stats)
    blob = b"".join(bytes(p) for p in pieces)
    out = decode_chunk(blob)
    assert out.equals(batch)


def test_codec_selection_report_query(spark):
    import __spark_entry__ as e
    df = e.queries()["codec_selection_report"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    cols = {r["column"] for r in rows}
    assert cols == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r["encoded_bytes"] > 0 for r in rows)
