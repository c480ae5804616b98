"""remove_duplicate_spans — the removal half of the ExactSubstr pipeline
(Lee et al. 2022; detection half is dedup.duplicate_spans, reference-parity
family HourlyBasedRecordConsumer.java has no analogue — this is a §2.10
training-pipeline op)."""

from pyspark.sql import functions as F

from dumpster import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_span_cut(spark):
    docs = _docs(spark, [(1, "a b c d e f g h")])
    spans = spark.createDataFrame([(1, 2, 4)],
                                  "doc_id long, span_start long, span_end long")
    got = dedup.remove_duplicate_spans(docs, spans).collect()
    assert got[0]["text"] == "a b f g h"


def test_span_at_start_end_and_full_cover(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "x y z"), (3, "p q r")])
    spans = spark.createDataFrame(
        [(1, 0, 1), (2, 1, 2), (3, 0, 2)],
        "doc_id long, span_start long, span_end long")
    got = {r["doc_id"]: r["text"]
           for r in dedup.remove_duplicate_spans(docs, spans).collect()}
    assert got == {1: "c", 2: "x", 3: ""}


def test_no_spans_passes_through_byte_identical(spark):
    docs = _docs(spark, [(1, "a  b   c"), (2, None)])
    spans = spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long")
    got = {r["doc_id"]: r["text"]
           for r in dedup.remove_duplicate_spans(docs, spans).collect()}
    assert got == {1: "a  b   c", 2: None}


def test_overlapping_spans_tolerated(spark):
    docs = _docs(spark, [(1, "a b c d e f")])
    spans = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 4), (1, 4, 4)],
        "doc_id long, span_start long, span_end long")
    got = dedup.remove_duplicate_spans(docs, spans).collect()
    assert got[0]["text"] == "a f"


def test_other_columns_pass_through(spark):
    docs = spark.createDataFrame([(1, "a b c d", "en")],
                                 "doc_id long, text string, lang string")
    spans = spark.createDataFrame(
        [(1, 0, 1)], "doc_id long, span_start long, span_end long")
    got = dedup.remove_duplicate_spans(docs, spans).collect()[0]
    assert (got["doc_id"], got["text"], got["lang"]) == (1, "c d", "en")


def test_detect_then_remove_reaches_fixed_point(spark):
    """Lee et al.'s invariant on the shared-block fixture: one
    detect+remove pass leaves no k-gram with corpus count >= 2."""
    k = 4
    block = "w0 w1 w2 w3 w4 w5"
    rows = [(i, f"{block} unique{i}a unique{i}b unique{i}c unique{i}d")
            for i in range(12)]
    docs = _docs(spark, rows)
    spans = dedup.duplicate_spans(docs, k=k)
    cleaned = dedup.remove_duplicate_spans(docs, spans)
    again = dedup.duplicate_spans(cleaned, k=k)
    assert again.count() == 0
    # and the unique suffixes all survived
    texts = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    for i in range(12):
        assert texts[i] == f"unique{i}a unique{i}b unique{i}c unique{i}d"


def test_oracle_parity_duckdb(spark):
    """Engine vs the composed DuckDB oracle on an in-memory fixture."""
    import duckdb

    rows = [(i, ("shared shared shared shared shared prefix block here "
                 f"tail{i} tail{i}x")) for i in range(10)]
    rows.append((99, "totally unique words only here now"))
    docs = _docs(spark, rows)
    spans = dedup.duplicate_spans(docs, k=5)
    got = {r["doc_id"]: r["text"] for r in
           dedup.remove_duplicate_spans(docs, spans)
           .select("doc_id", "text").collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    want = {r[0]: r[1] for r in con.execute(
        dedup.duplicate_span_removal_sql("src", k=5)).fetchall()}
    assert got == want
