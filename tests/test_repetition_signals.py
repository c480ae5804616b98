"""textops.repetition_signals — Gopher-style repetition quality signals.

Hand-computed fixtures pin the semantics independently of the DuckDB
oracle (which re-derives them); edge cases cover sub-trigram docs and a
fully repetitious doc."""

import pytest

from dumpster import textops


@pytest.fixture(scope="module")
def sig_rows(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a"),         # 5 words, 2 distinct; trigrams:
                                   # "a b a","b a b","a b a" → 2/3 distinct
         (2, "x"),                 # single word, no trigrams
         (3, "y y y y"),           # all same word
         (4, "p q r s")],          # all distinct
        "doc_id int, text string")
    out = textops.repetition_signals(docs)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_word_counts_and_ratios(sig_rows):
    r1 = sig_rows[1]
    assert r1["n_words"] == 5
    assert r1["distinct_word_ratio"] == pytest.approx(2 / 5)
    assert r1["top_word_frac"] == pytest.approx(3 / 5)   # 'a' ×3
    assert r1["dup_trigram_frac"] == pytest.approx(1 - 2 / 3)


def test_sub_trigram_doc(sig_rows):
    r2 = sig_rows[2]
    assert r2["n_words"] == 1
    assert r2["distinct_word_ratio"] == 1.0
    assert r2["top_word_frac"] == 1.0
    assert r2["dup_trigram_frac"] == 0.0   # guarded, not NULL/NaN


def test_fully_repetitious(sig_rows):
    r3 = sig_rows[3]
    assert r3["distinct_word_ratio"] == pytest.approx(1 / 4)
    assert r3["top_word_frac"] == 1.0
    assert r3["dup_trigram_frac"] == pytest.approx(1 - 1 / 2)  # 2 same tris


def test_all_distinct(sig_rows):
    r4 = sig_rows[4]
    assert r4["top_word_frac"] == pytest.approx(1 / 4)
    assert r4["dup_trigram_frac"] == 0.0
    assert r4["distinct_word_ratio"] == 1.0


def test_no_python_udf_in_plan(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = textops.repetition_signals(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_null_text_doc_is_preserved(spark):
    """A NULL-text doc explodes to no word rows; the signals table must
    still carry it (NULL signals), not silently shrink."""
    docs = spark.createDataFrame([(1, "a b c"), (2, None)],
                                 "doc_id int, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in textops.repetition_signals(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_words"] is None
    assert rows[2]["top_word_frac"] is None
