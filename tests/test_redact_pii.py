"""textops.redact_pii — typed-placeholder PII scrubbing with counts."""

import pytest

from dumpster import textops


@pytest.fixture(scope="module")
def redacted(spark):
    docs = spark.createDataFrame(
        [(1, "mail a.b+c@sub.example.org now"),
         (2, "server at 192.168.001.250 port"),
         (3, "call 555-867-5309 or 555.123.4567"),
         (4, "clean text, no pii at all"),
         (5, "u1@ex.com and u2@ex.com from 10.0.0.7 dial 555 123 4567")],
        "doc_id int, text string")
    return {r["doc_id"]: r.asDict()
            for r in textops.redact_pii(docs).collect()}


def test_email(redacted):
    r = redacted[1]
    assert r["text_redacted"] == "mail <EMAIL> now"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 0, 0)


def test_ipv4(redacted):
    r = redacted[2]
    assert r["text_redacted"] == "server at <IP> port"
    assert r["n_ips"] == 1


def test_phones(redacted):
    r = redacted[3]
    assert r["text_redacted"] == "call <PHONE> or <PHONE>"
    assert r["n_phones"] == 2


def test_clean_passthrough(redacted):
    r = redacted[4]
    assert r["text_redacted"] == "clean text, no pii at all"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_mixed_all_types(redacted):
    r = redacted[5]
    assert r["text_redacted"] == \
        "<EMAIL> and <EMAIL> from <IP> dial <PHONE>"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (2, 1, 1)


def test_no_python_in_plan(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = textops.redact_pii(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
