"""textops.canonical_url — crawl-style URL canonicalization."""

import pytest
import pyspark.sql.functions as F

from dumpster import textops

CASES = [
    ("HTTP://WWW.Example.COM/Path#frag", "http://www.example.com/Path"),
    ("https://Host.Example:443/a?Q=Up#x", "https://host.example/a?Q=Up"),
    ("http://host.example:80", "http://host.example/"),
    ("http://host.example:8080/x", "http://host.example:8080/x"),
    ("https://host.example:80/x", "https://host.example:80/x"),  # not https default
    ("HTTPS://HOST.example", "https://host.example/"),
    ("ftp://Files.Example.ORG/Pub", "ftp://files.example.org/Pub"),
    ("no-scheme/Path#frag", "no-scheme/Path"),
    ("http://h.example/CaseKept/QS?a=B", "http://h.example/CaseKept/QS?a=B"),
]


@pytest.fixture(scope="module")
def canon(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i int, url string")
    out = df.select("i", textops.canonical_url(F.col("url")).alias("c"))
    return {r["i"]: r["c"] for r in out.collect()}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_case(canon, i):
    assert canon[i] == CASES[i][1], CASES[i][0]


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "http://x/")], "i int, url string")
    plan = df.select(textops.canonical_url(F.col("url")))._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_ipv6_authority_canonicalized(spark):
    """Bracketed IPv6 hosts get the same treatment: hex lowercased
    (RFC 5952 text form) and default ports stripped."""
    df = spark.createDataFrame(
        [(1, "HTTP://[2001:DB8::1]:80/x"), (2, "https://[::1]:8443/y")],
        "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", textops.canonical_url(F.col("url"))
                     .alias("c")).collect()}
    assert got[1] == "http://[2001:db8::1]/x"
    assert got[2] == "https://[::1]:8443/y"
