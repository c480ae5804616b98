"""Driver-contract conformance: entry() smoke + oracle parity on a sample
of queries (the full sweep runs via tools/check_oracles.py at sf0.01)."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, value_hash

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


SAMPLE = ["lang_dict_rle", "hour_partition_events", "dedup_replays_events",
          "dup_groups_exact_simhash", "lang_quality_signals",
          "token_counts_by_lang", "topk_brute_vs_ivf",
          "multimodal_meta_salted", "duplicate_span_removal"]


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_parity(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entrymod.oracle_sql()[name])
    d_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(s_rows) == len(d_rows)
    assert value_hash(s_rows, sdf.columns) == value_hash(d_rows, rel.columns)
