"""mode="salted_pre" — the pre-encoded shuffle (round-4 verdict item #6).

The full-row salted exchange's no-op floor alone breached the 2× bar at
sf1 (bench/BENCH.md), so this mode ships the grouping across the wire as
zstd'd Arrow-IPC blobs and rebuilds host-major bucket order reduce-side.
Contract under test:
 * decode(encode(df, mode="salted_pre")) == df exactly
 * the produced store is LAYOUT-IDENTICAL to mode="salted": same bucket
   set, same chunk count, same encoded byte total (the merge restores
   the global host-major order before the unchanged encoder runs)
 * resume: a store with some buckets already durable encodes only the
   missing buckets
 * works without url_col (hash bucketing) and with order_cols
"""

import os

import pytest
from pyspark.sql import functions as F

from dumpster.engine import (decode_table, done_buckets, encode_summary,
                             encode_table)
from dumpster.synth import synth_pages

N_ROWS = 4000


@pytest.fixture(scope="module")
def pages(spark):
    # several input splits so the packer sees distinct map-side runs of
    # the same bucket (the merge path is only exercised with >1 split)
    return synth_pages(spark, N_ROWS, seed=42).repartition(5).cache()


def _assert_same(df_a, df_b):
    assert df_a.exceptAll(df_b).count() == 0
    assert df_b.exceptAll(df_a).count() == 0


def test_pre_roundtrip_and_layout_parity_with_salted(spark, pages, tmp_path):
    pre_dir, sal_dir = str(tmp_path / "pre"), str(tmp_path / "sal")
    man_pre = encode_table(pages, pre_dir, url_col="url", n_buckets=8,
                           chunk_rows=512, mode="salted_pre", table_id="t")
    man_sal = encode_table(pages, sal_dir, url_col="url", n_buckets=8,
                           chunk_rows=512, mode="salted", table_id="t")
    _assert_same(pages, decode_table(spark, pre_dir))

    s_pre, s_sal = encode_summary(man_pre), encode_summary(man_sal)
    assert s_pre["rows"] == s_sal["rows"] == N_ROWS
    assert s_pre["buckets"] == s_sal["buckets"]
    assert s_pre["chunks"] == s_sal["chunks"]
    # identical global host-major layout ⇒ identical encoded bytes (the
    # only admissible difference is equal-key tie order, which the
    # synthetic urls don't produce)
    assert s_pre["encoded_bytes"] == s_sal["encoded_bytes"]


def test_pre_resume_encodes_only_missing_buckets(spark, pages, tmp_path):
    out = str(tmp_path / "enc")
    encode_table(pages, out, url_col="url", n_buckets=8, chunk_rows=512,
                 mode="salted_pre")
    done = done_buckets(out)
    assert len(done) == 8
    # simulate a crash that lost three buckets' manifests + chunks
    lost = sorted(done)[:3]
    for b in lost:
        os.remove(os.path.join(out, "manifest", f"b{b:06d}.parquet"))
        for f in os.listdir(os.path.join(out, "chunks")):
            if f.startswith(f"b{b:06d}_"):
                os.remove(os.path.join(out, "chunks", f))
    before = set(os.listdir(os.path.join(out, "chunks")))
    # chunk names are deterministic, so set-inclusion alone cannot tell
    # a true resume from a full re-encode — pin the surviving files'
    # mtimes (round-5 review finding; same discipline as
    # test_engine_roundtrip's resume test)
    mtimes = {f: os.path.getmtime(os.path.join(out, "chunks", f))
              for f in before}

    man = encode_table(pages, out, url_col="url", n_buckets=8,
                       chunk_rows=512, mode="salted_pre")
    # untouched buckets were not rewritten (same chunk files survive,
    # BYTE-UNTOUCHED per mtime) and the full table decodes exactly
    after = set(os.listdir(os.path.join(out, "chunks")))
    assert before <= after
    for f in before:
        assert os.path.getmtime(os.path.join(out, "chunks", f)) \
            == mtimes[f], f"resume rewrote untouched chunk {f}"
    assert done_buckets(out) == done
    assert encode_summary(man)["rows"] == N_ROWS
    _assert_same(pages, decode_table(spark, out))


def test_pre_without_url_col_hash_buckets(spark, pages, tmp_path):
    out = str(tmp_path / "enc")
    encode_table(pages.select("url", "lang"), out, n_buckets=4,
                 chunk_rows=512, mode="salted_pre")
    _assert_same(pages.select("url", "lang"), decode_table(spark, out))


def test_pre_order_cols_zone_maps_tighten(spark, pages, tmp_path):
    from dumpster.engine import prune_manifest_files, read_manifest

    out = str(tmp_path / "enc")
    man = encode_table(pages, out, url_col="url", n_buckets=4,
                       chunk_rows=256, mode="salted_pre",
                       order_cols=("warc_ts",))
    _assert_same(pages, decode_table(spark, out))
    assert encode_summary(man)["rows"] == N_ROWS
    # the behavior in the test's name: order_cols must actually tighten
    # per-chunk warc_ts zones so a narrow ts probe prunes chunk files —
    # if the pre-shuffle merge dropped the order, every chunk spans the
    # full ts range and nothing prunes (round-5 review finding: this
    # used to assert only roundtrip + rows)
    lo = pages.agg(F.min("warc_ts")).collect()[0][0]
    rows = read_manifest(spark, out).select("file", "col_stats").collect()
    kept = prune_manifest_files(rows, ("warc_ts", lo, lo))
    total = len({r["file"] for r in rows})
    assert 0 < len(kept) < total, (len(kept), total)


def test_unknown_mode_raises(pages, tmp_path):
    with pytest.raises(ValueError, match="unknown mode"):
        encode_table(pages, str(tmp_path / "x"), url_col="url",
                     mode="bogus")
    with pytest.raises(ValueError, match="salted_pre"):
        encode_table(pages.withColumn("b", F.lit(1)), str(tmp_path / "y"),
                     bucket_col="b", mode="salted_pre")


def test_pre_layout_parity_with_null_keys(spark, pages, tmp_path):
    """NULL merge keys must land where Spark's sort puts them (NULLS
    FIRST): Arrow's default sort places nulls at_end, which silently
    re-ordered NULL-host / NULL-order-key rows to the opposite end of
    each bucket and broke byte-level layout parity with mode='salted'
    (round-5 review finding)."""
    h = F.crc32(F.col("url"))
    nulled = (pages
              .withColumn("__h", h)
              .withColumn("url", F.when(F.col("__h") % 7 == 0,
                                        F.lit(None)).otherwise(F.col("url")))
              .withColumn("warc_ts", F.when(F.col("__h") % 11 == 0,
                                            F.lit(None))
                          .otherwise(F.col("warc_ts")))
              .drop("__h"))
    pre_dir, sal_dir = str(tmp_path / "pre"), str(tmp_path / "sal")
    man_pre = encode_table(nulled, pre_dir, url_col="url", n_buckets=8,
                           chunk_rows=512, mode="salted_pre", table_id="t",
                           order_cols=("warc_ts",))
    man_sal = encode_table(nulled, sal_dir, url_col="url", n_buckets=8,
                           chunk_rows=512, mode="salted", table_id="t",
                           order_cols=("warc_ts",))
    _assert_same(nulled, decode_table(spark, pre_dir))
    s_pre, s_sal = encode_summary(man_pre), encode_summary(man_sal)
    assert s_pre["rows"] == s_sal["rows"] == N_ROWS
    assert s_pre["buckets"] == s_sal["buckets"]
    assert s_pre["chunks"] == s_sal["chunks"]
    assert s_pre["encoded_bytes"] == s_sal["encoded_bytes"]
