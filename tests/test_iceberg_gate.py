"""Iceberg front door: capability gate + jarless encode path.

Same contract as the Kafka gate (test_streaming.py): the sandbox has no
Iceberg runtime, so the reader must fail loudly with the exact deploy
remedy, while the encode pipeline around it is fully exercised through
the injected-loader seam.
"""

import pytest
import pyspark.sql.functions as F

from dumpster.iceberg import encode_iceberg, iceberg_capabilities, \
    read_iceberg
from dumpster.engine import decode_table
from dumpster.streaming import CapabilityMissing


def test_capability_probe_and_remedy(spark):
    caps = iceberg_capabilities(spark)
    assert caps == {"iceberg": False}  # sandbox ships no Iceberg jar
    with pytest.raises(CapabilityMissing) as ei:
        read_iceberg(spark, "cc.web.pages")
    msg = str(ei.value)
    assert "--packages" in msg and "iceberg-spark-runtime" in msg
    assert "spark.sql.catalog" in msg  # catalog conf is part of the fix


def test_encode_iceberg_via_loader(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ice")

    def loader(s, table):
        assert table == "cc.web.pages"
        return src

    man = encode_iceberg(
        spark, "cc.web.pages", out, loader=loader,
        columns=["doc_id", "lang", "n_chars"],
        bucket_expr=(F.col("doc_id") % 4).cast("int"), n_buckets=4,
        chunk_rows=256)
    assert man.count() > 0
    dec = decode_table(spark, out)
    want = src.select("doc_id", "lang", "n_chars")
    assert dec.exceptAll(want).count() == 0
    assert want.exceptAll(dec).count() == 0


def test_encode_iceberg_without_loader_is_gated(spark, tmp_path):
    with pytest.raises(CapabilityMissing):
        encode_iceberg(spark, "cc.web.pages", str(tmp_path / "x"))
