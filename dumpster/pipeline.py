"""Relational prep operators — the reference's dataflow ops, Catalyst-side.

Everything here is declarative DataFrame API: Catalyst plans it with
whole-stage codegen, predicate pushdown, and partial aggregation for free
(SURVEY.md §4.2); the custom codec work stays below, in engine.py.

Reference parity (SURVEY.md §2):
  meta_project       P1/P2  AvroExtendedMessage.java:46-55, :69-88
  classify_records   P3     AvroExtendedMessage.java:106-120, RecordType.java:3-5
  dedup_replays      F1     HourlyBasedPartitioner.java:184-205
  hour_partition     G1     HourlyBasedPartitioner.java:84-109,
                            HourlyBasedRecordConsumer.java:125-153
  salted_bucket      —      the explicit skew-handling the reference lacks
                            (1 thread/topic, KafkaStreamer.java:31); the
                            north_rule demands salted url-host partitioning
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ONE host-extraction definition for the whole engine (textops owns it):
# the previous local copy accepted only lowercase schemes and let the
# userinfo group swallow '?'/'#' — host_of('http://e.com?next=a@b.com')
# returned 'b.com' and uppercase-scheme URLs returned '' (round-5 review
# finding; wrong salted buckets for those rows)
from .textops import _URL_HOST_RE as HOST_PATTERN  # noqa: E402


def host_of(url: Column | str) -> Column:
    """Extract the lowercased host from a url (empty string when
    unparseable) — identical semantics to :func:`textops.url_host`."""
    return F.lower(F.regexp_extract(
        F.col(url) if isinstance(url, str) else url, HOST_PATTERN, 1))


def salted_bucket(url: Column | str, n_buckets: int, salt_k: int = 4) -> Column:
    """Skew-resistant bucket assignment for Common-Crawl url-host zipf skew.

    Host-major grouping maximises compression locality (host-specific
    vocabulary → FSST/dict/RLE wins), but a hot host (zipfian head) would
    pin one partition.  So the bucket is ``host_group * salt_k + salt``
    where the salt spreads each host over ``salt_k`` adjacent buckets,
    deterministically by full-url hash (no rand(): resume + re-runs must
    agree).  A 1000-executor job sizes n_buckets to ~2-3× total cores and
    salt_k to the observed head mass; both stay explicit knobs.
    """
    u = F.col(url) if isinstance(url, str) else url
    # one definition of the clamp/group/salt arithmetic — delegating
    # keeps this byte-identical to the precomputed-host form the engine
    # layouts depend on (round-5 review finding: the duplicated formula
    # could silently drift)
    return salted_bucket_of_host(host_of(u), u, n_buckets, salt_k)


def hour_partition(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """G1: derive the reference's dt=YYYY-MM-DD / hr=HH partition columns.

    The reference routes each record into the writer whose inclusive
    [HH:00:00.000, HH:59:59.999] window contains its timestamp
    (HourlyBasedPartitioner.java:88-92); date_trunc('hour') is the same
    mapping expressed declaratively.
    """
    ts = F.col(ts_col)
    return (df
            .withColumn("dt", F.date_format(ts, "yyyy-MM-dd"))
            .withColumn("hr", F.hour(ts).cast("int")))


def dedup_replays(df: DataFrame, partition_col: str, offset_col: str) -> DataFrame:
    """F1: drop replayed/regressed offsets — one row per (partition, offset).

    The reference drops a record when its offset ≤ the last offset already
    consumed for its Kafka partition (HourlyBasedPartitioner.java:199-202),
    which in batch form collapses every (partition, offset) replay to a
    single surviving row.  Window row_number keeps the plan a single
    shuffle on the dedup key.  Assumes the Kafka delivery model the
    reference relies on: a replayed (partition, offset) carries the SAME
    record bytes, so which duplicate survives is immaterial.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(partition_col, offset_col)
         .orderBy(F.col(offset_col)))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: int = 1800,
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization of an event stream in batch form: events
    of one user more than ``gap_seconds`` apart start a new session.
    Adds a ``session_id`` string column (``"<user>-<n>"``, n counting
    from 1 in time order); rows and other columns pass through.

    Spark shape: ONE shuffle — both windows (the `lag` that detects a
    gap and the running sum that numbers sessions) share the same
    partitioning and ordering, so Catalyst plans a single Exchange +
    single Sort and evaluates both in one Window pass.  Gap chaining is
    inherently sequential per user (session n's start depends on every
    prior event), so one user's events must colocate — the skew bound
    is max-events-per-user, not corpus size; salting cannot apply here
    without breaking the semantics.  The gap test is interval arithmetic
    (``ts > lag(ts) + INTERVAL gap``) — µs-exact and valid for both
    TIMESTAMP and TIMESTAMP_NTZ columns, with no timezone conversion —
    and ties break on ``id_col`` so the order (and therefore the
    session numbering) is deterministic.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    ts = F.col(ts_col)
    prev = F.lag(ts).over(w)
    new_sess = F.when(
        prev.isNull()
        | (ts > prev + F.expr(f"INTERVAL {int(gap_seconds)} SECOND")),
        F.lit(1)).otherwise(F.lit(0))
    n = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sid = F.concat(F.col(user_col).cast("string"), F.lit("-"),
                   n.cast("string"))
    return df.withColumn("session_id", sid)


def sessionize_sql(src: str, user_expr: str = "user_id",
                   ts_expr: str = "ts", gap_seconds: int = 1800,
                   id_expr: str = "event_id") -> str:
    """DuckDB oracle for :func:`sessionize` (epoch_us ≡ unix_micros)."""
    win = f"PARTITION BY {user_expr} ORDER BY {ts_expr}, {id_expr}"
    return f"""
        SELECT * EXCLUDE (__ns),
               CAST({user_expr} AS VARCHAR) || '-' ||
               CAST(sum(__ns) OVER ({win} ROWS UNBOUNDED PRECEDING)
                    AS VARCHAR) AS session_id
        FROM (SELECT *,
                     CASE WHEN lag(epoch_us({ts_expr})) OVER ({win})
                               IS NULL
                          OR epoch_us({ts_expr})
                             - lag(epoch_us({ts_expr})) OVER ({win})
                             > {int(gap_seconds) * 1_000_000}
                          THEN 1 ELSE 0 END AS __ns
              FROM {src})
    """


def meta_project(df: DataFrame, id_col: str, offset_col: str,
                 partition_col: str, ts_col: str) -> DataFrame:
    """P1+P2: prepend the reference's metadata struct, payload shifted right.

    Mirrors AvroExtendedMessage.java:46-55 (struct build) and :69-88
    (new schema = metadata + original fields).
    """
    meta = F.struct(
        F.col(id_col).cast("string").alias("id"),
        F.col(offset_col).cast("long").alias("offset"),
        F.col(partition_col).cast("int").alias("partition"),
        F.col(ts_col).cast("long").alias("timestamp"),
    ).alias("metadata")
    payload = [c for c in df.columns]
    return df.select(meta, *payload)


def classify_records(df: DataFrame, value_col: str,
                     error_col: str | None = None) -> DataFrame:
    """P3: RECORD / TOMBSTONE / ERROR routing.

    Tombstone = null value (AvroExtendedMessage.java:116-118); error =
    the deserializer's synthetic KafkaException marker
    (AvroSchemaRegistryDeserializer.java:29-42), here any non-null
    ``error_col``.
    """
    c = F.when(F.col(value_col).isNull(), F.lit("TOMBSTONE"))
    if error_col is not None:
        c = c.when(F.col(error_col).isNotNull(), F.lit("ERROR"))
    return df.withColumn("record_type", c.otherwise(F.lit("RECORD")))


def salted_bucket_of_host(host: Column, url: Column, n_buckets: int,
                          salt_k: int = 4) -> Column:
    """salted_bucket with a precomputed host column (avoids re-running the
    host regexp once per consumer of the host)."""
    # salt_k > n_buckets would emit ids up to salt_k-1, overflowing the
    # [0, n_buckets) namespace consumers size against (e.g. the
    # multischema per-generation ranges)
    salt_k = max(1, min(salt_k, n_buckets))
    n_groups = max(n_buckets // salt_k, 1)
    host_group = F.pmod(F.xxhash64(host), F.lit(n_groups))
    salt = F.pmod(F.xxhash64(url), F.lit(salt_k))
    return (host_group * salt_k + salt).cast("int")


def union_evolving(dfs: list[DataFrame]) -> DataFrame:
    """G2: schema evolution without write failure.

    The reference keeps one writer per distinct Avro schema inside an hour
    bucket (HourlyBasedRecordConsumer.java:20, :58-67); in batch Spark the
    same guarantee is ``unionByName(allowMissingColumns=True)`` — new
    fields appear as nulls on old rows, dropped fields as nulls on new
    ones, and the encoder sees one superset schema.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def prep_for_encode_local(df: DataFrame, url_col: str | None,
                          order_cols: tuple[str, ...] = (),
                          locality_sort: bool = True) -> DataFrame:
    """Zero-shuffle prep: bucket = the input split itself.

    ``__bucket = spark_partition_id()`` makes each scan task one encode
    unit — no exchange at all, mirroring the reference's own layout (one
    output stream per Kafka partition, files {partition}_{firstOffset}
    .parquet, HourlyBasedRecordConsumer.java:157).  Input splits are
    byte-uniform (Parquet split planning), so there is no skew to salt
    away; the optional sortWithinPartitions recovers host-major
    compression locality *within* each split without moving a row.

    Tradeoff vs prep_for_encode (the salted-shuffle path): at 100 TB the
    shuffle costs ~2× table size in cluster I/O; skipping it roughly
    doubles encode throughput, but chunks are host-grouped only within a
    split, so the compression ratio and cross-file zone-map tightness of
    the host-major global layout are partially lost.  Parallelism is
    tuned with spark.sql.files.maxPartitionBytes, not n_buckets.
    """
    out = df
    sort_cols = list(order_cols)
    if url_col is not None and locality_sort:
        out = out.withColumn("__host", host_of(F.col(url_col)))
        sort_cols = ["__host", *order_cols]
    out = out.withColumn("__bucket", F.spark_partition_id())
    if locality_sort and sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    return out.drop("__host") if "__host" in out.columns else out


def prep_for_encode(df: DataFrame, url_col: str, n_buckets: int,
                    salt_k: int = 4, order_cols: tuple[str, ...] = (),
                    locality_sort: bool = True,
                    host_major: bool = True,
                    num_partitions: int | None = None) -> DataFrame:
    """Full prep: salted bucket → explicit repartition → locality sort.

    One shuffle, keyed by the salted bucket.  The host is materialised
    once and reused by both the bucket expression and the optional
    sortWithinPartitions (a local sort, no extra exchange) that restores
    host-major locality inside each partition so RLE/FSST/dict see runs —
    a ratio/throughput knob: skipping it saves the row sort, costs
    compression locality.

    ``num_partitions`` decouples TASK granularity from BUCKET granularity
    (default 2× cluster parallelism, capped at n_buckets): buckets stay
    the salt/skew/resume unit, several of them per reduce task — the
    sorted input lets the encoder close each bucket as it passes.  An
    order-rotated A/B at local[32] measured ~64 partitions 20-35%% faster
    than 128 single-bucket tasks (fewer task/worker round trips), and on
    a real cluster 2-3× total cores is the standard sizing.
    """
    out, merge_keys = salted_layout_cols(df, url_col, n_buckets, salt_k,
                                         order_cols, host_major)
    num_partitions = default_encode_partitions(df, n_buckets, num_partitions)
    out = out.repartition(num_partitions, "__bucket")
    if locality_sort:
        # host-major: host-vocabulary runs maximise RLE/FSST/dict ratio;
        # order-major (host_major=False with order_cols=(ts,)): tight
        # per-chunk zone maps for predicate-pruned decode — a layout
        # tradeoff knob, like choosing a sort key at table-write time
        out = out.sortWithinPartitions("__bucket", *merge_keys)
    return out.drop("__host")


def salted_layout_cols(df: DataFrame, url_col: str, n_buckets: int,
                       salt_k: int = 4, order_cols: tuple[str, ...] = (),
                       host_major: bool = True):
    """The ONE definition of the salted layout, shared by
    :func:`prep_for_encode` (full-row shuffle) and engine's
    ``mode="salted_pre"`` (blob shuffle): ``__host``, the salted
    ``__bucket``, and the in-bucket sort-key order.  Their byte-level
    layout parity is load-bearing (tests/test_salted_pre.py asserts
    encoded-byte EQUALITY), so the derivation must not be duplicated.
    Returns ``(df + __host/__bucket, merge_keys)``; ``merge_keys``
    excludes ``__bucket``.
    """
    u = F.col(url_col)
    out = df.withColumn("__host", host_of(u))
    out = out.withColumn("__bucket", salted_bucket_of_host(
        F.col("__host"), u, n_buckets, salt_k))
    merge_keys = (("__host", *order_cols) if host_major
                  else (*order_cols, "__host"))
    return out, merge_keys


def default_encode_partitions(df: DataFrame, n_buckets: int,
                              num_partitions: int | None = None) -> int:
    """Shared task-granularity default (prep_for_encode and salted_pre):
    2× cluster parallelism, capped at n_buckets — buckets stay the
    salt/skew/resume unit, several per reduce task."""
    if num_partitions is not None:
        return num_partitions
    par = df.sparkSession.sparkContext.defaultParallelism
    return max(1, min(n_buckets, 2 * par))
