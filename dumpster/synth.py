"""Deterministic Common-Crawl-style `pages` generator (FIXTURES.md F1).

Everything derives from the row index through a splitmix64-style mixer, so
the table is bit-identical across runs AND across parallelism levels
(local[8] vs local[32] must see the same bytes — the scaling-efficiency
evidence depends on it).  No wall-clock, no unkeyed rand().

Schema (BASELINE.json input_hint, exact):
    url:string  warc_ts:timestamp[us]  html:binary  text:string  lang:string

Shape knobs follow FIXTURES F1: zipf(s≈1.2) hosts (top host ≈ tens of
percent of rows → real url-host skew for the salting test), monotone-ish
µs timestamps with a small backwards tail, 1%-null html of boilerplate +
non-UTF8 pseudo-random bytes, host-specific bag-of-words text, 12 langs
with pt/en head.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")

_LANGS = ["pt", "en", "es", "fr", "de", "it", "nl", "pl", "ru", "ja", "tr", "id"]
_LANG_CUM = np.cumsum([0.55, 0.25, 0.06, 0.03, 0.03, 0.02,
                       0.015, 0.015, 0.01, 0.01, 0.005, 0.005])
_SYL = ["ba", "co", "da", "en", "fi", "go", "hu", "in", "jo", "ka", "lu",
        "me", "no", "or", "pa", "qu", "ri", "so", "tu", "va", "we", "xi"]
_VOCAB = [_SYL[i % 22] + _SYL[(i * 7 + 3) % 22] + _SYL[(i * 13 + 5) % 22]
          for i in range(512)]
_PREFIX = b"<html><head><meta charset=x></head><body><div class=main>"
_SUFFIX = b"</div></body></html>"
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic entropy source."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray, salt: int) -> np.ndarray:
    return _mix(x, salt).astype(np.float64) / 2.0**64


@functools.lru_cache(maxsize=4)
def _host_table(n_rows: int, seed: int):
    n_hosts = max(16, n_rows // 64)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    cum = np.cumsum(ranks ** -1.2)
    tlds = ["com", "net", "org"]
    hosts = [f"h{k}.example.{tlds[k % 3]}" for k in range(n_hosts)]
    # host → lang (host-level assignment makes lang runs under host-major order)
    hl = _u01(np.arange(n_hosts, dtype=np.uint64), seed + 77)
    lang_idx = np.searchsorted(_LANG_CUM, hl)
    lang_idx = np.clip(lang_idx, 0, len(_LANGS) - 1)
    # host → vocabulary slice (host-specific wording, FIXTURES F1 text rule)
    voff = (_mix(np.arange(n_hosts, dtype=np.uint64), seed + 31)
            % np.uint64(len(_VOCAB) - 64)).astype(np.int64)
    return cum, hosts, lang_idx, voff


def _gen_batch(idx: np.ndarray, n_rows: int, seed: int) -> pa.RecordBatch:
    n = len(idx)
    cum, hosts, host_lang, host_voff = _host_table(n_rows, seed)
    u = idx.astype(np.uint64)

    host_id = np.searchsorted(cum, _u01(u, seed) * cum[-1])
    host_id = np.clip(host_id, 0, len(hosts) - 1)

    a = (_mix(u, seed + 1) % np.uint64(0xFFFFFF)).astype(np.int64)
    b = (_mix(u, seed + 2) % np.uint64(0xFFFF)).astype(np.int64)
    urls = [f"https://{hosts[h]}/p{x:06x}/{y:04x}-{i}"
            for h, x, y, i in zip(host_id, a, b, idx)]

    # timestamps: ~monotone stream, 0.5% pushed backwards (late rows)
    ts = BASE_TS_US + idx * 900_000 + (_mix(u, seed + 3) % np.uint64(750_000)).astype(np.int64)
    late = _u01(u, seed + 4) < 0.005
    ts = np.where(late, ts - 3_600_000_000, ts).astype("datetime64[us]")

    # html: lognormal length, boilerplate + pseudo-random non-UTF8 tail
    u1 = np.clip(_u01(u, seed + 5), 1e-12, 1 - 1e-12)
    u2 = _u01(u, seed + 6)
    z = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
    tail_len = np.clip(np.exp(7.6 + 0.6 * z), 128, 49_152).astype(np.int64)
    words8 = (tail_len + 7) // 8
    doc_seed = _mix(u, seed + 7)
    k = _ramp(words8)
    stream = _mix(np.repeat(doc_seed, words8) + k.astype(np.uint64), seed + 8)
    tail_buf = stream.view(np.uint8)  # little-endian byte stream
    pad_starts = np.concatenate(([0], np.cumsum(words8 * 8)))
    html_null = _u01(u, seed + 9) < 0.01
    html = [None if html_null[i] else
            _PREFIX + tail_buf[pad_starts[i]:pad_starts[i] + tail_len[i]].tobytes() + _SUFFIX
            for i in range(n)]

    # text: host-vocab bag of words, length ∝ html length (FIXTURES F1)
    n_words = np.clip(tail_len // 40, 5, 400).astype(np.int64)
    wk = _ramp(n_words)
    widx = (_mix(np.repeat(doc_seed, n_words) + wk.astype(np.uint64), seed + 10)
            % np.uint64(64)).astype(np.int64)
    woff = np.repeat(host_voff[host_id], n_words)
    flat_words = [_VOCAB[w] for w in (widx + woff)]
    bounds = np.concatenate(([0], np.cumsum(n_words)))
    text = [" ".join(flat_words[bounds[i]:bounds[i + 1]]) for i in range(n)]

    lang = [_LANGS[host_lang[h]] for h in host_id]

    return pa.RecordBatch.from_arrays(
        [pa.array(urls, type=pa.string()),
         pa.array(ts, type=pa.timestamp("us")),
         pa.array(html, type=pa.binary()),
         pa.array(text, type=pa.string()),
         pa.array(lang, type=pa.string())],
        names=["url", "warc_ts", "html", "text", "lang"])


def _ramp(lengths: np.ndarray) -> np.ndarray:
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - lengths, lengths)


def synth_pages(spark: SparkSession, n_rows: int, seed: int = 42,
                parts: int | None = None) -> DataFrame:
    """Distributed deterministic generation: spark.range → mapInArrow."""
    parts = parts or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches):
        for batch in batches:
            idx = batch.column(0).to_numpy()
            if len(idx):
                yield _gen_batch(idx.astype(np.int64), n_rows, seed)

    return spark.range(n_rows, numPartitions=parts).mapInArrow(gen, PAGES_DDL)


def materialize_pages(spark: SparkSession, n_rows: int, path: str,
                      seed: int = 42) -> str:
    """Generate once, cache as parquet keyed by (n_rows, seed)."""
    import os
    full = os.path.join(path, f"pages_n{n_rows}_s{seed}.parquet")
    if not os.path.exists(full):
        # uncompressed: html is incompressible anyway and the bench should
        # measure the engine, not parquet-snappy decode of its own input.
        # The tmp dir is per-process so two concurrent materializers
        # cannot interleave part files in ONE staging dir (round-5 review
        # finding); whoever publishes first wins, the loser discards
        tmp = f"{full}.tmp.{os.getpid()}"
        (synth_pages(spark, n_rows, seed).write.mode("overwrite")
         .option("compression", "none").parquet(tmp))
        try:
            os.replace(tmp, full)
        except OSError:
            if not os.path.exists(full):
                raise          # real failure, not a lost publish race
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    return full
