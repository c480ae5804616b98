"""Text-analysis operators for a web-scale training-data pipeline.

All hot-path operators are pure Column expressions (JVM-side, whole-stage
codegen — no Python in the loop); only the fingerprint/simhash sketches,
which need per-byte arithmetic, drop to Arrow-batched pandas UDFs.

Operators: token counting, quality scoring, n-gram-heuristic language ID,
rolling-hash document fingerprinting, 64-bit simhash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# crude per-language marker words for the n-gram/stopword heuristic;
# counts are computed portably via length arithmetic (same trick works in
# any SQL dialect, so the DuckDB oracle matches exactly)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "pt": [" de ", " que ", " uma "],
    "es": [" el ", " los ", " una "],
    "fr": [" le ", " les ", " des "],
}


def occurrences(col: Column, pat: str) -> Column:
    """Occurrence count of a literal pattern, expression-only."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return ((F.length(padded) - F.length(F.replace(padded, F.lit(pat))))
            / F.lit(len(pat))).cast("long")


def token_count(col: Column) -> Column:
    return F.size(F.split(col, " ")).cast("long")


def avg_token_len(col: Column) -> Column:
    n = token_count(col)
    return ((F.length(col) - (n - 1)) / n)


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length / token / shape heuristics; `keep` is the filter decision."""
    t = F.col(text_col)
    n_tok = token_count(t)
    atl = avg_token_len(t)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(atl, 4).alias("avg_token_len"),
        F.when((n_tok >= 5) & (n_tok <= 100000)
               & (atl >= 2.0) & (atl <= 14.0), F.lit(1))
        .otherwise(F.lit(0)).cast("int").alias("keep"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-word language guess: highest marker count wins; ties go to
    the alphabetically first language; zero hits → 'und'."""
    t = F.col(text_col)
    scores = [
        (lang, sum((occurrences(t, p) for p in pats), F.lit(0)))
        for lang, pats in sorted(LANG_MARKERS.items())
    ]
    max_score = F.greatest(*[s for _, s in scores])
    guessed = F.when(max_score <= 0, F.lit("und"))
    for lang, score in scores:                 # CASE order = alphabetical
        guessed = guessed.when(score == max_score, F.lit(lang))
    return df.select(F.col(id_col), guessed.alias("lang_guess"))


MOD = (1 << 61) - 1
POLY = 1_000_003


@F.pandas_udf(LongType())
def doc_fingerprint(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash over bytes, mod 2^61-1 (Arrow-batched)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        if s is None:
            out[i] = -1
            continue
        h = 0
        for b in s.encode("utf-8", "surrogatepass"):
            h = (h * POLY + b) % MOD
        out[i] = h
    return pd.Series(out)


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit simhash over whitespace tokens (md5-derived token hashes).

    Arrow-batched; per batch the bit-vote accumulation is vectorized —
    tokens hash once each, votes accumulate as a (n_tokens, 64) int matrix.
    """
    out = np.empty(len(texts), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, s in enumerate(texts):
        if not s:
            out[i] = 0
            continue
        toks = s.split(" ")
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
             for t in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(toks)
        sig = np.uint64(0)
        sig = ((votes >= 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def lang_id_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB/ANSI oracle equivalent of :func:`lang_id`."""
    def occ(pat):
        pad = f"(' ' || {text_expr} || ' ')"
        return (f"CAST((length({pad}) - length(replace({pad}, '{pat}', '')))"
                f" / {len(pat)} AS BIGINT)")
    score = {lang: "(" + " + ".join(occ(p) for p in pats) + ")"
             for lang, pats in sorted(LANG_MARKERS.items())}
    max_s = "greatest(" + ", ".join(score[k] for k in sorted(score)) + ")"
    cases = [f"WHEN {max_s} <= 0 THEN 'und'"]
    for lang in sorted(score):
        cases.append(f"WHEN {score[lang]} = {max_s} THEN '{lang}'")
    return (f"SELECT {id_expr} AS doc_id, "
            f"CASE {' '.join(cases)} END AS lang_guess "
            f"FROM documents")
