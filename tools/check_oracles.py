"""Local replica of the driver's correctness gate: run each queries() entry
on Spark at sf0.01 and compare against oracle_sql() via DuckDB —
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(rows, colnames):
    """Order-insensitive: sort columns by name, round floats, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v + 0.0:.6f}"          # fold -0.0 → 0.0
                if v == "-0.000000":
                    v = "0.000000"
            elif isinstance(v, bytearray):
                v = bytes(v)                  # Spark collects bytearray,
                                              # DuckDB returns bytes
            vals.append(repr(v))
        canon.append("\x1f".join(vals))
    canon.sort()
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dumpster.session import get_spark

    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise check NOTHING and exit 0 with
        # "0 failures" — a green gate that verified nothing
        print(f"unknown query name(s): {sorted(unknown)}; "
              f"known: {sorted(qs)}", file=sys.stderr)
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(s_rows)} rows, cols={s_cols}")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [c for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            failures.append(name)
            continue
        ok_rows = len(s_rows) == len(d_rows)
        ok_cols = sorted(s_cols) == sorted(d_cols)
        sh = value_hash(s_rows, s_cols)
        dh = value_hash(d_rows, d_cols)
        ok_hash = sh == dh
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{status} {name}: rows {len(s_rows)}/{len(d_rows)} "
              f"cols {'=' if ok_cols else f'{s_cols} vs {d_cols}'} "
              f"hash {'=' if ok_hash else f'{sh} vs {dh}'}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows and not ok_hash:
                # show a sample diff to debug
                ss = sorted(s_rows)[:3]
                dd = sorted(d_rows)[:3]
                print(f"     spark sample: {ss}")
                print(f"     duck  sample: {dd}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
