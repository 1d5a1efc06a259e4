"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + schema-width + order-insensitive value hash.

Usage: python tools/verify_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted(
        "\x01".join(cell(v) for v in rec) for rec in df.itertuples(index=False)
    )
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from langtoolsosm_spark.session import get_spark

    spark = get_spark("verify_oracles", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {e}"
            print(f"[FAIL-spark] {name}: {e}")
            continue
        t1 = time.time()
        if name not in oracles:
            results[name] = f"rows-only: {len(sdf)} rows ({t1-t0:.1f}s)"
            print(f"[rows-only] {name}: {len(sdf)} rows  spark={t1-t0:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            print(f"[FAIL-duckdb] {name}: {e}")
            continue
        t2 = time.time()
        sn, sc, sh = normalize(sdf)
        on, oc, oh = normalize(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK" if ok else "MISMATCH"
        results[name] = status
        print(
            f"[{status}] {name}: spark {sn} rows / oracle {on} rows  "
            f"cols={'=' if sc == oc else f'{sc} vs {oc}'} hash={'=' if sh == oh else 'DIFF'}  "
            f"({t1-t0:.1f}s / {t2-t1:.1f}s)"
        )
        if not ok and sn == on and sc == oc:
            # show first differing rows for debugging
            s_rows = sdf[sorted(sdf.columns)].astype(str).sort_values(sorted(sdf.columns)).reset_index(drop=True)
            o_rows = odf[sorted(odf.columns)].astype(str).sort_values(sorted(odf.columns)).reset_index(drop=True)
            diff = (s_rows != o_rows).any(axis=1)
            if diff.any():
                i = diff.idxmax()
                print("  first diff row spark :", s_rows.iloc[i].to_dict())
                print("  first diff row oracle:", o_rows.iloc[i].to_dict())

    n_ok = sum(1 for v in results.values() if v == "OK")
    n_ro = sum(1 for v in results.values() if str(v).startswith("rows-only"))
    n_bad = len(results) - n_ok - n_ro
    print(f"\n== {n_ok} OK, {n_ro} rows-only, {n_bad} failing of {len(results)}")
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
