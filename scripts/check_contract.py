"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB — row count,
sorted column names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif str(s.dtype).startswith("float"):
            df[c] = s.round(6).map(lambda v: f"{v:.6f}")
        elif "int" in str(s.dtype).lower():
            df[c] = s.astype("Int64").astype(str)
        else:
            df[c] = s.astype(str)
    rows = sorted(map(tuple, df.itertuples(index=False)))
    h = hashlib.md5(repr(rows).encode()).hexdigest()[:12]
    return len(rows), list(df.columns), h


def main(only: list[str]) -> int:
    import __spark_entry__ as e
    from commoncrawl_spark.session import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, SF).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {str(ex)[:300]}")
            fails += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: {len(got)} rows [rows-only] "
                  f"({time.monotonic() - t0:.1f}s)")
            if len(got) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {str(ex)[:300]}")
            fails += 1
            continue
        ng, cg, hg = norm(got)
        nw, cw, hw = norm(want)
        status = "OK" if (ng, cg, hg) == (nw, cw, hw) else "MISMATCH"
        if status != "OK":
            fails += 1
            print(f"FAIL {name}: rows {ng}/{nw} cols {cg}/{cw} hash {hg}/{hw}")
            if cg == cw and ng:
                g = got[sorted(got.columns)]
                w = want[sorted(want.columns)]
                gs = set(map(tuple, g.astype(str).itertuples(index=False)))
                ws = set(map(tuple, w.astype(str).itertuples(index=False)))
                for r in list(gs - ws)[:3]:
                    print("   spark-only:", r)
                for r in list(ws - gs)[:3]:
                    print("   oracle-only:", r)
        else:
            print(f"OK   {name}: {ng} rows ({time.monotonic() - t0:.1f}s)")
    print("entry:", "skipped" if only else e.entry(spark).count(), "| fails:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
