"""Local replica of the driver's oracle gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
(column names sorted), and an order-insensitive value hash.

Usage: python scripts/oracle_check.py [query ...]   (default: all)
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype == object:
            d[c] = d[c].astype(str)
    rows = sorted(tuple(f"{v:.9g}" if isinstance(v, float) else str(v)
                        for v in row) for row in d.itertuples(index=False))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(rows), cols, h


def main():
    import __spark_entry__ as E
    from s2geography_spark.session import get_spark
    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs = E.queries()
    oracles = E.oracle_sql()
    want = sys.argv[1:] or list(qs)
    fails = []
    for name in want:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} SPARK ERROR: {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} no_oracle rows={len(sdf)}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ORACLE ERROR: {e}")
            fails.append(name)
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        print(f"{name:24s} rows {sn}/{on} cols_match={sc == oc} "
              f"hash_match={sh == oh}")
        if not ok:
            fails.append(name)
            if sc != oc:
                print(f"  spark cols: {sc}\n  oracle cols: {oc}")
            elif sn == on:
                merged = sdf.sort_values(sorted(sdf.columns)).reset_index(drop=True)
                omerged = odf[sorted(odf.columns)].sort_values(
                    sorted(odf.columns)).reset_index(drop=True)
                diff = (merged[sorted(sdf.columns)].astype(str)
                        != omerged.astype(str)).any(axis=1)
                print("  first diffs:")
                print(pd.concat([merged[diff].head(3),
                                 omerged[diff].head(3)], axis=1))
    spark.stop()
    print("FAILS:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
