"""Local driver-simulation: run each __spark_entry__ query on Spark
and its oracle SQL on DuckDB, compare row count + column names +
order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def canon(df_pandas):
    """order-insensitive canonical form: sort columns by name, round
    floats, sort rows, hash"""
    import pandas as pd

    df = df_pandas.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
        # normalize ints across dialects
        if str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("Int64")
    rows = sorted(
        tuple(None if pd.isna(v) else v for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return rows


def main():
    import duckdb

    import __spark_entry__ as e
    from osmgraft.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    os_ = e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        t1 = time.time()
        if name not in os_:
            print(f"OK?  {name}: rows={len(sdf)} (no oracle, "
                  f"rows-only) [{t1-t0:.1f}s]")
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            fails.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
        if not problems:
            cs, co = canon(sdf), canon(odf)
            if cs != co:
                n_bad = sum(1 for x, y in zip(cs, co) if x != y)
                problems.append(f"values differ ({n_bad} rows)")
                for x, y in zip(cs, co):
                    if x != y:
                        problems.append(f"  spark={x!r}")
                        problems.append(f"  duck ={y!r}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fails.append(name)
        else:
            print(f"PASS {name}: rows={len(sdf)} [{t1-t0:.1f}s]")
    print()
    print("FAILURES:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    import pandas as pd  # noqa: F401

    sys.exit(main())
