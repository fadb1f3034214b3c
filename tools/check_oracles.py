"""Local driver-simulation: run each __spark_entry__ query on Spark
and its oracle SQL on DuckDB, compare row count + column names +
order-insensitive value hash. Usage:

    python tools/check_oracles.py [--json out.json] [sf_dir] [query ...]

--json writes a machine-readable summary (one entry per query:
status PASS/FAIL/ROWS_ONLY, row count, seconds, problems) so a full
sweep can be committed as a CORRECTNESS_r{N}_local.json artifact.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def dtype_kind(dt) -> str:
    """Collapse a pandas dtype to a strictness class. Integer widths are
    interchangeable (int32 vs int64 vs Int64), but int vs float vs bool vs
    decimal/object are NOT — the driver's value hash is dtype-sensitive
    (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64/object while Spark
    returns long), so the local sweep must flag exactly that class of
    drift instead of letting Python's 160 == 160.0 mask it."""
    s = str(dt)
    if s.startswith(("int", "Int", "uint", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if s.startswith("datetime"):
        return "datetime"
    return "object"


def canon(df_pandas):
    """order-insensitive canonical form: sort columns by name, round
    floats, sort rows; returns (rows, per-column dtype-kind signature)"""
    import pandas as pd

    df = df_pandas.copy()
    df = df[sorted(df.columns)]
    kinds = {}
    for c in df.columns:
        kinds[c] = dtype_kind(df[c].dtype)
        if kinds[c] == "object" and len(df):
            # decimal.Decimal / python int inside object columns: classify
            # by the first non-null value so HUGEINT-as-object is caught
            nn = df[c].dropna()
            if len(nn):
                v = nn.iloc[0]
                import decimal

                if isinstance(v, bool):
                    kinds[c] = "bool"
                elif isinstance(v, int):
                    kinds[c] = "int"
                elif isinstance(v, (float, decimal.Decimal)):
                    kinds[c] = "float" if isinstance(v, float) else "decimal"
        if kinds[c] == "float" and str(df[c].dtype).startswith(
            ("float", "Float")
        ):
            df[c] = df[c].astype("float64").round(9)
        if kinds[c] == "int":
            df[c] = df[c].astype("Int64")
    rows = sorted(
        tuple(None if pd.isna(v) else v for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return rows, kinds


def main():
    import duckdb

    import __spark_entry__ as e
    from osmgraft.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

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
            report[name] = {
                "status": "FAIL",
                "problems": [f"spark error {type(ex).__name__}: {ex}"],
            }
            continue
        t1 = time.time()
        if name not in os_:
            print(f"OK?  {name}: rows={len(sdf)} (no oracle, "
                  f"rows-only) [{t1-t0:.1f}s]")
            report[name] = {
                "status": "ROWS_ONLY",
                "rows": len(sdf),
                "secs": round(t1 - t0, 2),
            }
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            fails.append(name)
            report[name] = {
                "status": "FAIL",
                "problems": [f"duckdb error: {ex}"],
            }
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
        if not problems:
            (cs, ks), (co, ko) = canon(sdf), canon(odf)
            for c in ks:
                if ks[c] != ko.get(c):
                    problems.append(
                        f"dtype {c}: spark={ks[c]} vs duck={ko.get(c)}"
                    )
        if not problems:
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
            report[name] = {
                "status": "FAIL",
                "rows": len(sdf),
                "problems": problems[:3],
            }
        else:
            print(f"PASS {name}: rows={len(sdf)} [{t1-t0:.1f}s]")
            report[name] = {
                "status": "PASS",
                "rows": len(sdf),
                "secs": round(t1 - t0, 2),
            }
    print()
    print("FAILURES:", fails if fails else "none")
    if json_out:
        import json

        statuses = [r["status"] for r in report.values()]
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(report),
            "n_pass": statuses.count("PASS"),
            "n_rows_only": statuses.count("ROWS_ONLY"),
            "n_fail": statuses.count("FAIL"),
            "dtype_strict": True,
            "queries": report,
        }
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if fails else 0


if __name__ == "__main__":
    import pandas as pd  # noqa: F401

    sys.exit(main())
