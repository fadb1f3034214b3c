"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"flagship": sec, "q01_bbox_filter": sec, ...},
     "sf": ...}

The flagship measurement is the BASELINE.json metric: spatial-join +
tile-assignment throughput over a Common-Crawl-style pages table
(scan -> geocode UDF -> cell encode -> broadcast polygon PIP ->
region/subregion). The pages parquet is materialized once per size
under /tmp and reused, so the timed run measures the engine, not the
synthesizer. Extra top-level keys report docs/sec.

Each query is forced with a noop-format write (full computation, all
columns, no driver collect) — the closest local stand-in for a
cluster sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# flagship pages-table size: 200 pages per document row of the SF
PAGES_PER_DOC = int(os.environ.get("SPARK_GRAFT_PAGES_PER_DOC", "200"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _pages_path(n: int) -> str:
    return f"/tmp/osmgraft_bench_pages_{n}"


def main() -> None:
    from osmgraft.operators.flagship import flagship_assign
    from osmgraft.pages import synth_pages
    from osmgraft.session import get_spark
    from osmgraft.suite import QUERIES, load

    spark = get_spark(app_name="osmgraft-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = load(spark, SF_DIR, "documents").count()
    n_pages = n_docs * PAGES_PER_DOC
    path = _pages_path(n_pages)
    if not os.path.exists(path + "/_SUCCESS"):
        synth_pages(spark, n_pages, partitions=CPUS * 4).write.mode(
            "overwrite"
        ).parquet(path)

    timings: dict[str, float] = {}

    pages = spark.read.parquet(path)
    t0 = time.monotonic()
    _force(flagship_assign(pages))
    flagship_s = time.monotonic() - t0
    timings["flagship"] = round(flagship_s, 3)

    for name, fn in QUERIES.items():
        t0 = time.monotonic()
        _force(fn(spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": (
            "wall seconds: flagship spatial-join+tile-assignment "
            f"on {n_pages} pages + operator suite at sf{sf}"
        ),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "n_pages": n_pages,
        "cpus": CPUS,
        "flagship_docs_per_sec": round(n_pages / flagship_s, 1),
    }

    # scaling evidence (north_rule): same flagship job at N and 4N
    # parallelism on identical input; efficiency =
    # (T_N / T_4N) / 4. Sandbox stand-in for N vs 4N executors.
    small = max(CPUS // 4, 2)
    if os.environ.get("SPARK_GRAFT_SCALING", "1") == "1" and small < CPUS:
        spark.stop()
        spark_s = get_spark(
            app_name="osmgraft-bench-small", cores=small,
        )
        spark_s.sparkContext.setLogLevel("ERROR")
        pages_s = spark_s.read.parquet(path)
        _force(flagship_assign(pages_s))  # warm (JIT + broadcast)
        t0 = time.monotonic()
        _force(flagship_assign(pages_s))
        t_small = time.monotonic() - t0
        spark_s.stop()
        # re-time the big config warm for a fair ratio
        spark_b = get_spark(app_name="osmgraft-bench-big", cores=CPUS)
        spark_b.sparkContext.setLogLevel("ERROR")
        pages_b = spark_b.read.parquet(path)
        _force(flagship_assign(pages_b))
        t0 = time.monotonic()
        _force(flagship_assign(pages_b))
        t_big = time.monotonic() - t0
        ratio = CPUS / small
        out.update(
            {
                "scaling": {
                    "cpus_small": small,
                    "cpus_big": CPUS,
                    "flagship_small_s": round(t_small, 3),
                    "flagship_big_s": round(t_big, 3),
                    "docs_per_sec_small": round(n_pages / t_small, 1),
                    "docs_per_sec_big": round(n_pages / t_big, 1),
                    "scaling_efficiency": round(
                        (t_small / t_big) / ratio, 3
                    ),
                }
            }
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
