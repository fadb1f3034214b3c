"""spark-submit entry point for the flagship pipeline (north_rule:
ships as `spark-submit --py-files osmgraft.zip` and runs unchanged
at any cluster size — master/executors come from submit args, the
job only declares the plan).

    spark-submit --master <...> --py-files dist/osmgraft.zip \\
        tools/submit_flagship.py <pages_parquet> <out_dir> \\
        [n_buckets] [buckets_per_commit]

Writes the assignment output through the checkpoint manifest; a
killed job resumes from the last committed bucket group on rerun.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    pages_path = sys.argv[1]
    out_dir = sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    per_commit = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    spark = (
        SparkSession.builder.appName("osmgraft-flagship")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from osmgraft.operators.flagship import flagship_resumable

    pages = spark.read.parquet(pages_path)
    commits = flagship_resumable(
        pages,
        out_dir,
        n_buckets=n_buckets,
        buckets_per_commit=per_commit,
        input_lineage=f"parquet:{pages_path}",
    )
    print(f"flagship: {commits} commit group(s) this run")
    spark.stop()


if __name__ == "__main__":
    main()
