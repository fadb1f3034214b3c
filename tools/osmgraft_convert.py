"""CLI wrapper: python tools/osmgraft_convert.py <args> — see
osmgraft/cli.py for the accepted osmconvert/osmfilter-style
arguments."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from osmgraft.cli import convert
    from osmgraft.session import get_spark

    spark = get_spark(
        app_name="osmgraft-convert",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "4")),
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    convert(spark, sys.argv[1:])


if __name__ == "__main__":
    main()
