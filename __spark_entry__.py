"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship spatial-join + tile-assignment on pages
                 synthesized deterministically from sf0.001 doc ids.
queries()     -> SURVEY.md §2 operator suite (osmgraft.suite).
oracle_sql()  -> DuckDB-equivalent SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (BASELINE.json): pages -> geocode -> cell
    encode -> broadcast polygon PIP -> region/subregion + tile."""
    from osmgraft.operators.flagship import flagship_assign
    from osmgraft.pages import synth_pages
    from osmgraft.suite import load

    n = load(spark, SF0001, "documents").count()
    pages = synth_pages(spark, max(int(n), 100))
    return flagship_assign(pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osmgraft.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osmgraft.suite import oracle_sqls

    return oracle_sqls()
