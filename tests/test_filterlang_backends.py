"""Backend equivalence: for random tag maps and a battery of filter
expressions, the Spark Column backend and the DuckDB SQL backend must
agree with the scalar reference-exact evaluator on every row."""

from __future__ import annotations

import random

import duckdb
import pytest

from osmgraft.filterlang import eval_filter, keep_column, keep_sql, parse

KEYS = ["place", "population", "name", "highway", "width", "note"]

PLACE = ["city", "town", "village", "hamlet", "suburb"]
NUMISH = [
    "0", "00", "7", "007", "7x", "x7", "-5", "-0", "0.5", ".5",
    "0.50", "1.50", "10000", "010000", "9999", "10000.5", "1000000",
    "0.0", "", "abc", "12.34.56",
]
NAMES = ["Hamburg", "Brandenburg", "Oldham", "New York", "x", ""]

EXPRS = [
    "place=city",
    "place=city or ( place=town and population>=10000 )",
    "population>999999",
    "population<500",
    "population<=0.5",
    "population>0",
    "place!=city",
    "population!=0",
    "population=10000",
    "population=0.0",
    "name=*burg",
    "name=Ham* or name=Old*",
    "all place population>0",
    "place=city =town",
    "p*e=city",
    "*tion>500",
    "note",
    "note=",
    "and place!=city name!=x",
    "( place=city or place=town ) and ( population>100 or note )",
]


def _random_tags(rng: random.Random) -> dict[str, str]:
    tags = {}
    if rng.random() < 0.8:
        tags["place"] = rng.choice(PLACE)
    if rng.random() < 0.8:
        tags["population"] = rng.choice(NUMISH)
    if rng.random() < 0.6:
        tags["name"] = rng.choice(NAMES)
    if rng.random() < 0.3:
        tags["highway"] = rng.choice(["primary", "residential"])
    if rng.random() < 0.3:
        tags["width"] = rng.choice(NUMISH)
    if rng.random() < 0.2:
        tags["note"] = rng.choice(["", "yes"])
    return tags


@pytest.fixture(scope="module")
def rows():
    rng = random.Random(20240816)
    return [_random_tags(rng) for _ in range(400)]


def test_sql_backend_matches_scalar(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (rid INTEGER, "
        + ", ".join(f'"{k}" VARCHAR' for k in KEYS)
        + ")"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?, ?, ?, ?)",
        [
            [i] + [tags.get(k) for k in KEYS]
            for i, tags in enumerate(rows)
        ],
    )
    for expr in EXPRS:
        tree = parse(expr)
        sql = keep_sql(tree, lambda k: f'"{k}"', KEYS)
        got = {
            rid
            for (rid,) in con.execute(
                f"SELECT rid FROM t WHERE {sql}"
            ).fetchall()
        }
        want = {
            i for i, tags in enumerate(rows) if eval_filter(tags, tree)
        }
        assert got == want, (
            f"{expr!r}: sql-only={sorted(got - want)[:5]} "
            f"scalar-only={sorted(want - got)[:5]}\nSQL: {sql}"
        )


def test_spark_backend_matches_scalar(rows, spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rid", IntegerType()),
            StructField("tags", MapType(StringType(), StringType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, tags) for i, tags in enumerate(rows)], schema
    )
    # evaluate all expressions in ONE job
    cols = [
        keep_column(F.col("tags"), parse(e)).alias(f"e{i}")
        for i, e in enumerate(EXPRS)
    ]
    got_rows = df.select("rid", *cols).collect()
    for i, expr in enumerate(EXPRS):
        tree = parse(expr)
        got = {r["rid"] for r in got_rows if r[f"e{i}"]}
        want = {
            j for j, tags in enumerate(rows) if eval_filter(tags, tree)
        }
        assert got == want, (
            f"{expr!r}: spark-only={sorted(got - want)[:5]} "
            f"scalar-only={sorted(want - got)[:5]}"
        )


def test_drop_mode_backends(rows, spark):
    from pyspark.sql import functions as F

    expr = "place!=city or population!=5"
    tree = parse(expr)
    want = {
        i
        for i, tags in enumerate(rows)
        if eval_filter(tags, tree, mode="drop")
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (rid INTEGER, "
        + ", ".join(f'"{k}" VARCHAR' for k in KEYS)
        + ")"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?, ?, ?, ?)",
        [
            [i] + [tags.get(k) for k in KEYS]
            for i, tags in enumerate(rows)
        ],
    )
    sql = keep_sql(tree, lambda k: f'"{k}"', KEYS, mode="drop")
    got = {
        rid
        for (rid,) in con.execute(
            f"SELECT rid FROM t WHERE {sql}"
        ).fetchall()
    }
    assert got == want
