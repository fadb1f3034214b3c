"""K4 CSV sink with reference-exact separator-collision handling
(csv_ osmconvert.c:3165-3351).

The reference does NOT quote: any value character equal to the
separator's first char or a newline is REPLACED — by '_' when the
separator starts with a space, else by ' ' (osmconvert.c:3273-3277,
3314-3316). Missing tags produce empty fields; rows where no
requested column matched are suppressed (csv_write early-return,
osmconvert.c:3306-3307).

We serialize lines ourselves (concat_ws + write.text) instead of
df.write.csv because Spark's CSV writer quotes/escapes — a different
wire format. Everything is Catalyst (regexp_replace chains inside
codegen).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F


def csv_replacement(sep: str) -> str:
    return "_" if sep[:1] == " " else " "


def csv_sanitize(col: Column, sep: str) -> Column:
    """Replace separator-char and newline occurrences inside a value
    (reference semantics: per-character replacement, no quoting)."""
    rep = csv_replacement(sep)
    cls = "[" + re.escape(sep[0]) + "\\n\\r]"
    return F.regexp_replace(col, cls, rep)


def csv_lines(
    df: DataFrame,
    columns: list[str],
    sep: str = "\t",
    headline: bool = False,
) -> DataFrame:
    """Serialize selected columns into reference-format CSV lines
    (single `value` string column, ready for df.write.text).
    Rows with ALL requested fields empty/null are suppressed."""
    fields = [
        csv_sanitize(F.coalesce(F.col(c).cast("string"), F.lit("")),
                     sep).alias(c)
        for c in columns
    ]
    proj = df.select(*fields)
    any_val = None
    for c in columns:
        cond = F.col(c) != ""
        any_val = cond if any_val is None else (any_val | cond)
    out = proj.filter(any_val).select(
        F.concat_ws(sep, *[F.col(c) for c in columns]).alias("value")
    )
    if headline:
        head = df.sparkSession.createDataFrame(
            [(sep.join(columns),)], "value string"
        )
        out = head.unionByName(out)
    return out
