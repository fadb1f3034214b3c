"""P7: author/version column drops and fakes.

Reimplements the column semantics of --drop-author /
--drop-version / --fake-author / --fake-version
(osmconvert.c:8232-8257, flag parse 12733-12799) over an authored
object table (version, ts, changeset, uid, user):

  - fake (author|version): version=1, ts=1 (one second past
    1970), changeset=1, uid absent, user absent — "as short as
    possible" (osmconvert.c:8233-8234);
  - drop_version: version -> 0, which in the wire formats means
    "no metadata at all", so every author column goes absent;
  - drop_author: ts -> 0 = absent, and the changeset/user columns
    cascade away with it (the o5m writer stops after a zero
    timestamp, osmconvert.c:8240-8242);
  - pass-through: a zero/empty user identification is normalized
    to absent (stw_write("", ""), osmconvert.c:8245-8247).

Absence is encoded the way the reference encodes it: 0 for the
numeric columns, '' for user (hisver==0 / histime==0 / hisuid==0
ARE the C absence markers; no SQL NULLs, so the driver's
order-insensitive hash comparator sorts rows cleanly).

Pure Catalyst projections — a zero-shuffle map stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NULL = F.lit(0).cast("long")
_NULLS = F.lit("")


def author_columns(
    df: DataFrame,
    drop_author: bool = False,
    drop_version: bool = False,
    fake_author: bool = False,
    fake_version: bool = False,
) -> DataFrame:
    """df must carry (version, ts, changeset, uid, user); returns
    the same DataFrame with those five columns rewritten."""
    if fake_author or fake_version:
        return df.withColumns(
            {
                "version": F.lit(1).cast("long"),
                "ts": F.lit(1).cast("long"),
                "changeset": F.lit(1).cast("long"),
                "uid": _NULL,
                "user": _NULLS,
            }
        )
    if drop_version:
        return df.withColumns(
            {
                "version": F.lit(0).cast("long"),
                "ts": _NULL,
                "changeset": _NULL,
                "uid": _NULL,
                "user": _NULLS,
            }
        )
    no_uid = (
        F.col("uid").isNull()
        | (F.col("uid") == 0)
        | F.col("user").isNull()
        | (F.col("user") == "")
    )
    if drop_author:
        return df.withColumns(
            {
                "ts": _NULL,
                "changeset": _NULL,
                "uid": _NULL,
                "user": _NULLS,
            }
        )
    return df.withColumns(
        {
            "uid": F.when(no_uid, _NULL).otherwise(F.col("uid")),
            "user": F.when(no_uid, _NULLS).otherwise(F.col("user")),
        }
    )
