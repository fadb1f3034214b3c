"""Multi-source merge semantics (SURVEY.md J3/J4/J6, U1-U3).

The reference merges N pre-sorted object streams with
last-file-wins duplicate suppression (oo__switch + tyid dedup,
osmconvert.c:9974-10050, 11124-11164), subtracts files (`--subtract`,
anti-join on id), and diffs two files into create/modify/delete
actions (osmconvert.c:11147-11215).

Spark realization: unionByName + window dedup; left_anti join;
full_outer join + struct compare. All shuffle on the merge key once;
AQE coalesces. At 100 TB the window dedup is a single hash shuffle
on (otype,id) — the same cost profile as the sort-merge the
reference forces on its inputs, but parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def union_dedup(
    files: list[DataFrame],
    key_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """J3: later files override earlier ones for equal keys
    (osmconvert.c:11158-11164); within a file, higher `order_cols`
    (e.g. version) wins (--merge-versions, osmconvert.c:11124-11137).
    """
    tagged = [
        df.withColumn("_file_idx", F.lit(i)) for i, df in enumerate(files)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    order = [F.col("_file_idx").desc()] + [
        F.col(c).desc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_file_idx")
    )


def subtract(base: DataFrame, minus: DataFrame,
             key_cols: list[str]) -> DataFrame:
    """J4/U2: objects present in `minus` are removed from `base`
    (`--subtract`, osmconvert.c:554-556, 11409). Exact anti-join —
    strictly better than the reference's lossy hash bitsets
    (osmconvert.c:412-416)."""
    return base.join(minus.select(*key_cols), on=key_cols,
                     how="left_anti")


def change_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    delete_col: str = "deleted",
) -> DataFrame:
    """C1/J7: apply a change file to a base snapshot (osmchange.c:
    1485-1659): change objects override base objects by key, and a
    change marked deleted removes the object (tombstone: id-only
    object, osmconvert.c:10990-10992). This is the batch equivalent
    of an Iceberg MERGE INTO (matched+delete / matched+update /
    not-matched+insert).

    One shuffle on the key (anti-join + union); the base side's
    untouched partitions stream through unchanged."""
    surviving = changes.filter(~F.col(delete_col)).drop(delete_col)
    untouched = base.join(
        changes.select(*key_cols), on=key_cols, how="left_anti"
    )
    return untouched.unionByName(surviving)


def diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """J6: full-outer compare -> action column create/modify/delete
    (--diff-contents field compare, osmconvert.c:10865-10976).
    Unchanged rows are suppressed like the reference's
    (tyid,version)-equal suppression (osmconvert.c:11147-11156)."""
    o = old.select(
        *key_cols, F.struct(*payload_cols).alias("_old")
    )
    n = new.select(
        *key_cols, F.struct(*payload_cols).alias("_new")
    )
    j = o.join(n, on=key_cols, how="full_outer")
    action = (
        F.when(F.col("_old").isNull(), F.lit("create"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(F.col("_old") != F.col("_new"), F.lit("modify"))
    )
    return (
        j.withColumn("action", action)
        .filter(F.col("action").isNotNull())
        .select(*key_cols, "action")
    )


def diff_changefile(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """J6 + C1 composed: the change rows that transform `old` into
    `new` — creates/modifies carry the NEW payload, deletes are
    tombstones (deleted=true, null payload). Feed the result to the
    .o5c/.osc writers (wire/) and the reference binary applying it
    to `old` reproduces `new` exactly
    (tests/test_wire_sinks.py::test_diff_changefile_roundtrip).

    compare_cols (default payload_cols) drive the change
    detection — pass canonicalized derivations for unorderable
    payload types (Spark cannot equality-compare structs holding
    maps; e.g. compare on array_sort(map_entries(tags)) cast to
    string while the payload keeps the map).

    One full-outer shuffle (the diff) + one key-join to pull the
    new payloads; unchanged rows never leave the diff."""
    d = diff(old, new, key_cols, compare_cols or payload_cols)
    upserts = (
        d.filter(F.col("action") != "delete")
        .select(*key_cols)
        .join(new, key_cols)
        .select(
            *key_cols, *payload_cols, F.lit(False).alias("deleted")
        )
    )
    deletes = d.filter(F.col("action") == "delete").select(
        *key_cols,
        *[
            F.lit(None).cast(new.schema[c].dataType).alias(c)
            for c in payload_cols
        ],
        F.lit(True).alias("deleted"),
    )
    return upserts.unionByName(deletes)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Temporal as-of join (SURVEY J9): every left row picks the
    most recent right row with the same key and right_ts <=
    left_ts — events enriched with the dimension version in force
    at their time.

    The scale-correct plan is the tagged-union sweep, NOT a range
    join: union both sides ordered by (key, ts, side-tag with the
    right side first at equal ts for inclusive <=), then one keyed
    window carries the right payload forward with
    last(ignorenulls). ONE shuffle-sort total; a range join would
    explode per-key row pairs and a per-row subquery would not
    distribute. Left rows with no prior right version keep NULL
    payloads.

    Returns the left rows + the as-of payload columns."""
    from pyspark.sql import Window

    pay = F.struct(*[F.col(c) for c in payload_cols])
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            right.select(pay.alias("_p")).schema["_p"].dataType
        ).alias("_p"),
        F.struct(*[F.col(c) for c in lcols]).alias("_row"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        pay.alias("_p"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in lcols]).alias("_row")
            ).schema["_row"].dataType
        ).alias("_row"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = (
        l.unionByName(r)
        .withColumn("_pp", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
    )
    return swept.select(
        *[F.col(f"_row.{c}").alias(c) for c in lcols],
        *[F.col(f"_pp.{c}").alias(c) for c in payload_cols],
    )


def snapshot_read(
    changelog: DataFrame,
    as_of: int,
    id_col: str = "doc_id",
    ver_col: str = "ver",
    del_col: str = "deleted",
) -> DataFrame:
    """MVCC time-travel read: reconstruct the table state AS OF a
    version number from an append-only changelog of upserts and
    tombstones — the snapshot-isolation read every versioned table
    format exposes (Iceberg/Delta snapshot reads; public MVCC
    semantics). Each id's visible row is its LAST change with
    ver <= as_of (ties broken by the highest ver, deterministic);
    an id whose last visible change is a tombstone is absent.
    Ties WITHIN a version (one commit touching an id twice) break
    deterministically with the tombstone winning — (ver, deleted)
    DESC — so reruns and repartitionings agree; changelogs with
    two same-version upserts carrying different payloads are
    outside the contract (add a sequence column upstream).

    Complements change_apply/diff above: those move between two
    adjacent snapshots; this jumps to ANY recorded version in one
    pass. With the changelog partition-pruned on ver (the layout
    manifest.py's commit log already produces), the scan touches
    only files with min(ver) <= as_of.

    Shape: one filter (pushed to the scan), one per-id window
    row_number over that id's own history (state bounded by
    versions-per-id), one tombstone filter. No joins."""
    w = Window.partitionBy(id_col).orderBy(
        F.col(ver_col).desc(), F.col(del_col).desc()
    )
    return (
        changelog.where(F.col(ver_col) <= F.lit(int(as_of)))
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (~F.col(del_col)))
        .drop("_rn", del_col)
    )
