"""Synthesize an N-times scale-up of a testdata SF directory.

The driver ships sf0.001/0.01/0.1 only; the expensive-tail evidence
(VERDICT r3 task 2) needs a ~sf1 point. This builds one
deterministically from sf0.1 itself: every fact table is replicated
``factor`` times with per-domain key offsets (stride = max id + 1 of
the owning table) so foreign keys stay consistent and join
cardinalities scale linearly, exactly as a larger TPC-H SF would.

Two decorrelation steps keep similarity workloads honest — naive
replication would make every document/vector appear ``factor`` times
verbatim, so LSH/ANN candidate pairs would grow factor^2 instead of
the linear growth a real corpus shows:

- ``documents.text``: replica 0 keeps the original text; replica
  i>0 applies a stride-``p_i`` index permutation to the word
  sequence (p_i an odd prime), which preserves the word/char
  distribution (lang-id, quality, token stats see the same corpus
  statistics) but destroys shingle/n-gram overlap with the original,
  so the duplicate RATE stays at the sf0.1 level. n_chars is
  recomputed from the permuted text to keep the column invariant.
- ``embeddings.embedding``: replica i rotates the 64-dim vector by
  7*i positions — norms and component distributions are preserved,
  cosine similarity to the original is destroyed, so ANN bucket
  occupancies scale linearly.

Dimension tables (region, nation) are copied once — dimensions don't
grow with fact volume.

Usage:
    python tools/synth_scale.py [src_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# key column -> id-domain owner (table, column); stride per domain is
# 1 + max(owner column) so offset replicas never collide
DOMAINS = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "ev": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

TABLE_KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "ev", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

COPY_ONCE = ("region", "nation")

_PERM_PRIMES = [0, 3, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]


def _strides(spark, src_dir: str) -> dict[str, int]:
    out = {}
    for dom, (table, col) in DOMAINS.items():
        mx = (
            spark.read.parquet(f"{src_dir}/{table}.parquet")
            .agg(F.max(col))
            .first()[0]
        )
        out[dom] = int(mx) + 1
    return out


def _replicate(df, factor: int):
    """Cross-join with the replica index; offsets/decorrelation are
    applied by the caller via the `_rep` column."""
    reps = df.sparkSession.range(factor).withColumnRenamed("id", "_rep")
    return df.crossJoin(F.broadcast(reps))


def synth_scaled(spark, src_dir: str, out_dir: str, factor: int) -> None:
    strides = _strides(spark, src_dir)
    os.makedirs(out_dir, exist_ok=True)

    for t in COPY_ONCE:
        spark.read.parquet(f"{src_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")

    for t, keys in TABLE_KEYS.items():
        df = spark.read.parquet(f"{src_dir}/{t}.parquet")
        cols = df.columns
        r = _replicate(df, factor)
        for col, dom in keys.items():
            r = r.withColumn(
                col, F.col(col) + F.col("_rep") * F.lit(strides[dom])
            )
        if t == "documents":
            # stride permutation of the word sequence per replica
            prime = F.element_at(
                F.array(*[F.lit(p) for p in _PERM_PRIMES]),
                (F.col("_rep") % len(_PERM_PRIMES)).cast("int") + 1,
            )
            words = F.split(F.col("text"), " ")
            n = F.size(words)
            permuted = F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), n - 1),
                    lambda j: F.element_at(
                        words, ((j * prime + F.col("_rep")) % n + 1).cast("int")
                    ),
                ),
            )
            r = r.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(permuted),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if t == "embeddings":
            dim = 64
            k = (F.col("_rep") * 7 % dim).cast("int")
            rotated = F.concat(
                F.slice(F.col("embedding"), k + 1, F.lit(dim) - k),
                F.slice(F.col("embedding"), 1, k),
            )
            r = r.withColumn(
                "embedding",
                F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                    rotated
                ),
            )
        n_parts = max(int(df.rdd.getNumPartitions()) * factor // 2, 4)
        r.select(*cols).repartition(n_parts).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


def main() -> None:
    from osmgraft.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/osmgraft_scaled_{factor}x"
    )
    spark = get_spark(app_name="osmgraft-synth-scale")
    spark.sparkContext.setLogLevel("ERROR")
    synth_scaled(spark, src, out, factor)
    print(out)


if __name__ == "__main__":
    main()
