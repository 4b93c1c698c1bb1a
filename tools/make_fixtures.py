"""Generate a larger scale-factor fixture set by key-offset replication.

The driver materializes deterministic fixtures up to sf0.1
(`TESTDATA.md`, read-only). The round-6 scale step-up needs an sf1 set
to catch quadratic tails the small fixtures hide (basket pair
explosions, LSH bucket caps, substring-span volume). Rather than invent
a new generator whose distributions would NOT match the driver's, this
derives sf1 from sf0.1 by replicating every scaling table K times with
key-space offsets:

- keys (`*_key`, `*_id`) shift by `copy * stride` (stride = 10^ceil
  above the max key), so PK uniqueness and every FK relationship hold
  per copy by construction;
- `region`/`nation` are fixed-cardinality dimensions and copy through
  unchanged (as in TPC-H at every SF);
- `documents.text` gets a per-copy suffix token so replication does not
  manufacture cross-copy exact/near duplicates (within-copy duplicate
  structure — what the dedup operators measure — is preserved exactly);
- `embeddings.embedding` gets a per-copy SIGNED PERMUTATION (cyclic
  shift + deterministic sign flips — an orthogonal transform): all
  within-copy cosines are preserved EXACTLY (norms, cluster geometry,
  labels stay meaningful) while cross-copy cosines scramble toward 0,
  preserving the corpus premise the near-dup oracles rely on ("no true
  near-dups above threshold") that verbatim replication would break —
  the sf1 sweep caught exactly that (q45/q81 planted-twin failures);
- values/dates/embeddings copy through verbatim, so per-copy
  distributions are IDENTICAL to the driver's sf0.1.

Deterministic (pure column arithmetic, no RNG). Usage:

    python tools/make_fixtures.py [out_dir] [copies]

Defaults: out_dir=/root/repo/.sf1, copies=10 (≈6M lineitem rows).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Columns that live in each table's own key space or reference another
#: scaling table's. region/nation keys are NOT offset anywhere.
KEY_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _stride(df: DataFrame, cols: list[str]) -> int:
    mx = df.select(
        F.greatest(*[F.max(c) for c in cols]).alias("m")
        if len(cols) > 1
        else F.max(cols[0]).alias("m")
    ).first()["m"]
    s = 10
    while s <= int(mx):
        s *= 10
    return s


def _write_single_file(df: DataFrame, out: str, t: str) -> None:
    """Write as ONE parquet FILE named {t}.parquet (the driver's fixture
    layout, which the DuckDB oracle opens directly)."""
    import glob
    import shutil

    tmp = f"{out}/.tmp-{t}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dest = f"{out}/{t}.parquet"
    if os.path.exists(dest):
        os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def replicate(spark, src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        keys = KEY_COLS.get(t)
        if not keys:
            _write_single_file(df, out, t)
            print(f"{t}: copied unchanged")
            continue
        stride = _stride(df, keys)
        orig_type = dict(df.dtypes)
        parts = []
        for i in range(copies):
            c = df
            for k in keys:
                c = c.withColumn(
                    k, (F.col(k) + F.lit(i * stride)).cast(orig_type[k])
                )
            if t == "documents":
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and i > 0:
                dim = len(df.select("embedding").first()["embedding"])
                shift = (7 * i) % dim
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(sequence(0, {dim - 1}), idx -> "
                        f"CAST((CASE WHEN pmod(xxhash64({i}L, idx), 2) = 0 "
                        f"THEN 1.0 ELSE -1.0 END) * "
                        f"element_at(embedding, pmod(idx + {shift}, {dim}) + 1)"
                        " AS FLOAT))"
                    ),
                )
            parts.append(c)
        u = parts[0]
        for c in parts[1:]:
            u = u.unionByName(c)
        _write_single_file(u, out, t)
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {copies} copies, stride {stride}, rows {n}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from spark_s3_shuffle_spark.session import get_spark

    spark = get_spark("make-fixtures", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, SRC, out, copies)
    print("done:", out)
