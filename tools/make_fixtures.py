"""Generate a larger scale-factor fixture set by key-offset replication.

The driver materializes deterministic fixtures up to sf0.1
(`TESTDATA.md`, read-only). The round-6 scale step-up needs an sf1 set
to catch quadratic tails the small fixtures hide (basket pair
explosions, LSH bucket caps, substring-span volume). Rather than invent
a new generator whose distributions would NOT match the driver's, this
derives sf1 from sf0.1 by replicating every scaling table K times with
key-space offsets:

- keys (`*_key`, `*_id`) shift by `copy * stride`, where the stride is
  computed PER KEY SPACE (custkey, orderkey, partkey, suppkey, ...) as
  10^ceil above the max of that key across EVERY table that carries it
  — PK column and FK columns shift by the SAME offset, so PK uniqueness
  and every FK relationship hold per copy by construction. (A per-table
  stride would shift orders.o_custkey by a different offset than
  customer.c_custkey, dangling every copy-i>0 FK — the round-6 bug.);
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

#: Key SPACES: every (table, column) pair sharing a space gets the SAME
#: per-copy offset, computed from the max of the key over ALL its
#: carriers — the invariant that keeps FKs intact per copy.
#: region/nation keys are fixed-cardinality and NOT offset anywhere.
#: events.user_id is its own space (1..~1500, never joined to custkey).
KEY_SPACES: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}

#: Derived view: table -> [(col, space), ...]
KEY_COLS: dict[str, list[tuple[str, str]]] = {}
for _space, _carriers in KEY_SPACES.items():
    for _t, _c in _carriers:
        KEY_COLS.setdefault(_t, []).append((_c, _space))


def _space_strides(spark, src: str) -> dict[str, int]:
    """One stride per key space: 10^ceil above the max of the key over
    every table that carries it (PK and FK columns alike)."""
    strides: dict[str, int] = {}
    cache: dict[str, DataFrame] = {}
    for space, carriers in KEY_SPACES.items():
        mx = 0
        for t, c in carriers:
            if t not in cache:
                cache[t] = spark.read.parquet(f"{src}/{t}.parquet")
            v = cache[t].select(F.max(c).alias("m")).first()["m"]
            mx = max(mx, int(v))
        s = 10
        while s <= mx:
            s *= 10
        strides[space] = s
    return strides


def _write_single_file(df: DataFrame, out: str, t: str) -> None:
    """Write as ONE parquet FILE named {t}.parquet (the driver's fixture
    layout, which the DuckDB oracle opens directly).

    Row groups are bounded at 16 MB: Spark's byte-range parquet splits
    parallelize only across ROW GROUPS, so a one-row-group file reads
    serially no matter how many cores scan it (measured on the round-8
    .sf10 fixture: embeddings' 200k rows all landed in 1 of 13 scan
    partitions; documents/embeddings had 1 row group, orders/events 2).
    The bound keeps single-FILE fixtures many-way parallel — the layout
    a real multi-file corpus gets for free."""
    import glob
    import shutil

    tmp = f"{out}/.tmp-{t}"
    df.coalesce(1).write.mode("overwrite").option(
        "parquet.block.size", 16 * 1024 * 1024
    ).parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dest = f"{out}/{t}.parquet"
    if os.path.exists(dest):
        os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def replicate(spark, src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    strides = _space_strides(spark, src)
    print("space strides:", strides)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        keys = KEY_COLS.get(t)
        if not keys:
            _write_single_file(df, out, t)
            print(f"{t}: copied unchanged")
            continue
        orig_type = dict(df.dtypes)
        parts = []
        for i in range(copies):
            c = df
            for k, space in keys:
                c = c.withColumn(
                    k,
                    (F.col(k) + F.lit(i * strides[space])).cast(orig_type[k]),
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
        print(f"{t}: {copies} copies, rows {n}")


def verify_fks(spark, out: str) -> dict[str, int]:
    """Count dangling FK rows per relationship — must all be 0."""
    rels = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
    bad = {}
    for ft, fk, pt, pk in rels:
        f = spark.read.parquet(f"{out}/{ft}.parquet").select(fk)
        p = spark.read.parquet(f"{out}/{pt}.parquet").select(pk)
        n = f.join(p, f[fk] == p[pk], "left_anti").count()
        bad[f"{ft}.{fk}->{pt}.{pk}"] = n
    return bad


if __name__ == "__main__":
    from spark_s3_shuffle_spark.session import get_spark

    spark = get_spark("make-fixtures", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1 and sys.argv[1] == "--tpcds":
        # Materialize the derived TPC-DS snowflake (sources/tpcds.py) as
        # parquet: make_fixtures.py --tpcds [src_sf_dir] [out_dir]
        from spark_s3_shuffle_spark.sources.tpcds import materialize

        src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.tpcds"
        counts = materialize(spark, src, out)
        for t, n in counts.items():
            print(f"{t}: {n} rows")
        print("done:", out)
        sys.exit(0)
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    replicate(spark, SRC, out, copies)
    dangling = verify_fks(spark, out)
    print("dangling FK rows:", dangling)
    assert all(v == 0 for v in dangling.values()), dangling
    print("done:", out)
