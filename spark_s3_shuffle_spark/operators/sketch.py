"""Mergeable-sketch operators expressed as pure DataFrame algebra.

The reference exposes no sketch surface (its TPC-DS queries use exact
aggregation; SURVEY B20 covers Spark's built-in `approx_count_distinct`),
but a 100 TB pipeline lives on sketches: this module implements
HyperLogLog distinct counting from first principles as relational
algebra — hash → register/rank projection (one scan, codegen), per-
register MAX (a ≤m-row shuffle with map-side partial max), one tiny
final fold — so the estimator is *portable and deterministic*: built on
the same md5 both engines share, with the harmonic mean computed in
EXACT integer arithmetic (terms scaled by 2^57 so the sum is an integer,
immune to float summation order). That is what lets a DuckDB oracle
replay the ESTIMATE bit-for-bit — something `approx_count_distinct`
(engine-private HLL++ with xxhash) can never offer.

Scale shape: the shuffle after the map-side combine is at most
m = 2^b rows per upstream partition regardless of input size; the final
fold touches m rows. Flajolet et al.'s standard bias constant and the
small-range linear-counting correction are applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Width of the rank domain: md5 gives 128 bits; we spend 2 hex chars
#: (8 bits) on the register index and 14 hex chars (56 bits) on the rank
#: word, so rho ranges over [1, 57].
_RANK_BITS = 56


def hll_distinct(
    df: DataFrame,
    col: str,
    b: int = 8,
    salt: str = "",
    out: str = "hll_estimate",
) -> DataFrame:
    """HyperLogLog distinct count of ``col`` with ``m = 2^b`` registers
    (b <= 8 keeps the register index inside the first hex byte; standard
    error ~= 1.04/sqrt(m), ~6.5% at b=8).

    Returns a 1-row frame ``(out DOUBLE, registers_hit BIGINT)``. The
    estimate is deterministic across engines, partitionings, and reruns:
    md5-derived registers/ranks, an exact integer harmonic sum, and a
    final division/log evaluated on identical doubles.
    """
    regs = hll_registers(df, col, b=b, salt=salt)
    return hll_estimate_from_registers(regs, b=b, out=out)


def hll_registers(
    df: DataFrame, col: str, b: int = 8, salt: str = ""
) -> DataFrame:
    """The sketch STATE: a ``(reg, maxrho)`` frame of at most 2^b rows —
    persistable as a summary table and mergeable: the HLL of two corpora
    is ``union → groupBy(reg).max(maxrho)`` of their register frames, so
    an append-only corpus maintains its sketch incrementally (register
    merge over the delta) without ever rescanning history."""
    if not 1 <= b <= 8:
        raise ValueError("b must be in [1, 8]")
    m = 1 << b
    h = F.md5(F.concat(F.lit(salt), F.col(col).cast("string")))
    # register: the first hash byte mod m; rank word: next 56 bits
    reg = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % m).alias("reg")
    w = F.conv(F.substring(h, 3, 14), 16, 10).cast("long")
    rho = (
        F.when(w > 0, F.lit(_RANK_BITS + 1) - F.length(F.bin(w)))
        .otherwise(F.lit(_RANK_BITS + 1))
        .cast("int")
        .alias("rho")
    )
    return df.select(reg, rho).groupBy("reg").agg(F.max("rho").alias("maxrho"))


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge HLL register frames (same b/salt): per-register MAX over the
    union — the lossless sketch combine."""
    merged = register_frames[0]
    for rf in register_frames[1:]:
        merged = merged.unionByName(rf)
    return merged.groupBy("reg").agg(F.max("maxrho").alias("maxrho"))


def hll_estimate_from_registers(
    regs: DataFrame, b: int = 8, out: str = "hll_estimate"
) -> DataFrame:
    """Fold a register frame into the 1-row estimate (see hll_distinct)."""
    m = 1 << b
    # harmonic sum scaled by 2^57: each register contributes
    # 2^(57 - maxrho) (an exact long); absent registers contribute 2^57.
    # Summed as DECIMAL so the total is exact integer arithmetic — no
    # float summation order anywhere.
    # (F.shiftleft only takes a literal bit count, so the per-row shift
    # goes through expr)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RANK_BITS + 1} - maxrho)")
    packed = regs.agg(
        F.sum(term.cast("decimal(28,0)")).alias("_scaled"),
        F.count(F.lit(1)).alias("_hit"),
    )
    absent = (F.lit(m) - F.col("_hit")).cast("decimal(28,0)")
    scaled_total = (
        F.col("_scaled") + absent * F.lit(1 << (_RANK_BITS + 1)).cast("decimal(28,0)")
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    numer = float(alpha * m * m * (1 << (_RANK_BITS + 1)))
    est = F.lit(numer) / scaled_total.cast("double")
    zeros = (F.lit(m) - F.col("_hit")).cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    corrected = F.when((est <= 2.5 * m) & (zeros > 0), linear).otherwise(est)
    return packed.select(
        F.round(corrected, 1).alias(out),
        F.col("_hit").cast("long").alias("registers_hit"),
    )


def cms_build(
    df: DataFrame,
    col: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of ``col``: a ``(row, bucket, cnt)`` table of
    ``d`` hash rows x ``w`` counters (md5 with per-row salts — portable
    across engines). Built in ONE scan: each input row explodes into its
    d (row, bucket) cells, then a bounded aggregate — the sketch is at
    most d*w rows no matter the input size, and the per-cell counts are
    exact integers, so the whole structure (and every estimate read from
    it) is deterministic and oracle-replayable. Mergeable by construction:
    sketches of two corpora union + re-aggregate into the sketch of the
    concatenation."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{salt}{i}"), F.col(col).cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % w
                ).cast("int").alias("bucket"),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for every key in ``keys[col]`` from a
    ``cms_build`` sketch: min over the key's d counters (the classic
    one-sided estimator — never under-counts, over-counts by at most
    eps*N with prob 1-delta, eps=e/w, delta=e^-d). The probe explodes
    each key into its d cells and joins the d*w-row sketch (broadcast in
    practice), so estimating any number of keys is one bounded join —
    no rescan of the sketched corpus."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{salt}{i}"), F.col(col).cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % w
                ).cast("int").alias("bucket"),
            )
            for i in range(d)
        ]
    )
    probe = keys.select(F.col(col), F.explode(cells).alias("c")).select(
        col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )
    return (
        probe.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def bottomk_sample(
    df: DataFrame,
    key_cols: list[str],
    keep_cols: list[str],
    k: int = 2048,
    salt: str = "bk",
) -> DataFrame:
    """Bottom-k-by-hash row sample: the ``k`` rows whose
    ``md5(salt|key_cols)`` is smallest — a uniform sample WITHOUT
    replacement whose membership is a pure function of row identity.
    ``key_cols`` must identify a row (e.g. the table's primary key);
    hashing only the value column would collapse duplicates and bias any
    downstream estimator toward distinct-value statistics.

    Scale shape: ``orderBy(hash).limit(k)`` plans
    ``TakeOrderedAndProject`` — each task keeps its local bottom-k, so
    the exchange carries at most ``k`` rows per upstream partition and
    the final heap-merge touches ``k * partitions`` rows, at ANY input
    size. Mergeable: the bottom-k of a union is the bottom-k of the
    concatenated per-part bottom-k frames (``bottomk_merge``), so an
    append-only corpus maintains its sample incrementally — the
    summary-table pattern applied to sampling.
    """
    h = F.md5(
        F.concat_ws(
            "|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols]
        )
    ).alias("_bk_hash")
    return df.select(h, *keep_cols).orderBy("_bk_hash").limit(k)


def bottomk_merge(k: int, *samples: DataFrame) -> DataFrame:
    """Merge bottom-k sample frames (same salt/key space): the global
    bottom-k of the union — the lossless sample combine."""
    merged = samples[0]
    for s in samples[1:]:
        merged = merged.unionByName(s)
    return merged.orderBy("_bk_hash").limit(k)


def bottomk_quantiles(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    qs: list[float],
    k: int = 2048,
    salt: str = "bk",
) -> DataFrame:
    """Quantile sketch over ``value_col``: exact quantiles of a bottom-k
    uniform sample, selected by DETERMINISTIC integer rank — sample rank
    ``1 + floor(q * (n-1))`` under ``(value, hash)`` order — so the
    estimate involves no interpolation arithmetic at all: it is one of
    the sampled values, bit-identical across engines, partitionings, and
    reruns (rank error is the classic O(sqrt(q(1-q)/k)) of a uniform
    sample; ~1% at k=2048, q=0.5).

    Unlike ``percentile_approx`` (engine-private Greenwald-Khanna state,
    merge-order-dependent) this sketch is portable: a DuckDB oracle
    replays the ESTIMATES bit-for-bit. The heavy lifting is the bounded
    ``TakeOrderedAndProject`` of ``bottomk_sample``; the quantile fold
    runs on <= k rows. Returns ``(q DOUBLE, {value_col})`` ordered by q.
    """
    from pyspark.sql import Window

    sample = bottomk_sample(df, key_cols, [value_col], k=k, salt=salt)
    w = Window.orderBy(F.col(value_col), F.col("_bk_hash"))
    ranked = sample.select(
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
    )
    probes = F.array(*[F.lit(float(q)) for q in qs])
    return (
        ranked.select(F.explode(probes).alias("q"), value_col, "_rn", "_n")
        .filter(
            F.col("_rn")
            == 1 + F.floor(F.col("q") * (F.col("_n") - 1)).cast("int")
        )
        .select("q", value_col)
        .orderBy("q")
    )


def hll_distinct_by_key(
    df: DataFrame,
    key_cols: list[str],
    col: str,
    b: int = 8,
    salt: str = "",
    out: str = "hll_estimate",
) -> DataFrame:
    """Per-GROUP HyperLogLog distinct counts — the reporting shape that
    actually runs on 100 TB ("distinct users per day/source"): one sketch
    of ``col`` per distinct ``key_cols`` tuple, same portable register
    algebra as :func:`hll_distinct`, same bit-exact oracle replay.

    Scale shape: the register aggregate shuffles at most ``2^b`` rows PER
    GROUP per upstream partition (map-side MAX combine), so the exchange
    is |groups| x m rows regardless of fact volume — compare exact
    ``countDistinct``, which shuffles every distinct (group, value) pair.
    The per-group fold then touches |groups| x m rows. Returns
    ``(*key_cols, out DOUBLE, registers_hit BIGINT)``.
    """
    regs = hll_registers_by_key(df, key_cols, col, b=b, salt=salt)
    return hll_estimate_from_registers_by_key(regs, key_cols, b=b, out=out)


def hll_registers_by_key(
    df: DataFrame,
    key_cols: list[str],
    col: str,
    b: int = 8,
    salt: str = "",
) -> DataFrame:
    """Keyed sketch STATE: ``(*key_cols, reg, maxrho)`` with at most 2^b
    rows per key — persistable as a summary table (one register frame per
    finest-grain key) and losslessly re-grainable via
    :func:`hll_rollup_registers`."""
    if not 1 <= b <= 8:
        raise ValueError("b must be in [1, 8]")
    m = 1 << b
    h = F.md5(F.concat(F.lit(salt), F.col(col).cast("string")))
    reg = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % m).alias("reg")
    w = F.conv(F.substring(h, 3, 14), 16, 10).cast("long")
    rho = (
        F.when(w > 0, F.lit(_RANK_BITS + 1) - F.length(F.bin(w)))
        .otherwise(F.lit(_RANK_BITS + 1))
        .cast("int")
        .alias("rho")
    )
    return (
        df.select(*key_cols, reg, rho)
        .groupBy(*key_cols, "reg")
        .agg(F.max("rho").alias("maxrho"))
    )


def hll_rollup_registers(
    regs: DataFrame, key_exprs: dict[str, "F.Column"]
) -> DataFrame:
    """Re-grain a keyed register frame to a COARSER grain (e.g. daily ->
    weekly) by the lossless register merge: any deterministic function of
    the key columns induces a coarser partition, and per-register MAX over
    it yields EXACTLY the sketch a direct computation at that grain would
    build — the summary-table navigation pattern (matview.navigate_derived)
    applied to approximate state. ``key_exprs`` maps output key name ->
    expression over the register frame's columns."""
    projected = regs.select(
        *[expr.alias(name) for name, expr in key_exprs.items()],
        "reg",
        "maxrho",
    )
    return projected.groupBy(*key_exprs.keys(), "reg").agg(
        F.max("maxrho").alias("maxrho")
    )


def hll_estimate_from_registers_by_key(
    regs: DataFrame,
    key_cols: list[str],
    b: int = 8,
    out: str = "hll_estimate",
) -> DataFrame:
    """Fold a keyed register frame into per-key estimates (the grouped
    form of :func:`hll_estimate_from_registers`; same exact-integer
    harmonic sums, |groups| x 2^b input rows)."""
    m = 1 << b
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RANK_BITS + 1} - maxrho)")
    packed = regs.groupBy(*key_cols).agg(
        F.sum(term.cast("decimal(28,0)")).alias("_scaled"),
        F.count(F.lit(1)).alias("_hit"),
    )
    absent = (F.lit(m) - F.col("_hit")).cast("decimal(28,0)")
    scaled_total = (
        F.col("_scaled")
        + absent * F.lit(1 << (_RANK_BITS + 1)).cast("decimal(28,0)")
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    numer = float(alpha * m * m * (1 << (_RANK_BITS + 1)))
    est = F.lit(numer) / scaled_total.cast("double")
    zeros = (F.lit(m) - F.col("_hit")).cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    corrected = F.when((est <= 2.5 * m) & (zeros > 0), linear).otherwise(est)
    return packed.select(
        *key_cols,
        F.round(corrected, 1).alias(out),
        F.col("_hit").cast("long").alias("registers_hit"),
    )


def bottomk_quantiles_by_key(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_cols: list[str],
    qs: list[float],
    k: int = 1024,
    salt: str = "bkg",
) -> DataFrame:
    """Per-GROUP quantile sketch (the p95-per-endpoint reporting shape):
    for every ``key_cols`` tuple, exact quantiles of a per-group bottom-k
    uniform sample, selected by the same deterministic integer rank as
    :func:`bottomk_quantiles` — bit-identical across engines and
    partitionings, oracle-replayable.

    Scale shape: the per-group sample is a rank-filter window
    (``row_number over (partition by key order by hash) <= k``), which
    Spark 4 plans with WindowGroupLimit pushdown — each task pre-trims to
    its local per-group top-k BEFORE the exchange, so the shuffle carries
    at most k rows per (group, upstream-partition), never the raw
    per-group volume. The quantile fold then runs on |groups| x k rows.
    Returns ``(*key_cols, q DOUBLE, {value_col})``.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws(
            "|",
            F.lit(salt),
            *[F.col(c).cast("string") for c in key_cols + id_cols],
        )
    ).alias("_bk_hash")
    w_sample = Window.partitionBy(*key_cols).orderBy("_bk_hash")
    sample = (
        df.select(*key_cols, F.col(value_col), h)
        .withColumn("_srn", F.row_number().over(w_sample))
        .filter(F.col("_srn") <= k)
    )
    w_rank = Window.partitionBy(*key_cols).orderBy(
        F.col(value_col), F.col("_bk_hash")
    )
    w_n = Window.partitionBy(*key_cols)
    ranked = sample.select(
        *key_cols,
        F.col(value_col),
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_n).alias("_n"),
    )
    probes = F.array(*[F.lit(float(q)) for q in qs])
    return (
        ranked.select(
            *key_cols, F.explode(probes).alias("q"), value_col, "_rn", "_n"
        )
        .filter(
            F.col("_rn")
            == 1 + F.floor(F.col("q") * (F.col("_n") - 1)).cast("int")
        )
        .select(*key_cols, "q", value_col)
        .orderBy(*key_cols, "q")
    )
