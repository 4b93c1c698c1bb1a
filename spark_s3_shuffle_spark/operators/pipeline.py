"""Training-data pipeline operators (north-star tier, SURVEY §2.2 B47-B50
extensions): repetition signals, PII redaction, deterministic hash
sampling, TF-IDF term ranking, and inverted-index construction.

Everything here is built for the 100 TB regime:

- Per-document signals (repetition, PII, sampling) are pure Column
  expressions — one scan, zero shuffle, whole-stage codegen.
- Corpus-level structures (TF-IDF, inverted index) shuffle on bounded
  keys (vocabulary / (doc, term) pairs after in-doc aggregation), never
  on raw text, and posting lists are capped *before* any collect_list so
  aggregation buffers stay bounded regardless of term skew.

The repetition heuristics follow the published Gopher repetition-removal
rules (duplicate-word fraction, most-frequent-n-gram character share);
the reference engine's own corpus tooling stops at TPC-DS, so these are
additive capability, mirrored 1:1 by DuckDB oracles in the registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.sources.catalog import widen_small_scan

from spark_s3_shuffle_spark.operators.text import tokens


def _bigrams(toks: Column) -> Column:
    """Word bigrams via two offset slices + zip_with (codegen; no explode).
    Empty array for docs with <2 tokens — matching the oracle's
    ``range(1, len(words))`` formulation."""
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat(a, F.lit(" "), b)
    )


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array — i.e. the
    max element frequency — computed with one ``aggregate`` fold over the
    row's own array. O(m log m) per row (the sort), ZERO shuffle: the
    alternative explode → groupBy(doc, gram) → max ships one row per
    (doc, distinct gram) through an exchange, which at corpus scale is a
    shuffle the size of the corpus itself."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(sorted_arr), zero, step, lambda acc: acc["best"])


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition-removal signals per document:

    - ``dup_word_frac``: 1 − distinct_words / words (share of repeated
      word occurrences),
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over total bigrams (the "fraction of text inside the top n-gram"
      rule),
    - ``rep_ok``: the conjunction under the published-style thresholds.

    One scan, zero shuffle: the per-doc max-frequency is a sorted-array
    run-length fold (see ``_max_run_length``), not an explode/groupBy.
    """
    df = widen_small_scan(df)  # r11: one-split-scan CPU guard
    toks = tokens(F.col(text_col))
    grams = _bigrams(toks)
    stats = df.select(
        F.col(id_col),
        F.size(toks).alias("_n"),
        F.size(F.array_distinct(toks)).alias("_nd"),
        F.size(grams).alias("_m"),
        _max_run_length(grams).alias("_maxc"),
    )
    n, nd, m, maxc = F.col("_n"), F.col("_nd"), F.col("_m"), F.col("_maxc")
    dup_frac = F.when(n > 0, 1 - nd / n).otherwise(F.lit(0.0))
    top_gram = F.when(m > 0, maxc / m).otherwise(F.lit(0.0))
    # rep_ok counts only EXCESS occurrences of the top bigram ((maxc-1)/m):
    # a short dup-free doc has top_gram = 1/m by pigeonhole, which must not
    # trip a repetition filter.
    excess = F.when(m > 0, (maxc - 1) / m).otherwise(F.lit(0.0))
    return stats.select(
        F.col(id_col),
        F.round(dup_frac, 4).alias("dup_word_frac"),
        F.round(top_gram, 4).alias("top_bigram_frac"),
        ((dup_frac <= 0.75) & (excess <= 0.2)).alias("rep_ok"),
    )


#: Redaction patterns — deliberately simple character classes valid in both
#: Java regex (Spark) and RE2 (DuckDB oracle), so both engines find the
#: exact same spans.
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
PHONE_RE = r"[0-9]{3}-[0-9]{4}"


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact email addresses and phone-shaped digit groups, returning the
    cleaned text plus per-document redaction counts. Pure Column regex —
    one scan, zero shuffle, no Python boundary. Real deployments extend
    the pattern list (SSNs, credit cards, street addresses); the plumbing
    — count-then-replace in one projection — is the scale-relevant part.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    cleaned = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(cleaned, F.lit(PHONE_RE), 0))
    cleaned = F.regexp_replace(cleaned, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        cleaned.alias("clean_text"),
    )


def hash_bucket(col: Column, salt: str = "") -> Column:
    """Deterministic [0, 100) bucket from the md5 of a key — the portable
    sampling primitive (md5 is bit-identical across engines, unlike
    xxhash64/DuckDB ``hash()``). Content-addressed, so the same row keeps
    the same fate across reruns, retries, and engine versions — the
    property that makes sampled pipelines reproducible."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10)
    return (h.cast("long") % 100).alias("bucket")


def hash_sample(
    df: DataFrame, key_col: str, pct: int, salt: str = ""
) -> DataFrame:
    """Keep rows whose ``hash_bucket(key) < pct`` — a deterministic ~pct%
    sample with zero shuffle and zero RNG state. Unlike ``df.sample()``,
    the selection is stable under retries and partition re-splits (it
    depends only on row content), which is what a reproducible training
    mixture needs."""
    if not 0 <= pct <= 100:
        raise ValueError("pct must be in [0, 100]")
    return df.filter(hash_bucket(F.col(key_col), salt) < pct)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (idf = ln((N+1)/(df+1))).

    Shuffle shape at scale: the raw explode aggregates to (doc, term, tf)
    rows — bounded by per-doc distinct terms, not token count — then the
    document-frequency side is a vocabulary-bound aggregate joined back on
    the term key. N arrives via a broadcast 1-row aggregate, never a
    driver action. The final per-doc top-k is one window over the already
    doc-partitioned tf rows.
    """
    base = df.select(F.col(id_col).alias("_doc"), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = base.groupBy("_doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log((F.col("_n") + 1) / (F.col("df") + 1)))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_doc").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("_doc").alias(id_col),
            "term",
            "tf",
            "df",
            F.round("tfidf", 4).alias("tfidf"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Build a capped inverted index: per term, the document frequency and
    the first ``max_postings`` doc ids (ascending) as a CSV string.

    The cap is applied with a row_number window BEFORE collect_list, so
    the aggregation buffer per term is ≤ max_postings ids even for a term
    that appears in every document — an uncapped collect_list on a
    stopword at 100 TB is an OOM by construction. df counts come from the
    full (term, doc) set, so the cap never changes the statistics.
    """
    from pyspark.sql import Window

    pairs = (
        df.select(F.col(id_col).alias("_doc"), F.explode(tokens(F.col(text_col))).alias("term"))
        .distinct()
    )
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("_doc")
    top = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= max_postings)
    postings = top.groupBy("term").agg(
        F.concat_ws(",", F.transform(F.sort_array(F.collect_list("_doc")), lambda d: d.cast("string"))).alias(
            "postings_csv"
        )
    )
    return (
        dfreq.filter(F.col("df") >= min_df)
        .join(postings, "term")
        .select("term", "df", "postings_csv")
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mixture builder
    ("keep 10% of en, 50% of de, all of fr"). Same md5-bucket selection as
    ``hash_sample`` (content-addressed, retry/partition-invariant), with
    the rate chosen per stratum by a CASE chain; one scan, zero shuffle,
    zero RNG state. Rates are integer percents in [0, 100]."""
    for stratum, pct in rates.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {stratum!r} must be in [0, 100]")
    rate = F.lit(default_pct)
    for stratum, pct in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key_col), salt) < rate)


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    out: str = "batch_id",
) -> DataFrame:
    """Assign rows (chunks) to fixed-token-budget batches by running-offset
    division: batch = floor(offset / budget) where offset is the running
    token sum BEFORE the row — the deterministic sequence-packing step
    between chunking and batch serialization.

    Scale shape: the running sum is one window. With ``partition_cols``
    (recommended: shard/language/date keys) each partition packs
    independently — embarrassingly parallel, which is how a 100 TB corpus
    packs in practice. WITHOUT partition_cols the window is a single
    total order (one task holds the sort tail) — correct, but only for
    corpus slices that fit a task; the operator exists for both because
    the oracle needs the deterministic global form.

    **Scale default**: for a global (unpartitioned) pack at real corpus
    sizes, use :func:`pack_sequences_global` instead — it computes the
    same running token offset via the two-phase distributed prefix sum
    (`operators/prefix.py`), so no single task ever holds the sort tail.
    This function's unpartitioned form is retained for the DuckDB oracle
    and small bounded slices only.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*partition_cols) if partition_cols else Window.partitionBy()
    ).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(token_col).over(w)
    offset = cum - F.col(token_col)
    return df.withColumn(out, F.floor(offset / F.lit(budget)).cast("long"))


# ---------------------------------------------------------------------------
# Tier III (round 4): cross-doc span dedup, deterministic per-group
# sampling, ensemble quality scoring
# ---------------------------------------------------------------------------

def span_key_portable(span: Column, hex_chars: int = 13) -> Column:
    """Engine-portable 52-bit span key: the leading ``hex_chars`` hex digits
    of md5, base-converted — identical in Spark (`conv`) and DuckDB
    (`CAST(concat('0x', …) AS UBIGINT)`), so an oracle can replay the exact
    same keyed pipeline. 52 bits keeps the value exact in BIGINT and
    DOUBLE on both engines."""
    return F.conv(F.substring(F.md5(span), 1, hex_chars), 16, 10).cast("long")


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    min_docs: int = 2,
    key_fn=None,
) -> DataFrame:
    """Cross-document EXACT substring-span detection (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" exact-substring
    recipe, re-expressed relationally): every ``span_tokens``-token window
    that appears verbatim in ≥ ``min_docs`` distinct documents is a
    duplicated span; each document reports how much of it is duplicated
    text (``dup_frac`` = duplicated distinct spans / its distinct spans).

    Returns ``(id_col, n_spans, n_dup_spans, dup_frac)`` for documents with
    at least one duplicated span.

    Scale shape: spans are built row-locally (chained zip_with — codegen,
    no explode until keying), distinct'd WITHIN the row first, then only
    ``(64-bit key, doc id)`` pairs ever reach an exchange — the shuffle is
    ~16 bytes per distinct span occurrence, never the span text. The
    duplicated-key set is aggregated with countDistinct (map-side partial)
    and joined back per doc. ``key_fn`` defaults to `xxhash64` (the fast
    production key); pass ``span_key_portable`` when an oracle must replay
    the keys bit-for-bit.
    """
    from spark_s3_shuffle_spark.operators.text import shingles

    key = key_fn or (lambda c: F.xxhash64(c))
    spans = F.array_distinct(shingles(F.col(text_col), span_tokens))
    # r11: widen the un-exploded (id, text) rows — span construction is the
    # CPU bulk and a one-split corpus scan would run it on a single core
    keyed = (
        widen_small_scan(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias(text_col)))
        .select(F.col("_id"), spans.alias("_spans"))
        .select("_id", F.explode("_spans").alias("_span"))
        .select("_id", key(F.col("_span")).alias("_k"))
    )
    # r11-opt (§2.3/§2.4): ONE pass over the keyed rows instead of three.
    # The previous shape consumed ``keyed`` three times (dup-key aggregate,
    # per-doc totals, semi-join + per-doc dup counts) and the executed plan
    # re-ran the span explode for each consumer (5 FileScans, one reused
    # exchange). Rolling up to (key, doc, cnt) grain first makes the
    # per-key distinct-doc count a plain window count over already-unique
    # rows, and both per-doc sums fold into one aggregate — exact same
    # results: n_spans = Σ cnt, the window count over (key, doc) rows IS
    # countDistinct(doc), and the inner join's "≥1 duplicated span" filter
    # becomes a HAVING. Shuffles carry (52-bit key, id, cnt) rows only.
    from pyspark.sql.window import Window

    perdoc = keyed.groupBy("_k", "_id").agg(F.count(F.lit(1)).alias("_cnt"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("_k"))
    return (
        perdoc.withColumn("_nd", nd)
        .groupBy("_id")
        .agg(
            F.sum("_cnt").alias("n_spans"),
            F.sum(
                F.when(F.col("_nd") >= min_docs, F.col("_cnt")).otherwise(F.lit(0))
            ).alias("n_dup_spans"),
        )
        .filter(F.col("n_dup_spans") >= 1)
        .select(
            F.col("_id").alias(id_col),
            "n_spans",
            "n_dup_spans",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 4).alias("dup_frac"),
        )
    )


def per_group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "",
    out: str = "sample_rank",
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows within each group by
    ``md5(salt || id)`` (a content-addressed pseudo-random order — stable
    under retries, re-partitioning, and engine changes, unlike RNG-based
    `sampleBy`) and keep the first ``k``. The uniform-without-replacement
    per-stratum sampler a mixture builder uses to cap any one source/
    language/domain.

    Scale shape: one hash-partitioned window per group with a rank-limit
    filter — Spark plans the rank filter as WindowGroupLimit, so each
    partition keeps a k-row heap per group instead of fully sorting it.
    """
    from pyspark.sql import Window

    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn(out, F.row_number().over(w))
        .filter(F.col(out) <= k)
    )


def quality_ensemble(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Ensemble quality score in [0, 1]: the mean of five binary signals —
    the four Gopher rule flags (token count, mean token length, symbol
    ratio, stopword presence) plus a repetition gate (duplicate-word
    fraction ≤ 0.3). The standard "combine cheap heuristics into one
    scalar" step that decides mixture weights / filtering tiers before any
    model-based scorer runs.

    Adds ``q_score`` (rounded to 2 decimals: 0.0, 0.2, …, 1.0). Pure
    Column expressions — one scan, zero shuffle, codegen throughout.
    """
    from spark_s3_shuffle_spark.operators.text import gopher_quality_flags, tokens

    flagged = gopher_quality_flags(df, text_col)
    toks = tokens(F.col(text_col))
    dup_word_frac = F.when(
        F.size(toks) > 0,
        1 - F.size(F.array_distinct(toks)) / F.size(toks),
    ).otherwise(F.lit(0.0))
    rep_ok = dup_word_frac <= 0.3
    score = (
        F.col("ok_tokens").cast("int")
        + F.col("ok_mean_len").cast("int")
        + F.col("ok_symbols").cast("int")
        + F.col("ok_stopwords").cast("int")
        + rep_ok.cast("int")
    ) / F.lit(5.0)
    return flagged.withColumn("q_score", F.round(score, 2))


def _hash_u32(col: Column, salt: str = "") -> Column:
    """First 8 hex chars of md5(salt || key) as a long in [0, 2^32) — the
    portable uniform hash both Spark (`conv`) and DuckDB (`CAST('0x'||…)`)
    compute bit-identically. Shared by shard assignment and mixture
    sampling so their selections compose (independent salts)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
    out: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training export.

    Training runs want the corpus in a content-addressed pseudo-random
    order split into fixed shard files. The scale-correct formulation is
    ``shard = md5(id) mod n_shards`` — NOT a global ``row_number`` over a
    hash ordering, which is a one-partition window that serializes the
    whole corpus through a single task. The mod-of-hash assignment is
    embarrassingly parallel (zero shuffle until the sink repartitions on
    ``shard``), gives balanced shard sizes (binomial around n/n_shards),
    and is stable under retries, re-splits, and engine versions. Within a
    shard, writers sort by the same hash (`sortWithinPartitions`) to fix
    the in-file order without any cross-partition exchange.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = _hash_u32(F.col(id_col), salt)
    return df.withColumn(out, (h % n_shards).cast("int"))


def leakage_safe_split(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    cuts: tuple[int, int] = (96, 98),
    salt: str = "split",
) -> DataFrame:
    """Train/val/test split that cannot leak duplicates across splits.

    Hashing each DOCUMENT id into a split (the naive formulation) puts the
    two copies of a duplicated document into independent buckets — at a
    4% eval fraction, a corpus with 10% duplication leaks ~0.8% of eval
    into training, which is exactly the contamination a held-out set
    exists to rule out. The leakage-proof grain is the exact-duplicate
    CLUSTER: group by content digest (sha2 — ~90-byte shuffle rows
    regardless of document size, the same digest-first shape as
    ``exact_dedup``), take the cluster's min id as its root, and hash the
    ROOT into percentile buckets (portable md5 arithmetic, `_hash_u32`).
    Every member inherits the root's bucket, so a cluster lands in ONE
    split by construction. Near-dup clusters compose the same way: feed
    the connected-component root from the LSH tier in as ``content_cols``.

    Returns ``(id, root, bucket, split)`` per document. Two shuffles
    total, both bounded: the digest groupBy (distinct contents) and the
    broadcast-free root join back. ``cuts=(96, 98)`` → train <96, val
    96–97, test 98–99.
    """
    parts = [
        F.coalesce(F.sha2(F.col(c).cast("string"), 256), F.lit("<null>"))
        for c in content_cols
    ]
    digest = F.sha2(F.concat_ws("\x1f", *parts), 256)
    with_digest = df.select(F.col(id_col), digest.alias("_digest"))
    roots = with_digest.groupBy("_digest").agg(F.min(id_col).alias("_root"))
    bucket = (_hash_u32(F.col("_root"), salt) % 100).cast("int")
    train_cut, val_cut = cuts
    return (
        with_digest.join(roots, "_digest")
        .select(
            F.col(id_col),
            F.col("_root").alias("root"),
            bucket.alias("bucket"),
            F.when(bucket < train_cut, "train")
            .when(bucket < val_cut, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    total: int | None = None,
    total_frac: float | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture sampling: draw rows distributed across
    sources per ``weights`` (a training-mixture spec like ``{"web": .5,
    "books": .3, "code": .2}``), capped by availability. The overall
    budget is either ``total`` rows (absolute) or ``total_frac`` of the
    corpus (scale-relative — the form that keeps one registry entry
    meaningful across sf fixtures).

    Per-source quotas become hash thresholds: keep a row iff
    ``hash(id) < floor(min(quota/source_n, 1) * 2^32)``. That keeps the
    operator one scan + one tiny broadcast join (the per-source count
    table — one row per source; the corpus total is a 1-row broadcast,
    never a driver action), with NO per-source ``row_number`` window
    (which at 100 TB would funnel each multi-TB source through a single
    task). The tradeoff is binomial quota error O(sqrt(n)) — the standard
    large-scale practice; the exact-count small-group variant is
    ``per_group_sample``. Selection is content-addressed, so the drawn
    set is identical across reruns and engines — the DuckDB oracle
    replays it bit-for-bit (the rate arithmetic is plain IEEE doubles in
    a pinned evaluation order on both sides).
    """
    if (total is None) == (total_frac is None):
        raise ValueError("exactly one of total / total_frac is required")
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {src!r} must be >= 0")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_src_n"))

    def case_chain(vals: dict[str, float]) -> Column:
        out: Column = F.lit(0.0)
        for src, v in vals.items():
            out = F.when(F.col(source_col) == src, F.lit(v)).otherwise(out)
        return out

    if total_frac is not None:
        tot = df.agg(F.count(F.lit(1)).alias("_tot_n"))
        counts = counts.crossJoin(F.broadcast(tot))
        quota = case_chain({s: float(w) * total_frac for s, w in weights.items()}) * F.col("_tot_n")
        drop = ["_src_n", "_tot_n"]
    else:
        quota = case_chain({s: float(w) * total for s, w in weights.items()})
        drop = ["_src_n"]
    rate = F.least(quota / F.col("_src_n"), F.lit(1.0))
    thr = F.floor(rate * F.lit(float(2**32))).cast("long")
    return (
        df.join(F.broadcast(counts), source_col)
        .filter(_hash_u32(F.col(id_col), salt) < thr)
        .drop(*drop)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> None:
    """The training-export sink: assign shards (`shard_assign`), lay the
    data out as one directory per shard (`partitionBy`), and pin the
    in-file row order to the content hash (`sortWithinPartitions`) so an
    export is byte-stable across reruns and cluster sizes.

    Plan shape at 100 TB: ONE hash-partition exchange on the shard key
    (`repartition(n_shards, shard)` — each output task owns exactly one
    shard directory and writes one file per shard), then a task-local
    sort. No global ordering step anywhere: the order WITHIN a shard is
    the md5 order (content-addressed, so reruns reproduce it), and
    training readers shuffle across shards anyway. Readers get
    partition-pruned access by shard id for free from the directory
    layout.
    """
    sharded = shard_assign(df, id_col, n_shards, salt=salt)
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    (
        sharded.repartition(n_shards, F.col("shard"))
        # Lead with the partition column: the parquet writer requires its
        # input sorted by partition cols and would otherwise inject its own
        # (unstable) sort ABOVE this one, destroying the hash order.
        .sortWithinPartitions(F.col("shard"), order, F.col(id_col))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def weighted_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted bottom-k sample: keep the ``k`` rows with the
    smallest ``u / w`` priority, where ``u`` is the row's 52-bit md5 hash
    (exactly representable in a double) and ``w`` its positive integer
    weight. P(u/w < t) = min(1, t*w), so for k << n the inclusion
    probabilities converge to weight-proportional — the same limit
    exponential-race (A-ES) sampling targets — while the priority stays
    ONE IEEE division of two exactly-representable doubles: no logs, no
    libm, bit-identical across engines, partitionings, and retries (an
    oracle replays the exact selected set, registry q142).

    Scale shape: ``orderBy(priority).limit(k)`` plans
    TakeOrderedAndProject — per-task bottom-k state, an exchange of at
    most k rows per partition at any input size. The sample is mergeable
    (bottom-k of unioned per-part bottom-k frames), so an append-only
    corpus maintains its weighted sample incrementally. Rows with
    non-positive weight are excluded (they would win every race)."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(salt),
                        *[F.col(c).cast("string") for c in key_cols],
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
    )
    pri = (u / F.col(weight_col).cast("double")).alias("_ws_priority")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(pri, *df.columns)
        .orderBy("_ws_priority", *key_cols)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Round-6: distributed global sequence packing + temperature mixture
# ---------------------------------------------------------------------------

def pack_sequences_global(
    df: DataFrame,
    token_col: str,
    ctx: int,
    order: list,
) -> DataFrame:
    """GPT-style concat-and-chunk packing over the WHOLE corpus: documents
    are concatenated in a deterministic total order and sliced into
    fixed-``ctx``-token training windows; each document's chunk span is a
    pure function of its global token offset.

    This is the distributed-global upgrade of :func:`pack_by_token_budget`
    (whose unpartitioned form funnels the sort tail through one task —
    its own docstring says so): the global running token sum comes from
    the two-phase prefix sum (`operators/prefix.py`), so no task ever
    holds more than a range shard, at ANY corpus size — the form a 100 TB
    pretraining corpus actually needs.

    Adds columns: ``start_offset`` (tokens before this doc),
    ``first_chunk`` / ``last_chunk`` (ctx-window ids the doc lands in).
    A doc with ``last_chunk > first_chunk`` crosses a window boundary
    (the packing loss the summary quantifies).
    """
    from spark_s3_shuffle_spark.operators import prefix as PX

    cum = PX.running_sum(df, order, token_col, out="_cum")
    return (
        cum.withColumn(
            "start_offset", (F.col("_cum") - F.col(token_col)).cast("long")
        )
        .withColumn("first_chunk", F.expr(f"start_offset DIV {ctx}"))
        .withColumn(
            "last_chunk",
            F.expr(f"(start_offset + {token_col} - 1) DIV {ctx}"),
        )
        .drop("_cum")
    )


def _exact_isqrt(col: Column) -> Column:
    """Floor integer sqrt, EXACT at any magnitude: start from the
    correctly-rounded double sqrt and correct the potential off-by-one at
    perfect-square boundaries (above 2^52 the double round-trip alone can
    misround) — the same guarded-exactness style as the sketch modules."""
    guess = F.floor(F.sqrt(col.cast("double"))).cast("long")
    return (
        F.when((guess + 1) * (guess + 1) <= col, guess + 1)
        .when(guess * guess > col, guess - 1)
        .otherwise(guess)
    )


def temperature_mixture_allocation(
    df: DataFrame,
    source_col: str,
    total: int,
) -> DataFrame:
    """Temperature-flattened mixture allocation (T=2, i.e. weights ∝
    sqrt(count) — the standard multilingual rebalancing that upsamples
    small sources relative to proportional sampling) with EXACT integer
    arithmetic end-to-end: per-source integer sqrt (guarded exact), then
    largest-remainder apportionment of ``total`` samples — base quota
    ``(total·isqrt) DIV Σisqrt`` plus one extra for the top remainders —
    so allocations are deterministic, sum EXACTLY to ``total`` (when
    Σisqrt > 0), and replay bit-for-bit on any engine.

    Scale: one map-side-combined count per source; every window runs
    over the |sources| frame (a bounded vocabulary, thousands at most),
    keyed on a constant non-foldable key so the plan carries a partition
    spec (same discipline as `prefix._exclusive_prefix`). Returns
    ``(source, n_docs, weight_isqrt, alloc)``.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = counts.withColumn("weight_isqrt", _exact_isqrt(F.col("n_docs")))
    tot = w.agg(F.sum("weight_isqrt").alias("_t"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "weight_isqrt",
        F.expr(f"({total} * weight_isqrt) DIV _t").alias("_base"),
        F.expr(f"({total} * weight_isqrt) % _t").alias("_rem"),
    )
    leftover = q.agg(
        (F.lit(total) - F.sum("_base")).cast("long").alias("_left")
    )
    key = F.pmod(F.xxhash64("source"), F.lit(1))
    wr = (
        Window.partitionBy(key)
        .orderBy(F.col("_rem").desc(), "source")
    )
    return (
        q.crossJoin(F.broadcast(leftover))
        .withColumn("_rk", F.row_number().over(wr))
        .select(
            "source",
            "n_docs",
            "weight_isqrt",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )
