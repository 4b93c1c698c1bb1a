"""Text-analysis operators over the ``documents`` table (SURVEY §2.2 B50;
north-star text tier): tokenization, token counting, quality scoring,
language ID, document fingerprinting.

All hot paths are built-in Column expressions (split/filter/aggregate run
in codegen); nothing here crosses the Python boundary, so these scale to a
100 TB corpus as a single scan + (for corpus-level counts) one hash
aggregation whose shuffle volume is bounded by vocabulary size, not corpus
size.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringized hints here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.sources.catalog import widen_small_scan

#: Tiny deterministic English stoplist for quality scoring / lang-id.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column, delimiter: str = " ") -> Column:
    """Whitespace tokenization with empty-token filtering (both sides of the
    DuckDB oracle filter empties; FIXTURES §4 rule 6)."""
    return F.filter(F.split(F.lower(text), delimiter), lambda t: t != F.lit(""))


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization: splits off punctuation and numbers as
    separate tokens (a rough proxy for subword token counting)."""
    cleaned = F.regexp_replace(F.lower(text), r"([^\w\s])", r" $1 ")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, token_count(F.col(text_col)))


def word_counts(df: DataFrame, text_col: str = "text", k: int | None = None) -> DataFrame:
    """Corpus-level word frequencies (Q35). explode → groupBy(word) — the
    shuffle carries one (word, partial_count) pair per distinct word per
    partition thanks to partial aggregation, so it is vocabulary-bound."""
    out = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
    )
    return out.limit(k) if k else out


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char length, token count, mean token
    length, stopword ratio, punctuation ratio. One scan, zero shuffle."""
    t = F.col(text_col)
    toks = tokens(t)
    mean_tok_len = F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / F.size(toks),
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        F.length(t).alias("len_chars"),
        token_count(t).alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(stopword_ratio(t), 4).alias("stop_ratio"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
    )


#: Character-frequency profiles for a toy n-gram language-ID heuristic.
#: Deterministic and dependency-free; real deployments would swap in a
#: fastText/CLD3 model behind the same mapInPandas seam.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "ein"],
    "fr": ["le", "et", "les"],
    "es": ["el", "de", "los"],
    "zh": [],  # fallback: CJK codepoint presence
}


def lang_id(text: Column) -> Column:
    """Heuristic language ID: CJK codepoints → zh; else the language whose
    marker stopwords occur most. Pure Column expression (no UDF)."""
    toks = tokens(text)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        if not markers:
            continue
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))))
    has_cjk = F.length(F.regexp_replace(text, r"[一-鿿]", "")) < F.length(text)
    out = F.lit("en")
    best = scores[0][1]
    for lang, score in scores[1:]:
        out = F.when(score > best, F.lit(lang)).otherwise(out)
        best = F.greatest(best, score)
    return F.when(has_cjk, F.lit("zh")).otherwise(out)


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    return df.withColumn(out, lang_id(F.col(text_col)))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (content hash). MD5 is used because
    the DuckDB oracle computes the identical digest; the dedup tier also
    offers xxhash64 (faster, Spark-only)."""
    return F.md5(text)


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style rule-based quality flags, one boolean per rule plus
    the conjunction — the standard pre-training corpus filter family
    (word-count bounds, mean word length, symbol ratio, stopword presence).
    Pure Column expressions: one scan, zero shuffle, codegen throughout.

    Rules (thresholds per the published Gopher heuristics, adapted to the
    fixture's vocabulary):
    - 10 ≤ n_tokens ≤ 100k
    - 2 ≤ mean token length ≤ 12
    - symbol ratio (#/…/ellipsis) ≤ 0.1
    - contains ≥ 1 stopword (proxy for "is running text")
    """
    df = widen_small_scan(df)  # r11: token/aggregate exprs are the CPU
    # bulk; a one-split corpus scan must not evaluate them on one core
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    mean_len = F.when(n > 0, F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)) / n).otherwise(F.lit(0.0))
    sym = F.length(t) - F.length(F.regexp_replace(t, r"[#…]|\.\.\.", ""))
    sym_ratio = F.when(F.length(t) > 0, sym / F.length(t)).otherwise(F.lit(0.0))
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    has_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x))) > 0
    flags = {
        "ok_tokens": (n >= 10) & (n <= 100_000),
        "ok_mean_len": (mean_len >= 2) & (mean_len <= 12),
        "ok_symbols": sym_ratio <= 0.1,
        "ok_stopwords": has_stop,
    }
    out = df
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    return out.withColumn(
        "quality_pass",
        F.col("ok_tokens") & F.col("ok_mean_len") & F.col("ok_symbols") & F.col("ok_stopwords"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    context-window preparation step of a training pipeline. Returns
    (id, chunk_id, chunk_text, n_chunk_tokens); one row per chunk via a
    single explode, no shuffle, chunk boundaries deterministic.

    Scale: rows multiply by ~n_tokens/(chunk_tokens-overlap) BEFORE any
    exchange — size downstream shuffles accordingly.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # chunk start positions 0, step, 2*step, ... while start < n (≥1 chunk)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1)).cast("int")
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * step)
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_tokens))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_ctoks"))
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(" ", F.col("_ctoks")).alias("chunk_text"),
            F.size("_ctoks").alias("n_chunk_tokens"),
        )
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
) -> DataFrame:
    """Flag training documents sharing any ``ngram``-gram with a held-out
    test corpus — the standard n-gram-collision decontamination check run
    before pre-training. Returns the train frame with ``contaminated``
    (boolean) and ``n_hits`` (distinct colliding n-grams).

    Scale shape: both sides explode to (doc, ngram-hash) rows and meet in
    an equi-join keyed by the 64-bit hash — never doc×doc pairs. The test
    side is the small one (benchmarks are ≪ training corpora); its distinct
    n-gram set broadcasts, so the training scan never shuffles. Collisions
    are counted per train doc with a hash-agg bounded by |train docs|.
    """
    # r11: widen the (id, text) projection before the n-gram explode —
    # same one-split-scan rationale as dedup._shingle_rows
    tr_src = widen_small_scan(
        train.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    )
    tr = tr_src.select("_id", F.explode(F.array_distinct(shingles(F.col("_t"), ngram))).alias("_s"))
    te = test.select(F.explode(F.array_distinct(shingles(F.col(text_col), ngram))).alias("_s")).distinct()
    tr_h = tr.select("_id", F.xxhash64("_s").alias("_h"))
    te_h = F.broadcast(te.select(F.xxhash64("_s").alias("_h")).distinct())
    hits = (
        tr_h.join(te_h, "_h", "left_semi")
        .groupBy("_id")
        .agg(F.countDistinct("_h").alias("n_hits"))
    )
    return (
        train.join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def shingles(text: Column, n: int = 5) -> Column:
    """Word n-gram shingles as strings — the MinHash/Jaccard input unit.

    Built as n-1 chained ``zip_with`` concats over n offset ``slice`` views:
    n array copies per ROW instead of one O(n) slice+concat per SHINGLE
    (the transform(sequence, i -> concat_ws(slice(toks, i, n))) formulation
    re-slices per element and measured ~10× slower on the sf0.1 corpus).
    Stays entirely in codegen.
    """
    toks = tokens(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, k + 1, m), lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(toks) >= n, acc).otherwise(F.array(F.concat_ws(" ", toks)))


def bigram_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Language-model-proxy quality signal: per document, the fraction of
    its bigram OCCURRENCES that appear at least ``min_count`` times in the
    whole corpus — low coverage marks gibberish/boilerplate the way high
    perplexity would, but with INTEGER counts only (matched/total is one
    IEEE division of two exact ints), so the scores are engine- and
    partitioning-exact where a real LM's float log-sums are not.

    Plan shape: one explode to (doc, bigram) rows, one vocabulary-bound
    aggregate for the corpus table (bigram vocabularies grow ~Heaps' law,
    sublinear in corpus size; the min_count filter prunes the long tail),
    a join back on the bigram key (AQE broadcasts the vocab side while it
    fits; beyond that it is a plain hash join on a well-distributed key),
    and a per-doc count aggregate. Nothing is quadratic; the only
    corpus-sized shuffle carries (doc_id, bigram) pairs.

    Returns ``(id_col, matched, total, coverage)``.
    """
    toks = tokens(F.col(text_col))
    tl = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg_expr = F.transform(
        F.slice(F.col("toks"), F.lit(1), F.size("toks") - 1),
        lambda x, i: F.concat(
            x, F.lit(" "), F.element_at(F.col("toks"), i + F.lit(2))
        ),
    )
    bg = tl.select(F.col(id_col), F.explode(bg_expr).alias("bigram"))
    vocab = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("bigram", F.lit(1).alias("_in"))
    )
    return (
        bg.join(vocab, "bigram", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("_in"), F.lit(0))).alias("matched"),
            F.count(F.lit(1)).alias("total"),
        )
        .select(
            id_col,
            F.col("matched").cast("long").alias("matched"),
            F.col("total").cast("long").alias("total"),
            F.round(
                F.col("matched").cast("double") / F.col("total").cast("double"),
                4,
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Round-11 (second pass): REAL byte-pair encoding — the "BPE-ish regex"
# above is a counting proxy; this is the actual algorithm (Sennrich,
# Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
# Subword Units"), trained distributed and applied distributed.
# ---------------------------------------------------------------------------


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace words — BPE trains on the DISTINCT-word
    frequency table, which is vocabulary-sized, not corpus-sized: the one
    property that makes corpus-scale BPE training cheap."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


#: Merge rounds between lineage collapses in :func:`bpe_train` (see the
#: inline comment there). Module-level so tests can exercise the collapse
#: path without training a 32+-merge vocabulary.
_BPE_CHECKPOINT_EVERY = 32


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus, fully distributed.

    Each round: explode every distinct word's current symbol array into
    adjacent pairs weighted by word count (map-side-combined aggregate —
    shuffle bounded by |distinct pairs|, not corpus size), pick the most
    frequent pair with a DETERMINISTIC total order (count desc, then the
    pair lexicographically asc — frequency ties cannot make two runs or
    two engines diverge), and rewrite the symbol arrays in place with a
    JVM ``aggregate`` fold. The left-to-right merge scan folds as a stack:
    push each symbol, and when the stack top is ``a`` and the incoming
    symbol is ``b``, replace the top with ``a+b``. The two formulations
    are equivalent because a freshly merged token ``a+b`` can never itself
    equal ``a`` (``b`` is non-empty), so a merge output never re-triggers
    as the left half within the same pass — and running in Column algebra
    (r11-opt) removes the per-round Arrow/Python worker round-trip plus
    the per-round persist+count materialization job the Python UDF chain
    needed: a round is now exactly ONE action (the top-pair lookup) over
    the persisted base frame with k cheap narrow rewrites on top.

    Driver traffic per round: exactly ONE (pair, count) row. Returns the
    merge list in rank order — O(num_merges) strings, the model artifact.
    """
    words = _word_counts(df, text_col).select(
        F.expr("split(word, '')").alias("syms"), "cnt"
    ).persist()

    def rewrite(syms, a: str, b: str):
        return F.aggregate(
            syms,
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, F.size(acc)) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    # Lineage bound (r12-opt, ADVICE r11): each round stacks one nested
    # aggregate() rewrite on the previous frame, so round i re-analyzes
    # and re-evaluates i prior rewrites — O(num_merges^2) plan growth.
    # Collapsing the frame every _BPE_CHECKPOINT_EVERY merges
    # (localCheckpoint: blocks released by the ContextCleaner, nothing
    # registered in the CacheManager) bounds plan depth at a constant
    # while keeping each round exactly ONE action. At the declared vocab
    # sizes (num_merges <= 8 in the registry) this never triggers and
    # the plan is byte-identical to the r11 shape.
    checkpoint_every = _BPE_CHECKPOINT_EVERY
    cur = words
    merges: list[tuple[str, str]] = []
    for i in range(max(0, num_merges)):
        pairs = (
            cur.select(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (s, i) -> struct(s AS a, syms[i + 1] AS b))"
                ).alias("ps"),
                "cnt",
            )
            .select(F.explode("ps").alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        cur = cur.select(rewrite(F.col("syms"), a, b).alias("syms"), "cnt")
        if (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=False)
    words.unpersist()
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE apply to one word: repeatedly merge the LOWEST-RANK
    adjacent pair (the canonical inference rule — training order, not
    left-to-right scan order). Pure function shared by the distributed
    encoder and the tests' longhand replays."""
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best:best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens) under a trained BPE model.

    Encodes each DISTINCT word once (mapInPandas over the vocabulary-
    sized word frame, merge table broadcast in the closure) and joins the
    per-word token lengths back onto the exploded corpus — so the
    Python-side work is O(|vocab| * word_len^2), independent of corpus
    size, and the corpus-side cost is one explode + one vocabulary-keyed
    join + one map-side-combined count."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    ranks = {m: i for i, m in enumerate(merges)}

    def encode_words(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "n_sub": [len(bpe_segment(w, ranks)) for w in pdf["word"]],
            })

    schema = StructType([
        StructField("word", StringType(), False),
        StructField("n_sub", IntegerType(), False),
    ])
    word_len = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .distinct()
        .mapInPandas(encode_words, schema=schema)
    )
    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    return (
        exploded.join(word_len, "word")
        .groupBy(id_col)
        .agg(F.sum("n_sub").cast("long").alias("n_tokens"))
    )
