"""Training-corpus curation operators: splits, decontamination, quality
rules, PII masking, sequence packing, mixture sampling.

These are the ops a pretraining-data pipeline runs after dedup
(``operators/dedup``) and before tokenization — the reference's data model
stops at "query the table" (``/root/reference/backend/tools.py:37-104``),
so this module is part of the Layer-B engine surface the north star adds
on top.

Every op is deterministic under any partitioning (hash-derived randomness,
never ``rand()``), so results are reproducible run-to-run on a
1000-executor cluster and replayable in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_feature_demo_spark.functions.numeric import round_det
from hive_feature_demo_spark.operators.textops import tokens, word_shingles

# ---------------------------------------------------------------------------
# Deterministic splits / sampling
# ---------------------------------------------------------------------------


def hash_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Uniform bucket in [0, n_buckets) from md5 of the id — the same value
    on every engine and every run (unlike ``rand(seed)``, which depends on
    partitioning). First 4 hex nibbles = 16 bits of uniformity, plenty for
    percent-level bucketing."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("long") % n_buckets


def assign_split(
    id_col: Column | str, train_pct: int = 80, valid_pct: int = 10
) -> Column:
    """train/valid/test label by hash bucket — membership of a row depends
    only on its id, so re-running on grown data never moves an old row
    across splits (the property that keeps eval sets stable as the corpus
    is re-scraped)."""
    b = hash_bucket(id_col, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights: dict[str, float],
    default_weight: float = 0.1,
) -> DataFrame:
    """Quality-weighted mixture sampling: keep each row with probability =
    its group's weight, decided by the row's own hash (deterministic,
    shuffle-free — a narrow filter over the scan at any scale).

    This is the "upsample high-quality sources, downsample the crawl"
    step of corpus assembly; weights are sampling rates in [0, 1].
    """
    w = F.lit(default_weight)
    for k, v in sorted(weights.items()):
        w = F.when(F.col(group_col) == k, F.lit(v)).otherwise(w)
    unit = hash_bucket(id_col, 10_000).cast("double") / 10_000.0
    return df.filter(unit < w)


# ---------------------------------------------------------------------------
# Decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------------


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word ``n``-gram
    with the eval corpus, with the count of distinct shared shingles.

    Plan shape for 100 TB: the eval side (benchmarks) is orders of
    magnitude smaller than the train side, so its distinct-shingle set is
    aggregated and BROADCAST; the train side then needs one scan + one
    partial-agg shuffle keyed on the (contaminated-only) doc ids. The
    train shingle explode is pipelined with the scan — never materialized.
    Shingles use whitespace tokens (same normalization as the dedup
    family) so oracle SQL replays identically.
    """
    t_sh = train.select(
        F.col(id_col), F.explode(word_shingles(tokens(text_col), n)).alias("shingle")
    )
    e_sh = (
        eval_df.select(F.explode(word_shingles(tokens(text_col), n)).alias("shingle"))
        .distinct()
    )
    return (
        t_sh.join(F.broadcast(e_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_shared_shingles"))
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------


def quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
) -> DataFrame:
    """Rule-based document filters in the Gopher/C4 style, as boolean flag
    columns plus a combined ``keep`` flag.

    Rules (each a pure column expression — whole-stage codegen, no UDF):
      - ``ok_n_words``: word count in [min_words, max_words]
      - ``ok_mean_word_len``: mean word length in [min, max]
      - ``ok_alpha_ratio``: fraction of words containing an alphabetic
        char >= min_alpha_ratio
      - ``ok_no_repeat``: most frequent word < 20% of all words
        (the intra-document repetition signal)
    """
    toks = tokens(text_col)
    n_words = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
    )
    mean_len = total_len.cast("double") / F.greatest(n_words, F.lit(1))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_words, F.lit(1))
    # top word frequency via sort of per-word counts: aggregate over the
    # distinct tokens of the count of occurrences (array ops, still narrow)
    top_freq = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda t: t == w)),
        )
    )
    repeat_ratio = top_freq.cast("double") / F.greatest(n_words, F.lit(1))
    return df.select(
        "*",
        n_words.cast("long").alias("n_words"),
        round_det(mean_len, 4).alias("mean_word_len"),
        (n_words >= min_words).__and__(n_words <= max_words).alias("ok_n_words"),
        ((mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)).alias(
            "ok_mean_word_len"
        ),
        (alpha_ratio >= min_alpha_ratio).alias("ok_alpha_ratio"),
        (repeat_ratio < 0.2).alias("ok_no_repeat"),
    ).withColumn(
        "keep",
        F.col("ok_n_words")
        & F.col("ok_mean_word_len")
        & F.col("ok_alpha_ratio")
        & F.col("ok_no_repeat"),
    )


def ngram_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_bigram_pct: int = 20,
    dup_trigram_pct: int = 30,
) -> DataFrame:
    """Gopher-style intra-document n-gram repetition filters: the fraction
    of bigram instances taken by the single most frequent bigram, and the
    fraction of trigram instances that are duplicated (count > 1) — the
    two rules that catch boilerplate/template spam which single-word
    repetition (``quality_rules``'s ``ok_no_repeat``) misses.

    All outputs are INTEGER counts plus a keep flag decided by integer
    cross-multiplication (``top_n * 100 <= pct * n``), so results are
    exactly reproducible in any engine — no float thresholds to flake the
    oracle hash.

    Scale: ONE scan of the text and NO join back to the doc table —
    bigram and trigram arrays are built narrow (shifted-copy zips),
    tagged, concatenated, and exploded ONCE (``explode_outer`` keeps
    gram-less short docs as a null-kind row); ``n_words`` rides along as a
    functionally-dependent grouping key, so the per-(doc, kind, gram)
    count and the rollups are plain partial-agg shuffles over
    high-cardinality keys (no hot keys: a doc's grams spread over as many
    keys as it has distinct grams, and no doc-table-sized broadcast/SMJ
    that a join-back design would need). The O(n_words²) array-only form
    quality_rules uses for its single-word rule would be quadratic per
    row on long documents; explode+groupBy is the 100 TB formulation.
    """
    from hive_feature_demo_spark.operators.textops import word_ngrams

    toks = tokens(text_col)
    tagged = F.concat(
        F.transform(
            word_ngrams(toks, 2),
            lambda g: F.struct(F.lit("bi").alias("kind"), g.alias("gram")),
        ),
        F.transform(
            word_ngrams(toks, 3),
            lambda g: F.struct(F.lit("tri").alias("kind"), g.alias("gram")),
        ),
    )
    base = df.select(
        F.col(id_col), F.size(toks).cast("long").alias("n_words"), tagged.alias("_g")
    )
    per_kind = (
        base.select(id_col, "n_words", F.explode_outer("_g").alias("g"))
        .groupBy(
            id_col,
            "n_words",
            F.col("g.kind").alias("kind"),
            F.col("g.gram").alias("gram"),
        )
        .count()
        .groupBy(id_col, "n_words", "kind")
        .agg(
            F.sum("count").alias("n"),
            F.max("count").alias("top"),
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias("dup"),
        )
    )
    out = per_kind.groupBy(id_col, "n_words").agg(
        F.coalesce(F.sum(F.when(F.col("kind") == "bi", F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_bigrams"),
        F.coalesce(F.sum(F.when(F.col("kind") == "bi", F.col("top"))), F.lit(0))
        .cast("long")
        .alias("top_bigram_n"),
        F.coalesce(F.sum(F.when(F.col("kind") == "tri", F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_trigrams"),
        F.coalesce(F.sum(F.when(F.col("kind") == "tri", F.col("dup"))), F.lit(0))
        .cast("long")
        .alias("dup_trigram_n"),
    )
    return out.withColumn(
        "keep",
        (F.col("top_bigram_n") * 100 <= F.lit(top_bigram_pct) * F.col("n_bigrams"))
        & (F.col("dup_trigram_n") * 100 <= F.lit(dup_trigram_pct) * F.col("n_trigrams")),
    )


# ---------------------------------------------------------------------------
# PII masking
# ---------------------------------------------------------------------------


def mask_phone(col: Column | str) -> Column:
    """Mask every digit except the last 4 (substring arithmetic, not
    regex lookahead — lookahead is Java-regex-only and would not replay
    in RE2-based engines)."""
    c = F.col(col) if isinstance(col, str) else col
    head = F.substring(c, 1, F.length(c) - 4)
    tail = F.substring(c, -4, 4)
    return F.concat(F.regexp_replace(head, "[0-9]", "*"), tail)


def pseudonymize(col: Column | str, salt: str = "hfd") -> Column:
    """Stable pseudonym: first 16 hex of salted sha256. One-way, join-safe
    (the same input maps to the same token across tables/runs), which is
    what record linkage over masked data requires."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.sha2(F.concat(F.lit(salt + ":"), c), 256), 1, 16)


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    group_col: str,
    budget: int = 512,
) -> DataFrame:
    """Greedy first-fit packing of documents into fixed-token-budget bins
    (the "pack short docs into one context window" step before
    pretraining), per group, in ``id_col`` order.

    Packing is inherently a sequential recurrence (bin fill resets when
    the next doc overflows), so it runs as ``applyInPandas`` per group —
    each group packs independently and in parallel. At 100 TB the group
    key is (source, shard) with shards sized so a group's doc *metadata*
    (id + token count, not text!) fits a worker; only the two integer
    columns cross into Python, Arrow-batched.

    A document larger than the budget gets a bin of its own (and
    overflows it) — flagged downstream rather than dropped here.

    Returns (group, id, n_tokens, bin_id) with bin ids dense from 0 per
    group.
    """
    import pandas as pd

    out_schema = f"{group_col} string, {id_col} long, {n_tokens_col} long, bin_id long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        bins, fill, cur = [], 0, -1
        for t in pdf[n_tokens_col]:
            t = int(t)
            if cur < 0 or fill + t > budget:
                cur += 1
                fill = t
            else:
                fill += t
            bins.append(cur)
        pdf = pdf[[group_col, id_col, n_tokens_col]].copy()
        pdf["bin_id"] = bins
        return pdf

    return (
        df.select(group_col, id_col, n_tokens_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema=out_schema)
    )
