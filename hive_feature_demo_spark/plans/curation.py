"""Corpus-curation queries: deterministic splits, decontamination, quality
rules, PII masking, sequence packing, mixture sampling.

The pretraining-data assembly surface on top of the dedup family
(``plans/llmops``): everything here is hash-deterministic (never
``rand()``), so each op replays exactly in the DuckDB oracle and is
reproducible across cluster runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import (
    round_det,
    sql_hex_to_int,
    sql_round_det,
)
from hive_feature_demo_spark.operators import curation
from hive_feature_demo_spark.operators.textops import word_tokens_regex
from hive_feature_demo_spark.plans.registry import register

_H4_DOC = sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", "1", 4)

# word tokens shared with q34's oracle
_SQL_NWORDTOK = "len(regexp_extract_all(text, '[a-zA-Z0-9]+'))"


# ---------------------------------------------------------------------------
# q137 — deterministic train/valid/test split. Membership depends only on
# the doc's own hash: stable as the corpus grows (no re-shuffling of old
# rows across splits), shuffle-free to assign (narrow map), one partial-agg
# shuffle on 3 keys to summarize. The eval-set stability property is why
# hash splits, not rand(seed), are the 100 TB-correct answer.
# ---------------------------------------------------------------------------


@register(
    "q137_train_valid_test_split",
    oracle=f"""
    SELECT CASE WHEN {_H4_DOC} % 100 < 80 THEN 'train'
                WHEN {_H4_DOC} % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM({_SQL_NWORDTOK}) AS BIGINT) AS total_word_tokens
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
    category="curation",
)
def q137_train_valid_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            curation.assign_split("doc_id", 80, 10).alias("split"),
            F.size(word_tokens_regex("text")).cast("long").alias("wt"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("wt").cast("bigint").alias("total_word_tokens"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q138 — benchmark decontamination: training docs (source <> src0) sharing
# any word 4-gram with the eval corpus (source = src0). Eval shingle set is
# broadcast (benchmarks are tiny next to the crawl); train shingles explode
# pipelined with the scan. The found docs are what a pipeline drops before
# training to keep eval numbers honest.
# ---------------------------------------------------------------------------

_N = 4


@register(
    "q138_ngram_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               generate_series(1, len(t) - {_N - 1}),
               i -> array_to_string(t[i:i+{_N - 1}], ' ')))) AS shingle
      FROM toks WHERE len(t) >= {_N}
    ), ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')
    SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_shared_shingles
    FROM sh s JOIN ev USING (shingle)
    WHERE s.source <> 'src0'
    GROUP BY 1 ORDER BY 1
    """,
    category="curation",
)
def q138_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return curation.ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=_N,
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q139 — Gopher-style quality rules, summarized per source: word-count
# range, mean word length, alphabetic-word ratio, intra-doc repetition.
# Pure column expressions (whole-stage codegen); one partial-agg shuffle
# keyed on source.
# ---------------------------------------------------------------------------


@register(
    "q139_quality_rules",
    oracle="""
    WITH m AS (
      SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), r AS (
      SELECT source,
             len(t) AS n_words,
             CAST(list_sum(list_transform(t, w -> length(w))) AS DOUBLE)
               / greatest(len(t), 1) AS mean_len,
             CAST(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               / greatest(len(t), 1) AS alpha_ratio,
             CAST(list_max(list_transform(list_distinct(t),
                    w -> len(list_filter(t, x -> x = w)))) AS DOUBLE)
               / greatest(len(t), 1) AS repeat_ratio
      FROM m
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 0 ELSE 1 END)
             AS BIGINT) AS n_fail_words,
           CAST(SUM(CASE WHEN mean_len BETWEEN 3.0 AND 10.0 THEN 0 ELSE 1 END)
             AS BIGINT) AS n_fail_meanlen,
           CAST(SUM(CASE WHEN alpha_ratio >= 0.8 THEN 0 ELSE 1 END)
             AS BIGINT) AS n_fail_alpha,
           CAST(SUM(CASE WHEN repeat_ratio < 0.2 THEN 0 ELSE 1 END)
             AS BIGINT) AS n_fail_repeat,
           CAST(SUM(CASE WHEN n_words BETWEEN 50 AND 100000
                          AND mean_len BETWEEN 3.0 AND 10.0
                          AND alpha_ratio >= 0.8
                          AND repeat_ratio < 0.2 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_keep
    FROM r GROUP BY source ORDER BY source
    """,
    category="curation",
)
def q139_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    flagged = curation.quality_rules(docs, "text")
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((~F.col("ok_n_words")).cast("long")).alias("n_fail_words"),
            F.sum((~F.col("ok_mean_word_len")).cast("long")).alias("n_fail_meanlen"),
            F.sum((~F.col("ok_alpha_ratio")).cast("long")).alias("n_fail_alpha"),
            F.sum((~F.col("ok_no_repeat")).cast("long")).alias("n_fail_repeat"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q140 — PII anonymization over the customer dimension, k-anonymity style:
# names become salted-sha256 pseudonyms (stable => still joinable across
# tables), balances generalize to $500 bands, and the nation
# quasi-identifier is SUPPRESSED for (segment, nation) groups smaller than
# k=5 (the re-identification risk is exactly those small groups). Group
# sizes come from one window count — a single shuffle on the
# quasi-identifier pair; everything else is a narrow projection.
# ---------------------------------------------------------------------------

_K_ANON = 5


@register(
    "q140_pii_anonymization",
    oracle=f"""
    WITH g AS (
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
             COUNT(*) OVER (PARTITION BY c_mktsegment, c_nationkey) AS grp_n
      FROM customer
    )
    SELECT c_custkey,
           substring(sha256('hfd:' || c_name), 1, 16) AS name_token,
           CAST(FLOOR(c_acctbal / 500.0) AS BIGINT) * 500 AS acctbal_band,
           c_mktsegment,
           CASE WHEN grp_n >= {_K_ANON} THEN c_nationkey ELSE NULL END
             AS nation_anon
    FROM g ORDER BY c_custkey
    """,
    category="curation",
)
def q140_pii_anonymization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    grp_n = F.count("*").over(
        Window.partitionBy("c_mktsegment", "c_nationkey")
    )
    return (
        c.select(
            "c_custkey",
            curation.pseudonymize("c_name").alias("name_token"),
            (F.floor(F.col("c_acctbal") / 500.0).cast("long") * 500).alias(
                "acctbal_band"
            ),
            "c_mktsegment",
            F.when(grp_n >= _K_ANON, F.col("c_nationkey")).alias("nation_anon"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q141 — greedy sequence packing into 512-token bins per source (first-fit
# in doc_id order). Sequential recurrence per group => applyInPandas over
# (group) with only (id, n_tokens) crossing to Python, Arrow-batched; bins
# summarize back JVM-side. Oracle replays the same recurrence as a
# recursive CTE. At 100 TB the group key is (source, shard).
# ---------------------------------------------------------------------------

_BUDGET = 512


@register(
    "q141_sequence_packing",
    oracle=f"""
    WITH RECURSIVE toks AS MATERIALIZED (
      SELECT source, doc_id, CAST({_SQL_NWORDTOK} AS BIGINT) AS n_tokens
      FROM documents
    ), docs AS MATERIALIZED (
      -- MATERIALIZED: the recursive member below joins docs every
      -- iteration; inlined, DuckDB re-tokenizes the whole corpus per step
      -- (16.8 s plain vs 0.34 s pinned at sf0.1, rows identical).
      SELECT source, doc_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM toks
    ), rec AS (
      SELECT source, doc_id, n_tokens, rn, n_tokens AS fill, CAST(0 AS BIGINT) AS bin_id
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.source, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN r.fill + d.n_tokens <= {_BUDGET}
                  THEN r.fill + d.n_tokens ELSE d.n_tokens END,
             CASE WHEN r.fill + d.n_tokens <= {_BUDGET}
                  THEN r.bin_id ELSE r.bin_id + 1 END
      FROM rec r JOIN docs d ON d.source = r.source AND d.rn = r.rn + 1
    )
    SELECT source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM rec GROUP BY source, bin_id ORDER BY source, bin_id
    """,
    category="curation",
)
def q141_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(word_tokens_regex("text")).cast("long").alias("n_tokens"),
    )
    packed = curation.pack_sequences(
        docs, "doc_id", "n_tokens", "source", budget=_BUDGET
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source", "bin_id")
    )


# ---------------------------------------------------------------------------
# q142 — quality-weighted mixture sampling: per-source keep rates applied
# via each doc's own hash (deterministic; a narrow filter fused into the
# scan — zero shuffle before the summary agg). The corpus-assembly step
# that upsamples curated sources and downsamples the crawl.
# ---------------------------------------------------------------------------

_WEIGHTS = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}


def _sql_weight() -> str:
    cases = " ".join(
        f"WHEN source = '{k}' THEN {v}" for k, v in sorted(_WEIGHTS.items())
    )
    return f"CASE {cases} ELSE 0.1 END"


@register(
    "q142_mixture_sampling",
    oracle=f"""
    WITH w AS (
      SELECT source, doc_id, {_SQL_NWORDTOK} AS wt,
             CAST({_H4_DOC} % 10000 AS DOUBLE) / 10000.0 AS unit,
             {_sql_weight()} AS keep_rate
      FROM documents
    )
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(wt) AS BIGINT) AS kept_word_tokens
    FROM w WHERE unit < keep_rate
    GROUP BY source ORDER BY source
    """,
    category="curation",
)
def q142_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    kept = curation.mixture_sample(docs, "doc_id", "source", _WEIGHTS, 0.1)
    return (
        kept.select(
            "source", F.size(word_tokens_regex("text")).cast("long").alias("wt")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("wt").cast("bigint").alias("kept_word_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q151 — domain capping: keep at most N docs per source, chosen by each
# doc's own hash (rank within source ordered by (hash, id)) — the "no
# single domain dominates the mixture" rule. Deterministic: the selection
# is a pure function of doc ids, so re-runs and engine changes keep the
# same sample. One shuffle on source for the rank window; at 100 TB
# sources with < N docs short-circuit via the same plan (window rank is
# per-partition after the shuffle, no global sort).
# ---------------------------------------------------------------------------

_CAP_N = 15


@register(
    "q151_domain_capping",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, {_SQL_NWORDTOK} AS wt,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_H4_DOC} % 10000, doc_id) AS rk
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(wt) AS BIGINT) AS kept_word_tokens,
           CAST(MAX(rk) AS BIGINT) AS max_rank
    FROM ranked WHERE rk <= {_CAP_N}
    GROUP BY source ORDER BY source
    """,
    category="curation",
)
def q151_domain_capping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            curation.hash_bucket("doc_id", 10_000), "doc_id"
        )
    )
    return (
        docs.select(
            "source",
            "doc_id",
            F.size(word_tokens_regex("text")).cast("long").alias("wt"),
            rk.alias("rk"),
        )
        .filter(F.col("rk") <= _CAP_N)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("wt").cast("bigint").alias("kept_word_tokens"),
            F.max("rk").cast("long").alias("max_rank"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q156 — Gopher-style n-gram repetition filters: top-bigram instance
# fraction and duplicated-trigram instance fraction per document, with an
# integer-arithmetic keep decision (top_n * 100 <= pct * n). Catches the
# boilerplate/template spam that single-word repetition (q139's
# ok_no_repeat) misses. One text scan: bigrams + trigrams are built as
# shifted-copy zips, tagged, and exploded once; counting is two partial-agg
# shuffles over high-cardinality (doc, kind, gram) keys — the 100 TB
# formulation (the array-only alternative is O(n_words^2) per row).
# Rules after Rae et al. 2021 (Gopher), table A1.
# ---------------------------------------------------------------------------


@register(
    "q156_ngram_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g AS (
      SELECT doc_id, 'bi' AS kind,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS gram
      FROM t
      UNION ALL
      SELECT doc_id, 'tri',
             unnest(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      FROM t
    ), c AS (
      SELECT doc_id, kind, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3
    ), s AS (
      SELECT doc_id, kind, SUM(cnt) AS n, MAX(cnt) AS top,
             SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
      FROM c GROUP BY 1, 2
    ), p AS (
      SELECT doc_id,
             COALESCE(SUM(CASE WHEN kind = 'bi' THEN n END), 0) AS n_bigrams,
             COALESCE(SUM(CASE WHEN kind = 'bi' THEN top END), 0) AS top_bigram_n,
             COALESCE(SUM(CASE WHEN kind = 'tri' THEN n END), 0) AS n_trigrams,
             COALESCE(SUM(CASE WHEN kind = 'tri' THEN dup END), 0) AS dup_trigram_n
      FROM s GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(len(t.w) AS BIGINT) AS n_words,
           CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(p.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           CAST(COALESCE(p.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           CAST(COALESCE(p.dup_trigram_n, 0) AS BIGINT) AS dup_trigram_n,
           (COALESCE(p.top_bigram_n, 0) * 100 <= 20 * COALESCE(p.n_bigrams, 0)
            AND COALESCE(p.dup_trigram_n, 0) * 100 <= 30 * COALESCE(p.n_trigrams, 0))
             AS keep
    FROM t LEFT JOIN p ON t.doc_id = p.doc_id
    ORDER BY t.doc_id
    """,
    category="curation",
)
def q156_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return curation.ngram_repetition_stats(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q161 — PPS systematic token sampling: draw ~k documents with probability
# proportional to token count, deterministically and in EXACT integer
# arithmetic (no rand(), no transcendental keys that could flake a hash
# compare). Docs are laid on a line in md5-hash order, each owning a
# segment equal to its token count; a boundary grid of k equal segments
# selects every doc whose span crosses a boundary (multiplicity = number
# of boundaries crossed — oversized docs can be drawn more than once, the
# standard PPS semantics). The global exclusive prefix sum comes from
# operators/relational_ext.global_cumsum — the bounded-driver-state grid
# pattern (global_rank's sibling), never a single-partition window: the
# token-budget downsampling primitive that complements q142's per-source
# mixture rates with corpus-wide size-proportional selection.
# ---------------------------------------------------------------------------

_H8_DOC = sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", "1", 8)
_PPS_K = 50


@register(
    "q161_pps_token_sample",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_H8_DOC} AS h,
             CAST({_SQL_NWORDTOK} AS BIGINT) AS wt
      FROM documents
      WHERE {_SQL_NWORDTOK} > 0
    ), c AS (
      SELECT doc_id, wt,
             COALESCE(SUM(wt) OVER (ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
             SUM(wt) OVER () AS total_w
      FROM base
    )
    SELECT doc_id, wt,
           CAST(({_PPS_K} * (cum_before + wt)) // total_w
                - ({_PPS_K} * cum_before) // total_w AS BIGINT) AS multiplicity
    FROM c
    WHERE ({_PPS_K} * (cum_before + wt)) // total_w
          - ({_PPS_K} * cum_before) // total_w > 0
    ORDER BY doc_id
    """,
    category="curation",
)
def q161_pps_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.relational_ext import global_cumsum

    docs = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    wt = F.size(word_tokens_regex("text")).cast("long")
    base = docs.select(
        "doc_id", h.alias("h"), wt.alias("wt")
    ).filter(F.col("wt") > 0)
    cum = global_cumsum(base, ["h", "doc_id"], "wt", "cum_before")
    total = base.agg(F.sum("wt").alias("total_w"))
    sel = (
        cum.crossJoin(F.broadcast(total))
        .withColumn(
            "multiplicity",
            F.expr(
                f"(({_PPS_K} * (cum_before + wt)) div total_w)"
                f" - (({_PPS_K} * cum_before) div total_w)"
            ).cast("long"),
        )
        .filter(F.col("multiplicity") > 0)
    )
    return sel.select("doc_id", "wt", "multiplicity").orderBy("doc_id")


# ---------------------------------------------------------------------------
# q309 — Efraimidis-Spirakis weighted sample (A-ES): each doc gets key
# -ln(u)/w with a DETERMINISTIC md5 uniform u and weight w = token count;
# the k smallest keys are a weighted sample WITHOUT replacement — each
# doc's inclusion probability proportional to its weight among remaining
# picks. Complements q161's systematic PPS (fixed-interval, needs the
# global prefix sum): A-ES is ONE stateless map + top-k, mergeable
# across partitions/streams (min-heap union), the form a 1000-executor
# cluster or a Kafka consumer actually runs. u comes from 15 md5 hex
# digits -> the identical 60-bit integer in both engines, so the keys —
# and the sample — are hash-exact.
# ---------------------------------------------------------------------------

_AES_K = 50
_AES_U_SQL = "(({h}) + 0.5) / 1152921504606846976.0"  # (h + .5) / 2^60


@register(
    "q309_weighted_sample_aes",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             {_SQL_NWORDTOK} AS w,
             -ln({_AES_U_SQL.format(
                 h=sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", "1", 15)
             )}) / {_SQL_NWORDTOK} AS k
      FROM documents
      WHERE {_SQL_NWORDTOK} > 0
    )
    SELECT doc_id, source, CAST(w AS BIGINT) AS weight,
           {sql_round_det('k', 8)} AS aes_key
    FROM keyed
    ORDER BY {sql_round_det('k', 8)}, doc_id
    LIMIT {_AES_K}
    """,
    category="curation",
)
def q309_weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = F.size(word_tokens_regex("text")).cast("long")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    )
    u = (h.cast("double") + 0.5) / F.lit(float(1 << 60))
    keyed = docs.select(
        "doc_id",
        "source",
        w.alias("weight"),
        round_det(-F.log(u) / w, 8).alias("aes_key"),
    ).filter(F.col("weight") > 0)
    return keyed.orderBy("aes_key", "doc_id").limit(_AES_K)
