"""Corpus-statistics query plans: TF-IDF and n-gram frequency.

Generalizes the reference's text-generation-adjacent data handling (the
reference has no corpus analytics; capability class from SURVEY.md §2.3
"Text analysis") into exact, hash-checked DataFrame formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import sql_round_det
from hive_feature_demo_spark.operators import textops
from hive_feature_demo_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q64 — top-3 TF-IDF terms per document (explode/groupBy formulation).
# ---------------------------------------------------------------------------


@register(
    "q64_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS doc_freq FROM toks GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             {sql_round_det(
                 "tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.doc_freq AS DOUBLE))", 6
             )} AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
      FROM scored
    )
    SELECT doc_id, term, tf, tfidf, rank
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
    category="textstats",
)
def q64_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return textops.tfidf_topk(docs, "doc_id", "text", k=3)


# ---------------------------------------------------------------------------
# q65 — global top-20 bigrams (adjacent word pairs).
# ---------------------------------------------------------------------------


@register(
    "q65_bigram_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      FROM documents
    ), big AS (
      SELECT unnest(
        [ts[i] || ' ' || ts[i + 1] FOR i IN generate_series(1, len(ts) - 1)]
      ) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS n_occurrences
    FROM big
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram
    LIMIT 20
    """,
    category="textstats",
)
def q65_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(textops.bigrams(textops.word_tokens_lower("text"))).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q149 — per-source token entropy + KL divergence from the corpus
# distribution: the drift/contrast statistic for monitoring what a source
# contributes to the training mixture. Two partial-agg shuffles (per
# (source,term) counts, then per-source fold); the corpus marginals are a
# broadcast-sized table (|vocab| rows). Per-term contributions quantize to
# 1e-12 fixed point BEFORE summing, so the fold is an exact integer sum —
# order-independent across engines and partitionings (Σ of doubles is
# not).
# ---------------------------------------------------------------------------


@register(
    "q149_source_token_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), st AS (
      SELECT source, term, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), s_tot AS (
      SELECT source, SUM(c) AS tot FROM st GROUP BY 1
    ), corpus AS (
      SELECT term, SUM(c) AS cc FROM st GROUP BY 1
    ), c_tot AS (
      SELECT SUM(cc) AS ctot FROM corpus
    ), contrib AS (
      SELECT st.source,
             CAST(FLOOR(-(st.c / s_tot.tot) * ln(st.c / s_tot.tot) * 1e12 + 0.5)
               AS BIGINT) AS h_units,
             CAST(FLOOR((st.c / s_tot.tot)
                        * ln((st.c / s_tot.tot) / (corpus.cc / c_tot.ctot))
                        * 1e12 + 0.5) AS BIGINT) AS kl_units
      FROM st
      JOIN s_tot USING (source)
      JOIN corpus USING (term)
      CROSS JOIN c_tot
    )
    SELECT source, COUNT(*) AS n_terms,
           CAST(SUM(h_units) AS DOUBLE) / 1e12 AS entropy_nats,
           CAST(SUM(kl_units) AS DOUBLE) / 1e12 AS kl_from_corpus
    FROM contrib GROUP BY source ORDER BY source
    """,
    category="textstats",
)
def q149_source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(textops.word_tokens_lower("text")).alias("term")
    )
    st = toks.groupBy("source", "term").agg(F.count("*").alias("c"))
    s_tot = st.groupBy("source").agg(F.sum("c").alias("tot"))
    corpus = st.groupBy("term").agg(F.sum("c").alias("cc"))
    c_tot = corpus.agg(F.sum("cc").alias("ctot"))
    p = F.col("c") / F.col("tot")
    q = F.col("cc") / F.col("ctot")
    contrib = (
        st.join(s_tot, "source")
        .join(F.broadcast(corpus), "term")
        .crossJoin(F.broadcast(c_tot))
        .select(
            "source",
            F.floor(-p * F.log(p) * 1e12 + F.lit(0.5)).cast("long").alias("h_units"),
            F.floor(p * F.log(p / q) * 1e12 + F.lit(0.5))
            .cast("long")
            .alias("kl_units"),
        )
    )
    return (
        contrib.groupBy("source")
        .agg(
            F.count("*").alias("n_terms"),
            (F.sum("h_units").cast("double") / 1e12).alias("entropy_nats"),
            (F.sum("kl_units").cast("double") / 1e12).alias("kl_from_corpus"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q206 — PMI token associations: pointwise mutual information
# ln(N * df_xy / (df_x * df_y)) for within-document token pairs, the
# collocation/association measure feeding phrase mining and topic seeds.
# Pairs come from a doc_id-keyed self-join of the per-doc DISTINCT token
# sets with t1 < t2 — bounded by (tokens per doc)^2 after a document-
# frequency floor (>= 5% of docs) prunes the long tail; at 100 TB the
# floor is what keeps the pair space vocabulary-bounded rather than
# corpus-bounded. PMI is rounded to 6dp (ln on identical doubles on both
# engines; same discipline as the TF-IDF oracle).
# ---------------------------------------------------------------------------


@register(
    "q206_pmi_associations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
               AS term
      FROM documents
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    df AS (
      SELECT term, COUNT(*) AS d FROM toks GROUP BY term
      HAVING COUNT(*) >= (SELECT n_docs FROM n) * 0.05
    ), freq_toks AS (
      SELECT t.doc_id, t.term, df.d FROM toks t JOIN df USING (term)
    ), pairs AS (
      SELECT a.term AS t1, b.term AS t2,
             ANY_VALUE(a.d) AS d1, ANY_VALUE(b.d) AS d2,
             COUNT(*) AS d12
      FROM freq_toks a JOIN freq_toks b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
    )
    SELECT t1, t2, d12,
           {sql_round_det(
               'ln(CAST((SELECT n_docs FROM n) AS DOUBLE) * d12 / (d1 * d2))', 6
           )} AS pmi
    FROM pairs
    ORDER BY pmi DESC, t1, t2
    LIMIT 30
    """,
    category="textstats",
)
def q206_pmi_associations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.functions.numeric import round_det

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()  # one driver scalar (metadata-cheap)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
            )
        ).alias("term"),
    )
    df_counts = (
        toks.groupBy("term")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= n_docs * 0.05)
    )
    # materialize the df-floored token stream once: both self-join sides
    # (and the df counts feeding them) otherwise re-run the corpus-wide
    # explode — the dominant cost at scale — once per reference (8 scans
    # of documents observed in the naive plan)
    freq = toks.join(F.broadcast(df_counts), "term").localCheckpoint(eager=True)
    a = freq.select("doc_id", F.col("term").alias("t1"), F.col("d").alias("d1"))
    b = freq.select(
        F.col("doc_id").alias("doc_b"),
        F.col("term").alias("t2"),
        F.col("d").alias("d2"),
    )
    pairs = (
        a.join(b, (F.col("doc_id") == F.col("doc_b")) & (F.col("t1") < F.col("t2")))
        .groupBy("t1", "t2")
        .agg(
            F.any_value("d1").alias("d1"),
            F.any_value("d2").alias("d2"),
            F.count("*").alias("d12"),
        )
    )
    return (
        pairs.select(
            "t1",
            "t2",
            "d12",
            round_det(
                F.log(
                    F.lit(float(n_docs))
                    * F.col("d12")
                    / (F.col("d1") * F.col("d2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "t1", "t2")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# q213 — population stability index (PSI): distribution drift of document
# length between two sources over global length deciles — the monitoring
# metric that catches a silently-shifted ingest feed. Deciles come from a
# global ntile over (n_chars, doc_id) (ties broken deterministically);
# Laplace smoothing (n+1)/(N+10) keeps every bucket strictly positive in
# EXACTLY the same arithmetic on both engines, so the ln-based
# contributions hash-match after 6dp rounding. Scale: at 100 TB the
# global ntile becomes the q116/q155 distributed equi-depth boundary
# computation; the per-bucket counting and PSI algebra are unchanged.
# ---------------------------------------------------------------------------


@register(
    "q213_distribution_drift_psi",
    oracle=f"""
    WITH bucketed AS (
      SELECT source,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    ), counts AS (
      SELECT bucket,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS n_b
      FROM bucketed GROUP BY bucket
    ), tot AS (
      SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts
    )
    SELECT c.bucket,
           CAST(c.n_a AS BIGINT) AS n_src0,
           CAST(c.n_b AS BIGINT) AS n_src1,
           {sql_round_det(
               "(CAST(c.n_a + 1 AS DOUBLE) / (t.ta + 10)"
               " - CAST(c.n_b + 1 AS DOUBLE) / (t.tb + 10))"
               " * ln((CAST(c.n_a + 1 AS DOUBLE) / (t.ta + 10))"
               " / (CAST(c.n_b + 1 AS DOUBLE) / (t.tb + 10)))", 6)}
             AS psi_contribution
    FROM counts c CROSS JOIN tot t
    ORDER BY c.bucket
    """,
    category="textstats",
)
def q213_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hive_feature_demo_spark.functions.numeric import round_det

    d = table(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")
    bucketed = d.withColumn(
        "bucket", F.ntile(10).over(Window.orderBy("n_chars", "doc_id"))
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    p = (F.col("n_a") + 1).cast("double") / (F.col("ta") + 10)
    q = (F.col("n_b") + 1).cast("double") / (F.col("tb") + 10)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("n_a").cast("long").alias("n_src0"),
            F.col("n_b").cast("long").alias("n_src1"),
            round_det((p - q) * F.log(p / q), 6).alias("psi_contribution"),
        )
        .orderBy("bucket")
    )
