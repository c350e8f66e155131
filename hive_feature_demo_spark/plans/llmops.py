"""LLM-data-pipeline queries: dedup, text analysis, similarity, multimodal.

Each query pairs an operator from ``operators/{dedup,textops,similarity,
multimodal}`` with a DuckDB oracle implementing the identical closed-form
math (same hashes, same folds, same rounding), so even the "custom"
operators are hash-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import round_det, sql_round_det
from hive_feature_demo_spark.operators import dedup, multimodal, similarity, textops
from hive_feature_demo_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q30 — exact duplicate clusters on documents (hash-groupBy dedup).
# ---------------------------------------------------------------------------


@register(
    "q30_dedup_exact_clusters",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS digest,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY keeper_id
    """,
    category="llmops",
)
def q30_dedup_exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.exact_duplicate_clusters(docs, "doc_id", "text").orderBy("keeper_id")


@register(
    "q31_dedup_exact_survivors",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS digest
      FROM documents
    ), keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM keyed GROUP BY digest
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    ORDER BY d.doc_id
    """,
    category="llmops",
)
def q31_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        dedup.dedup_exact(docs, "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q32 — text quality scoring (length / stopword / token-shape heuristics).
# ---------------------------------------------------------------------------

_SW_SQL = "', '".join(textops.STOPWORDS)


@register(
    "q32_text_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), m AS (
      SELECT doc_id, lang,
             CAST(len(t) AS BIGINT) AS n_tokens,
             len(list_filter(t, x -> lower(x) IN ('{_SW_SQL}')))
               / CAST(greatest(len(t), 1) AS DOUBLE) AS stop_ratio,
             list_sum(list_transform(t, x -> CAST(length(x) AS BIGINT)))
               / CAST(greatest(len(t), 1) AS DOUBLE) AS avg_token_len
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           {sql_round_det('stop_ratio', 4)} AS stop_ratio,
           {sql_round_det('avg_token_len', 4)} AS avg_token_len,
           {sql_round_det('''0.5 * least(1.0, n_tokens / 100.0)
                 + 0.3 * (1.0 - stop_ratio)
                 + 0.2 * least(1.0, avg_token_len / 8.0)''', 4)} AS quality
    FROM m
    ORDER BY doc_id
    """,
    category="llmops",
)
def q32_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = textops.tokens("text")
    base = docs.select(
        "doc_id",
        "lang",
        textops.token_count("text").alias("n_tokens"),
        textops.stopword_ratio(t).alias("_stop"),
        textops.avg_token_len(t).alias("_avg_len"),
    )
    return base.select(
        "doc_id",
        "lang",
        "n_tokens",
        round_det("_stop", 4).alias("stop_ratio"),
        round_det("_avg_len", 4).alias("avg_token_len"),
        round_det(
            textops.quality_score(F.col("n_tokens"), F.col("_stop"), F.col("_avg_len")), 4
        ).alias("quality"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q33 — language-ID heuristic (marker-word argmax) vs the labeled lang.
# ---------------------------------------------------------------------------


def _lang_sql() -> str:
    score_exprs = []
    for lang in sorted(textops.LANG_MARKERS):
        markers = "', '".join(textops.LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(lt, x -> x IN ('{markers}'))) AS s_{lang}"
        )
    scores = ",\n             ".join(score_exprs)
    langs = sorted(textops.LANG_MARKERS)
    best = f"greatest({', '.join('s_' + lang for lang in langs)})"
    case = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs)
    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x)) AS lt
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {scores}
      FROM toks
    ), best AS (
      SELECT *, {best} AS best FROM scored
    )
    SELECT doc_id, lang,
           CASE WHEN best = 0 THEN 'und' {case} END AS predicted_lang,
           (CASE WHEN best = 0 THEN 'und' {case} END) = lang AS lang_match
    FROM best
    ORDER BY doc_id
    """


@register("q33_lang_id", oracle=_lang_sql(), category="llmops")
def q33_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pred = textops.predict_lang(textops.tokens("text"))
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("lang_match"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q34 — regex token statistics (BPE-ish word/punct split).
# ---------------------------------------------------------------------------


@register(
    "q34_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 \\t\\n\\r]'))
             AS BIGINT) AS n_tokens_regex,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_word_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           n_chars AS n_chars_declared
    FROM documents
    ORDER BY doc_id
    """,
    category="llmops",
)
def q34_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(textops.word_tokens_regex("text")).cast("long").alias("n_tokens_regex"),
        F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z0-9]+"), 0))
        .cast("long")
        .alias("n_word_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.col("n_chars").alias("n_chars_declared"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q35 — document fingerprints: normalized md5 + polynomial rolling hash.
# ---------------------------------------------------------------------------


@register(
    "q35_fingerprints",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS digest
      FROM documents
    )
    SELECT doc_id, digest,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(t, x -> CAST(ascii(x) * 31 + length(x) AS BIGINT))),
             (acc, v) -> (acc * 131 + v) % 1000000007
           ) AS roll_hash
    FROM toks
    ORDER BY doc_id
    """,
    category="llmops",
)
def q35_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textops.normalized_md5("text").alias("digest"),
        textops.rolling_hash(textops.tokens("text")).alias("roll_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q36 — brute-force cosine top-k neighbors (exact ANN baseline).
# ---------------------------------------------------------------------------


_COS_SQL = (
    "list_dot_product(q.qv, c.cv)"
    " / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv)))"
)


@register(
    "q36_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
    ), scored AS (
      SELECT q.query_id, c.neighbor_id,
             {sql_round_det(_COS_SQL, 4)} AS cos_sim
      FROM q, c WHERE q.query_id != c.neighbor_id
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="llmops",
)
def q36_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


# ---------------------------------------------------------------------------
# q37 — per-label embedding stats (norms via array folds).
# ---------------------------------------------------------------------------


_NORM_SQL = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"


@register(
    "q37_embedding_stats",
    oracle=f"""
    WITH n AS (
      SELECT label, {_NORM_SQL} AS nrm FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           {sql_round_det(f'CAST(SUM(CAST(nrm AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*)', 4)}
             AS avg_norm,
           {sql_round_det('MIN(nrm)', 4)} AS min_norm,
           {sql_round_det('MAX(nrm)', 4)} AS max_norm
    FROM n
    GROUP BY label
    ORDER BY label
    """,
    category="llmops",
)
def q37_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    n = similarity.norm(F.col("embedding"))
    return (
        emb.select("label", n.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            round_det(
                F.sum(F.col("nrm").cast("decimal(25,10)")).cast("double") / F.count("*"), 4
            ).alias("avg_norm"),
            round_det(F.min("nrm"), 4).alias("min_norm"),
            round_det(F.max("nrm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q38 — multimodal binary-column plumbing: sizes + digests of blob payloads.
# ---------------------------------------------------------------------------


@register(
    "q38_asset_digests",
    oracle="""
    SELECT doc_id AS asset_id,
           source,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           sha256(text) AS sha256
    FROM documents
    ORDER BY asset_id
    """,
    category="llmops",
)
def q38_asset_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    assets = multimodal.assets_from_documents(docs)
    return multimodal.asset_digests(assets).orderBy("asset_id")
