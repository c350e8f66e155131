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
from hive_feature_demo_spark.functions import numeric
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
# q39 — exact n-gram Jaccard near-duplicate pairs (inverted shingle index).
# ---------------------------------------------------------------------------

_SHINGLES_CTE = """
    toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS MATERIALIZED (
      -- MATERIALIZED (pure evaluation hint, result-identical): every
      -- consumer references sh 2-3x (sizes + the pair self-join); DuckDB
      -- inlines plain CTEs and would re-tokenize the corpus per reference.
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 2),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM toks WHERE len(t) >= 3
    )
"""


@register(
    "q39_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS nc
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(nc AS DOUBLE) / (sa.ns + sb.ns - nc) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(nc AS DOUBLE) / (sa.ns + sb.ns - nc) >= 0.5
    ORDER BY id_a, id_b
    """,
    category="llmops",
)
def q39_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# q45/q46 — MinHash signatures and the LSH near-dup pipeline. The oracle
# re-derives the identical closed-form hashes (md5-nibble fold == conv hex,
# a*(x mod p)+b mod p), so even the LSH internals are hash-checked.
# ---------------------------------------------------------------------------

#: unreduced 60-bit md5-nibble fold — the oracle spelling of the engine's
#: dedup._shingle_int (conv(substring(md5,1,15),16,10)); the MinHash x is
#: this % MINHASH_PRIME, and the hashed verify index (`shi`) is this raw.
_XI_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(generate_series(1, 15),"
    " i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), i, 1)) - 1 AS BIGINT))),"
    " (acc, v) -> acc * 16 + v)"
)

_XM_SQL = f"(({_XI_SQL}) % {dedup.MINHASH_PRIME})"

_MH_COLS_SQL = ",\n             ".join(
    f"MIN(({a} * xm + {b}) % {dedup.MINHASH_PRIME}) AS mh_{i}"
    for i, (a, b) in enumerate(dedup.minhash_params(16))
)

_SIG_CTE = f"""
    {_SHINGLES_CTE},
    shi AS (SELECT doc_id, {_XI_SQL} AS shingle FROM sh),
    shi_d AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM shi),
    x AS (SELECT doc_id, shingle % {dedup.MINHASH_PRIME} AS xm FROM shi),
    sig AS MATERIALIZED (
      SELECT doc_id,
             {_MH_COLS_SQL}
      FROM x GROUP BY doc_id
    )
"""


@register(
    "q45_minhash_signatures",
    oracle=f"""
    WITH {_SIG_CTE}
    SELECT * FROM sig ORDER BY doc_id
    """,
    category="llmops",
)
def q45_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, "doc_id", "text", n=3, n_perm=16).orderBy(
        "doc_id"
    )


_BUCKETS_SQL = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {bi} AS band, md5(concat_ws('_', "
    + ", ".join(f"mh_{bi * 4 + r}" for r in range(4))
    + ")) AS bd FROM sig"
    for bi in range(4)
)


@register(
    "q46_minhash_near_dups",
    oracle=f"""
    WITH {_SIG_CTE},
    buckets AS (
{_BUCKETS_SQL}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bd = b.bd
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS nc
      FROM shi_d a JOIN shi_d b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT id_a, id_b, CAST(nc AS DOUBLE) / (sa.ns + sb.ns - nc) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(nc AS DOUBLE) / (sa.ns + sb.ns - nc) >= 0.5
    )
    SELECT e.id_a, e.id_b, e.jaccard
    FROM exact e JOIN cands c ON e.id_a = c.id_a AND e.id_b = c.id_b
    ORDER BY e.id_a, e.id_b
    """,
    category="llmops",
)
def q46_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4, threshold=0.5
    ).orderBy("id_a", "id_b")


#: shared SimHash fingerprint chain (q47/q109): md5-nibble bit votes ->
#: 16-hex-char fingerprint per doc.
_SIMHASH_CTE = '''    toks AS (
      SELECT doc_id,
             unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
      FROM documents
    ), nibbed AS (
      SELECT doc_id,
             list_transform(generate_series(1, 16),
               i -> strpos('0123456789abcdef', substring(md5(tok), i, 1)) - 1) AS nibs
      FROM toks
    ), votes AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(0, 63),
               j -> {'j': j,
                     'vote': CASE WHEN ((nibs[(j // 4) + 1] >> (j % 4)) & 1) = 1
                             THEN 1 ELSE -1 END})) AS v
      FROM nibbed
    ), bits AS (
      SELECT doc_id, v.j AS j,
             CASE WHEN SUM(v.vote) > 0 THEN 1 ELSE 0 END AS bit
      FROM votes GROUP BY doc_id, v.j
    ), nibs2 AS (
      SELECT doc_id, j // 4 AS nib_idx, SUM(bit << (j % 4)) AS nib_val
      FROM bits GROUP BY 1, 2
    ),
    fp AS (
      SELECT doc_id,
             string_agg(substring('0123456789abcdef', CAST(nib_val AS INT) + 1, 1),
                        '' ORDER BY nib_idx) AS simhash
      FROM nibs2
      GROUP BY doc_id
    )'''


# ---------------------------------------------------------------------------
# q47 — SimHash fingerprints (md5-nibble bit votes), hash-checked.
# ---------------------------------------------------------------------------


@register(
    "q47_simhash",
    oracle=f"""
    WITH {_SIMHASH_CTE}
    SELECT doc_id, simhash FROM fp
    ORDER BY doc_id
    """,
    category="llmops",
)
def q47_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.simhash64(docs, "doc_id", "text").orderBy("doc_id")


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
# q59 — grouped-map pandas UDF (applyInPandas): per-user event features
# computed in Python, hash-checked against a pure-SQL oracle. Demonstrates
# the Arrow-batched python path; money math in integer cents so the pandas
# computation is exact (and so order-of-arrival inside a group is moot).
# ---------------------------------------------------------------------------


@register(
    "q59_per_user_features",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), top_type AS (
      SELECT user_id, event_type AS top_event_type
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
            FROM counts)
      WHERE rn = 1
    ), stats AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS total_value
      FROM events GROUP BY user_id
    )
    SELECT s.user_id, s.n_events, s.total_value,
           s.total_value / s.n_events AS avg_value,
           t.top_event_type
    FROM stats s JOIN top_type t USING (user_id)
    ORDER BY s.user_id
    """,
    category="llmops",
)
def q59_per_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    e = table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")

    def features(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 100).round().astype("int64")  # exact 2dp money
        total = cents.sum() / 100.0
        counts = pdf.groupby("event_type").size()
        top = counts[counts == counts.max()].index.min()  # tie -> lexicographic
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [total],
                "avg_value": [total / len(pdf)],
                "top_event_type": [top],
            }
        )

    return (
        e.groupBy("user_id")
        .applyInPandas(
            features,
            schema="user_id long, n_events long, total_value double, "
            "avg_value double, top_event_type string",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q60 — the generalized LLM operator in deterministic mode: prompt
# rendering + schema-validated parse + fallback (reference tools.py pattern).
# ---------------------------------------------------------------------------


@register(
    "q60_llm_generate_deterministic",
    oracle="""
    SELECT doc_id,
           concat('Summarize document ', CAST(doc_id AS VARCHAR), ' from ', source)
             AS prompt,
           concat('[', lang, '] ', source, ' doc ', CAST(doc_id AS VARCHAR),
                  ': ', CAST(n_chars AS VARCHAR), ' chars') AS summary,
           TRUE AS used_fallback
    FROM documents
    ORDER BY doc_id
    """,
    category="llmops",
)
def q60_llm_generate_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.llm import llm_generate

    docs = table(spark, sf_dir, "documents")
    out = llm_generate(
        docs,
        prompt_template="Summarize document {doc_id} from {source}",
        reply_schema="summary string",
        fallback={
            "summary": F.format_string(
                "[%s] %s doc %s: %s chars",
                F.col("lang"), F.col("source"), F.col("doc_id"), F.col("n_chars"),
            )
        },
    )
    return out.select("doc_id", "prompt", "summary", "used_fallback").orderBy("doc_id")


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


# ---------------------------------------------------------------------------
# q86 — transitive near-dup CLUSTERS: the SCALE-PATH pair set (banded MinHash
# candidates -> exact Jaccard verify, q46's edge set) closed under
# transitivity via distributed min-label propagation
# (operators/dedup.connected_components). Pairs alone under-dedup: A~B~C
# must collapse to one survivor even when A!~C. Candidates come from the
# (band, band_digest) bucket join — never the corpus-wide shingle self-join,
# whose hot-shingle Σc² cost is exactly what banding avoids at 100 TB. The
# oracle replays banding + verify + recursive closure with identical hashes.
# ---------------------------------------------------------------------------

#: shared recursive-closure chain over the LSH-verified pair set (q86/q95):
#: banded buckets -> candidate pairs -> exact-Jaccard verify on candidates
#: only -> symmetric edges -> min-label transitive closure -> components.
_LSH_CLUSTERS_CTE = f"""    buckets AS MATERIALIZED (
{_BUCKETS_SQL}
    ),
    cands AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bd = b.bd
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    common AS MATERIALIZED (
      SELECT c.id_a, c.id_b, COUNT(*) AS nc
      FROM cands c
      JOIN shi_d a ON a.doc_id = c.id_a
      JOIN shi_d b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(nc AS DOUBLE) / (sa.ns + sb.ns - nc) >= 0.5
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node)"""


@register(
    "q86_near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE},
{_LSH_CLUSTERS_CTE}
    SELECT cluster,
           COUNT(*) AS n_members,
           MIN(node) AS survivor_id,
           string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
    FROM comp
    GROUP BY cluster
    ORDER BY cluster
    """,
    category="llmops",
)
def q86_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # adaptive exact-dup representative collapse before shingling (r5
    # verdict item 1): result-identical to pairs->CC on the full corpus
    # (the oracle still replays the uncollapsed formulation); when the
    # digest stats show real exact-dup mass, it never reaches the
    # bucket-join / verify / CC stages
    comp = dedup.minhash_near_dup_clusters(
        docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4,
        threshold=0.5, collapse_exact="auto",
    )
    return (
        comp.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.min("node").alias("survivor_id"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("node")), lambda x: x.cast("string")
                ),
            ).alias("members"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# q95 — the dedup END USE: the kept corpus. Drop every cluster member
# except the survivor (min doc_id), via broadcast anti-join of the q86
# cluster assignment against the documents table.
# ---------------------------------------------------------------------------


@register(
    "q95_dedup_kept_corpus",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE},
{_LSH_CLUSTERS_CTE},
    drops AS (
      SELECT c.node FROM comp c
      JOIN (SELECT cluster, MIN(node) AS survivor FROM comp GROUP BY cluster) s
        ON c.cluster = s.cluster
      WHERE c.node != s.survivor
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM drops)
    ORDER BY d.doc_id
    """,
    category="llmops",
)
def q95_dedup_kept_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    comp = dedup.minhash_near_dup_clusters(
        docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4,
        threshold=0.5, collapse_exact="auto",
    )
    survivors = comp.groupBy("cluster").agg(F.min("node").alias("survivor"))
    drops = (
        comp.join(survivors, "cluster")
        .filter(F.col("node") != F.col("survivor"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        docs.join(F.broadcast(drops), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q109 — SimHash near-pairs: banded candidates (pigeonhole: Hamming < 4
# implies an exact match on one of 4 bands) + exact nibble-Hamming verify.
# Completes the SimHash dedup story (q47 computes the fingerprints).
# ---------------------------------------------------------------------------


@register(
    "q109_simhash_near_pairs",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    banded AS (
      SELECT doc_id, simhash, t.b AS band, substring(simhash, t.b * 4 + 1, 4) AS bh
      FROM fp, generate_series(0, 3) t(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS h_a, b.simhash AS h_b
      FROM banded a JOIN banded b USING (band, bh)
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, h_a, h_b,
           CAST(list_sum(list_transform(generate_series(1, 16),
             i -> bit_count(xor(
               CAST(strpos('0123456789abcdef', substring(h_a, i, 1)) - 1 AS BIGINT),
               CAST(strpos('0123456789abcdef', substring(h_b, i, 1)) - 1 AS BIGINT)))))
             AS BIGINT) AS hamming
    FROM cand
    WHERE list_sum(list_transform(generate_series(1, 16),
             i -> bit_count(xor(
               CAST(strpos('0123456789abcdef', substring(h_a, i, 1)) - 1 AS BIGINT),
               CAST(strpos('0123456789abcdef', substring(h_b, i, 1)) - 1 AS BIGINT))))) <= 3
    ORDER BY id_a, id_b
    """,
    category="llmops",
)
def q109_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    fp = dedup.simhash64(docs, "doc_id", "text")
    return dedup.simhash_near_pairs(fp, "doc_id", "simhash", max_hamming=3, n_bands=4)


# ---------------------------------------------------------------------------
# q127 — the SAME clustering as q86 computed by the large-star/small-star
# algorithm (O(log n) rounds vs diameter rounds — the 100 TB path when dup
# chains run long). Identical oracle as q86: both implementations must
# hash-match the recursive-closure ground truth, which is the strongest
# statement of their equivalence at the query level.
# ---------------------------------------------------------------------------


@register(
    "q127_near_dup_clusters_altstar",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE},
{_LSH_CLUSTERS_CTE}
    SELECT cluster,
           COUNT(*) AS n_members,
           MIN(node) AS survivor_id,
           string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
    FROM comp
    GROUP BY cluster
    ORDER BY cluster
    """,
    category="llmops",
)
def q127_near_dup_clusters_altstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4, threshold=0.5
    )
    comp = dedup.connected_components_alternating(pairs)
    return (
        comp.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.min("node").alias("survivor_id"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("node")), lambda x: x.cast("string")
                ),
            ).alias("members"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# q132 — the composed CORPUS-CURATION pipeline (the end-to-end shape a
# training-data run executes): exact-dedup survivors -> language filter ->
# quality threshold -> per-source yield report. Each stage is an operator
# already verified in isolation (q31 dedup, q33 lang, q32 quality); this
# query verifies their COMPOSITION — one plan, one scan, filters fused by
# Catalyst, aggregation partial-merged. The quality cut compares the
# ROUNDED score (round_det 4dp) so the boundary is engine-exact.
# ---------------------------------------------------------------------------

_CURATION_QUALITY = """0.5 * least(1.0, n_tokens / 100.0)
                 + 0.3 * (1.0 - (n_stop / CAST(greatest(n_tokens, 1) AS DOUBLE)))
                 + 0.2 * least(1.0, (len_sum / CAST(greatest(n_tokens, 1) AS DOUBLE)) / 8.0)"""


@register(
    "q132_corpus_curation",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS digest
      FROM documents
    ), keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM keyed GROUP BY digest
    ), survivors AS (
      SELECT d.* FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
      WHERE d.lang = 'en'
    ), toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM survivors
    ), m AS (
      SELECT doc_id, source,
             CAST(len(t) AS BIGINT) AS n_tokens,
             len(list_filter(t, x -> lower(x) IN ('{_SW_SQL}'))) AS n_stop,
             list_sum(list_transform(t, x -> CAST(length(x) AS BIGINT))) AS len_sum
      FROM toks
    ), scored AS (
      SELECT doc_id, source, n_tokens,
             {sql_round_det(_CURATION_QUALITY, 4)} AS quality
      FROM m
    )
    SELECT source,
           COUNT(*) AS n_docs,
           -- DuckDB SUM(BIGINT) returns HUGEINT; cast back so the driver's
           -- type canonicalization can't diverge from Spark's BIGINT
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           -- mean quality as a 1e4-scaled integer (round-half-up), so the
           -- comparison surface holds no doubles at all
           CAST(FLOOR((2 * SUM(CAST(FLOOR(quality * 10000 + 0.5) AS BIGINT)) + COUNT(*))
                / (2 * COUNT(*))) AS BIGINT) AS avg_quality_e4
    FROM scored
    WHERE quality >= 0.5
    GROUP BY source
    ORDER BY source
    """,
    category="llmops",
)
def q132_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    survivors = dedup.dedup_exact(docs, "doc_id", "text").filter(F.col("lang") == "en")
    t = textops.tokens("text")
    scored = survivors.select(
        "doc_id",
        "source",
        textops.token_count("text").alias("n_tokens"),
        round_det(
            textops.quality_score(
                textops.token_count("text"),
                textops.stopword_ratio(t),
                textops.avg_token_len(t),
            ),
            4,
        ).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    # 4dp-rounded qualities scaled to integers sum exactly, so the mean is
    # independent of row/partition order (float SUM is not); the mean is
    # then emitted as a 1e4-scaled BIGINT — the whole comparison surface is
    # integral, immune to cross-engine float/HUGEINT formatting drift.
    units = F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("long")
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(units).alias("_q_e4_sum"),
        )
        .withColumn(
            "avg_quality_e4",
            F.floor(
                (2 * F.col("_q_e4_sum") + F.col("n_docs"))
                / (2 * F.col("n_docs"))
            ).cast("long"),
        )
        .drop("_q_e4_sum")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q133 — BPE merge statistics: corpus-wide frequency of adjacent character
# pairs (what byte-pair-encoding training maximizes at each merge step; a
# full BPE run iterates this exact aggregation after each merge). Top-30
# with full tiebreaks. Scan + one map-side-combined shuffle keyed on
# ~|alphabet|^2 pairs — trivially 100 TB-safe.
# ---------------------------------------------------------------------------


@register(
    "q133_bpe_pair_counts",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    t -> t <> '')) AS word
      FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                    i -> substring(word, CAST(i AS INT), 2))) AS pair
      FROM toks WHERE length(word) >= 2
    )
    SELECT pair, COUNT(*) AS n_occurrences
    FROM pairs
    GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 30
    """,
    category="llmops",
)
def q133_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        textops.char_pair_counts(docs, "text")
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# q157 — near-dup-aware diversity downsampling: cap how many documents any
# one SimHash-prefix bucket (first 16 fingerprint bits) contributes to the
# kept corpus, with deterministic survivors (lowest doc_id). Bounds the
# contribution of over-represented content regions WITHOUT enumerating
# near-dup pairs or building clusters: one fingerprint pass (q47's chain)
# + one window shuffle partitioned by bucket. The cheap first line of
# defense before MinHash-LSH pair dedup at 100 TB — O(corpus), not
# O(candidate pairs), and the per-bucket window never concentrates (the
# 16-bit prefix spreads documents over 65k partitions; a pathological
# single-bucket corpus degrades to one partition's sort, the usual skew
# caveat).
# ---------------------------------------------------------------------------


@register(
    "q157_simhash_diversity_downsample",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    b AS (
      SELECT doc_id, substring(simhash, 1, 4) AS bucket FROM fp
    ), r AS (
      SELECT bucket, doc_id,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY bucket) AS bucket_size
      FROM b
    )
    SELECT bucket, doc_id, CAST(rk AS BIGINT) AS rk,
           CAST(bucket_size AS BIGINT) AS bucket_size
    FROM r WHERE rk <= 3
    ORDER BY bucket, doc_id
    """,
    category="llmops",
)
def q157_simhash_diversity_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    fp = dedup.simhash64(docs, "doc_id", "text")
    b = fp.select("doc_id", F.substring("simhash", 1, 4).alias("bucket"))
    w = Window.partitionBy("bucket")
    r = b.select(
        "bucket",
        "doc_id",
        F.row_number().over(w.orderBy("doc_id")).cast("long").alias("rk"),
        F.count("*").over(w).cast("long").alias("bucket_size"),
    )
    return r.filter(F.col("rk") <= 3).orderBy("bucket", "doc_id")


# ---------------------------------------------------------------------------
# q304 — near-dup-aware train/valid/test split: q137's hash split assigns
# each doc independently, so two near-duplicates can straddle the
# train/valid boundary — silent eval contamination that n-gram
# decontamination (q138) only catches for exact spans. The fix every
# production pipeline ships: split by the CLUSTER representative, not the
# doc — the q86 connected component's min id (the doc itself for
# singletons) — so a whole near-dup family lands in ONE split by
# construction. Scale shape: the cluster map is a LEFT join of documents
# against the (tiny) component assignment; the split is then the same
# narrow hash map as q137. Cross-split leakage is structurally zero —
# asserted in tests/test_curation.py.
# ---------------------------------------------------------------------------

_H4_REP = numeric.sql_hex_to_int("md5(CAST(rep AS VARCHAR))", "1", 4)


@register(
    "q304_cluster_aware_split",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE},
{_LSH_CLUSTERS_CTE},
    rep AS (
      SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS rep,
             (c.node IS NOT NULL) AS in_cluster
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT CASE WHEN {_H4_REP} % 100 < 80 THEN 'train'
                WHEN {_H4_REP} % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN in_cluster THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_members,
           COUNT(DISTINCT rep) AS n_groups
    FROM rep
    GROUP BY 1 ORDER BY 1
    """,
    category="curation",
)
def q304_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators import curation as cur

    docs = table(spark, sf_dir, "documents")
    comp = dedup.minhash_near_dup_clusters(
        docs, "doc_id", "text", n=3, n_perm=16, bands=4, rows=4,
        threshold=0.5, collapse_exact="auto",
    ).select(F.col("node").alias("doc_id"), "cluster")
    rep = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster", "doc_id").alias("rep"),
        F.col("cluster").isNotNull().alias("in_cluster"),
    )
    return (
        rep.select(cur.assign_split("rep", 80, 10).alias("split"), "rep", "in_cluster")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("in_cluster"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_members"),
            F.countDistinct("rep").alias("n_groups"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q321 — LSH banding-theory calibration: for every shingle-sharing doc
# pair, its exact 3-gram Jaccard (inverted-index counts, never
# all-pairs) and whether the MinHash banding (16 perms, 4 bands x 4
# rows) actually put the pair in a shared bucket; per 0.1-wide Jaccard
# bucket, the empirical detection share vs the theoretical S-curve
# P(detect | s) = 1 - (1 - s^4)^4 at the bucket midpoint. THE
# calibration a dedup deployment runs before trusting a banding config:
# if the empirical column sags under the theory column, the permutation
# family is broken; if the low-s buckets light up, the verify filter is
# mis-thresholded. Detection flags are exact integers; theory values
# are literals — hash-exact end to end.
# ---------------------------------------------------------------------------

_Q321_THEORY = {
    b: 1.0 - (1.0 - ((b + 0.5) / 10.0) ** 4) ** 4 for b in range(10)
}
_Q321_THEORY_SQL = " ".join(
    f"WHEN jb = {b} THEN {int(v * 10000)}" for b, v in _Q321_THEORY.items()
)


@register(
    "q321_lsh_banding_calibration",
    oracle=f"""
    WITH {_SIG_CTE},
    buckets AS (
{_BUCKETS_SQL}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bd = b.bd AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS nc
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             LEAST(9, CAST(FLOOR(10.0 * c.nc / (sa.ns + sb.ns - c.nc)) AS INT))
               AS jb,
             CASE WHEN cd.id_a IS NOT NULL THEN 1 ELSE 0 END AS detected
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      LEFT JOIN cands cd ON cd.id_a = c.id_a AND cd.id_b = c.id_b
    )
    SELECT jb AS jaccard_bucket,
           COUNT(*) AS n_pairs,
           CAST(SUM(detected) AS BIGINT) AS n_detected,
           CAST(FLOOR(10000.0 * SUM(detected) / COUNT(*)) AS BIGINT)
             AS detect_bps,
           CAST(CASE {_Q321_THEORY_SQL} END AS BIGINT) AS theory_bps
    FROM scored
    GROUP BY jb
    ORDER BY jb
    """,
    category="llmops",
)
def q321_lsh_banding_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = dedup.shingle_index(docs, "doc_id", "text", 3).localCheckpoint(eager=True)
    sig = dedup.minhash_signatures_from_index(sh, "doc_id", 16)
    cands = dedup.lsh_candidate_pairs(sig, "doc_id", bands=4, rows=4).withColumn(
        "detected_flag", F.lit(1)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("ns"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("nc"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("ns").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("ns").alias("nb"))
    jb = F.least(
        F.lit(9),
        F.floor(
            10.0 * F.col("nc") / (F.col("na") + F.col("nb") - F.col("nc"))
        ).cast("int"),
    )
    scored = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .join(cands, ["id_a", "id_b"], "left")
        .select(
            jb.alias("jb"),
            F.coalesce("detected_flag", F.lit(0)).alias("detected"),
        )
    )
    theory = F.lit(None).cast("long")
    expr = None
    for bkt, v in _Q321_THEORY.items():
        c = F.when(F.col("jaccard_bucket") == bkt, F.lit(int(v * 10000)))
        expr = c if expr is None else expr.when(
            F.col("jaccard_bucket") == bkt, F.lit(int(v * 10000))
        )
    return (
        scored.groupBy(F.col("jb").alias("jaccard_bucket"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("detected").cast("long").alias("n_detected"),
            F.floor(10000.0 * F.sum("detected") / F.count("*"))
            .cast("long")
            .alias("detect_bps"),
        )
        .withColumn("theory_bps", expr.cast("long"))
        .orderBy("jaccard_bucket")
    )


# ---------------------------------------------------------------------------
# q326 — the CAPPED LSH candidate path (r6 verdict ask #1): exercises
# lsh_candidate_pairs(max_bucket_width=2) — the hot-bucket escape hatch
# that bounds the band-bucket self-join at cap·corpus instead of
# Σ bucket² — and pins its EXACT deterministic selection (the min-id
# prefix of each (band, digest) bucket in doc_id order) against a DuckDB
# replay of the same row_number truncation. The cap genuinely bites on
# this corpus: 25 exact candidate pairs shrink to 23 at sf0.01 and
# 276 → 238 at sf0.1, so a tie-break or ordering regression in the
# capped path cannot hash-match. q86/q95/q304 keep replaying the exact
# (uncapped) variant; this query is the capped path's own oracle gate.
# ---------------------------------------------------------------------------

_Q326_CAP = 2


@register(
    "q326_capped_lsh_candidates",
    oracle=f"""
    WITH {_SIG_CTE},
    buckets AS (
{_BUCKETS_SQL}
    ),
    capped AS (
      SELECT doc_id, band, bd FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY band, bd
                                     ORDER BY doc_id) AS rk
        FROM buckets
      ) WHERE rk <= {_Q326_CAP}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM capped a JOIN capped b ON a.band = b.band AND a.bd = b.bd
    WHERE a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
    category="llmops",
)
def q326_capped_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(docs, "doc_id", "text", n=3, n_perm=16)
    return dedup.lsh_candidate_pairs(
        sig, "doc_id", bands=4, rows=4, max_bucket_width=_Q326_CAP
    ).orderBy("id_a", "id_b")
