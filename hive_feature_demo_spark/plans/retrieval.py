"""Lexical + hybrid retrieval: BM25 ranked search over an inverted index
(q311) and reciprocal-rank-fusion of lexical and dense rankings (q312).

Completes the retrieval story alongside the dense-ANN family (q36/q61/
q63/...): a training-data pipeline retrieves with BOTH signals — sparse
lexical for exact-term precision, dense embeddings for semantic recall —
and fuses them. Everything is deterministic (exact-integer tf/df/dl,
rounded scores, id tie-breaks) so the DuckDB oracle hash-matches the
rankings themselves, not just row counts.

Scale shape: the inverted index (term -> postings) is the only data
expansion; query terms broadcast; per-candidate scoring joins each query
against its posting lists, never the full corpus. The dense side rides
the broadcast-probe cosine machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import (
    exact_sum,
    round_det,
    sql_exact_sum,
    sql_round_det,
)
from hive_feature_demo_spark.plans.registry import register

_K1 = 1.2
_B = 0.75
_TOPN = 10

#: fixed query workload — three-term queries over the corpus vocabulary
_QUERIES = (
    (1, ("hash", "join", "stream")),
    (2, ("window", "sort", "merge")),
    (3, ("filter", "scan", "table")),
    (4, ("spark", "batch", "agg")),
    (5, ("customer", "data", "key")),
)

_Q_VALUES_SQL = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _QUERIES for t in terms
)

#: Lucene-form idf — strictly positive even for df > N/2
_IDF_SQL = "ln(1.0 + (N - df + 0.5) / (df + 0.5))"


# ---------------------------------------------------------------------------
# q311 — BM25 ranked retrieval: the standard sparse ranking function
# (k1=1.2, b=0.75, Lucene-positive idf) over a word inverted index, for a
# fixed 5-query workload; top-10 per query with deterministic
# (rounded-score, doc_id) ordering. tf/df/doc-length are exact integers;
# per-term scores accumulate through the exact-decimal sum so partition
# order can't flip last-ulp ties.
# ---------------------------------------------------------------------------


@register(
    "q311_bm25_retrieval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS N,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    q(query_id, term) AS (VALUES {_Q_VALUES_SQL}),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             {_IDF_SQL} * (tf.tf * ({_K1} + 1.0))
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
               AS s
      FROM q
      JOIN tf ON tf.term = q.term
      JOIN df ON df.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ),
    agg AS (
      SELECT query_id, doc_id, {sql_exact_sum('s')} AS score
      FROM scored GROUP BY 1, 2
    )
    SELECT query_id, doc_id,
           {sql_round_det('score', 6)} AS bm25,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY {sql_round_det('score', 6)} DESC, doc_id) AS rank
      FROM agg
    )
    WHERE rank <= {_TOPN}
    ORDER BY query_id, rank
    """,
    category="textstats",
)
def q311_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint(eager=True)  # feeds df, dl-join and scoring
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("N"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in _QUERIES for t in terms],
        "query_id int, term string",
    )
    idf = F.log(1.0 + (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(df_t.join(F.broadcast(q), "term").select("term", "df").distinct()), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (idf * (F.col("tf") * (_K1 + 1.0)) / denom).alias("s"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(exact_sum("s", "score"))
    w = Window.partitionBy("query_id").orderBy(
        round_det(F.col("score"), 6).desc(), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _TOPN)
        .select(
            "query_id",
            "doc_id",
            round_det(F.col("score"), 6).alias("bm25"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# q312 — hybrid more-like-this via reciprocal-rank fusion: for 5 probe
# docs, rank candidates (a) DENSELY by embedding cosine (vec_id == doc_id
# in the fixture) and (b) LEXICALLY by summed idf of shared rare terms
# (df <= 50 — the q278 inverted-index pruning, so the join fans out per
# rare term, never all-pairs), then fuse with RRF (k=60): rrf =
# 1/(60+dense_rank) + 1/(60+lex_rank), a missing list contributing 0.
# The fusion sum has exactly two fixed-order operands — no aggregation-
# order nondeterminism — and ranks come from rounded scores with id
# tie-breaks, so the fused ranking is hash-exact.
# ---------------------------------------------------------------------------

_RRF_K = 60
_N_PROBES = 5
_RARE_DF = 50
_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "q312_hybrid_rrf_retrieval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(
               string_split_regex(lower(trim(text)), '\\s+'))) AS term
      FROM documents
    ),
    df AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM documents),
    rare AS (
      SELECT t.doc_id, t.term, ln(CAST(n.N AS DOUBLE) / df.df) AS idf
      FROM toks t JOIN df ON df.term = t.term CROSS JOIN n
      WHERE df.df <= {_RARE_DF}
    ),
    probes AS (SELECT doc_id FROM documents WHERE doc_id < {_N_PROBES}),
    lex_scored AS (
      SELECT p.doc_id AS query_id, c.doc_id AS cand,
             {sql_exact_sum('c.idf')} AS s
      FROM rare p JOIN rare c ON p.term = c.term AND c.doc_id <> p.doc_id
      WHERE p.doc_id < {_N_PROBES}
      GROUP BY 1, 2
    ),
    lex_top AS (
      SELECT query_id, cand, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY {sql_round_det('s', 6)} DESC, cand) AS rank
        FROM lex_scored
      ) WHERE rank <= {_TOPN}
    ),
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dense_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand,
             {sql_round_det(_COS.format(a="q.v", b="c.v"), 4)} AS cos_sim
      FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_PROBES}
    ),
    dense_top AS (
      SELECT query_id, cand, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cos_sim DESC, cand) AS rank
        FROM dense_scored
      ) WHERE rank <= {_TOPN}
    ),
    fused AS (
      SELECT COALESCE(l.query_id, d.query_id) AS query_id,
             COALESCE(l.cand, d.cand) AS cand,
             COALESCE(1.0 / ({_RRF_K} + l.rank), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + d.rank), 0.0) AS rrf,
             l.rank AS lex_rank, d.rank AS dense_rank
      FROM lex_top l FULL OUTER JOIN dense_top d
        ON l.query_id = d.query_id AND l.cand = d.cand
    )
    SELECT query_id, cand AS doc_id,
           {sql_round_det('rrf', 8)} AS rrf_score,
           CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(dense_rank AS BIGINT) AS dense_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY {sql_round_det('rrf', 8)} DESC, cand) AS fr
      FROM fused
    )
    WHERE fr <= 5
    ORDER BY query_id, {sql_round_det('rrf', 8)} DESC, doc_id
    """,
    category="ann",
)
def q312_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators import similarity

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
        ).alias("term"),
    )
    n_docs = docs.count()
    df_t = toks.groupBy("term").agg(F.count("*").alias("df"))
    rare = (
        toks.join(F.broadcast(df_t.filter(F.col("df") <= _RARE_DF)), "term")
        .select(
            "doc_id",
            "term",
            F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"),
        )
        .localCheckpoint(eager=True)  # both sides of the lexical join
    )
    p = rare.filter(F.col("doc_id") < _N_PROBES).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    c = rare.select(F.col("doc_id").alias("cand"), "term", "idf")
    lex_scored = (
        p.join(c, "term")
        .filter(F.col("cand") != F.col("query_id"))
        .groupBy("query_id", "cand")
        .agg(exact_sum("idf", "s"))
    )
    wl = Window.partitionBy("query_id").orderBy(
        round_det(F.col("s"), 6).desc(), F.asc("cand")
    )
    lex_top = (
        lex_scored.withColumn("rank", F.row_number().over(wl))
        .filter(F.col("rank") <= _TOPN)
        .select("query_id", "cand", F.col("rank").alias("lex_rank"))
    )

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_PROBES)
    dense_top = (
        similarity.cosine_topk(emb, probes, k=_TOPN)
        .select(
            "query_id",
            F.col("neighbor_id").alias("cand"),
            F.col("rank").alias("dense_rank"),
        )
    )

    fused = (
        lex_top.join(dense_top, ["query_id", "cand"], "full_outer")
        .select(
            "query_id",
            "cand",
            (
                F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("dense_rank")), F.lit(0.0))
            ).alias("rrf"),
            "lex_rank",
            "dense_rank",
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        round_det(F.col("rrf"), 8).desc(), F.asc("cand")
    )
    return (
        fused.withColumn("fr", F.row_number().over(wf))
        .filter(F.col("fr") <= 5)
        .select(
            "query_id",
            F.col("cand").alias("doc_id"),
            round_det(F.col("rrf"), 8).alias("rrf_score"),
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("dense_rank").cast("long").alias("dense_rank"),
        )
        .orderBy("query_id", round_det(F.col("rrf"), 8).desc(), "doc_id")
    )
