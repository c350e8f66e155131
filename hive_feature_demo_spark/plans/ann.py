"""Approximate-nearest-neighbor query plans over the ``embeddings`` table.

Three tiers of the same problem (reference analogue: the similarity-search
capability class in SURVEY.md §2.3; the reference itself has no vector ops —
semantics are defined here and hash-checked against DuckDB):

- ``q62`` exact near-duplicate pairs (cosine >= threshold) — the O(n^2)
  correctness baseline.
- ``q61`` LSH-bucketed top-k — random-hyperplane signatures; the oracle
  replays the *identical* plane constants inlined as SQL literals, so even
  the approximate path is hash-checked, not just row-counted.
- ``q63`` IVF top-k — coarse quantization into inverted lists + probe +
  exact re-rank, the industry-standard 100 TB layout (train the codebook
  offline; here centroids are the lowest-id vectors for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import sql_round_det
from hive_feature_demo_spark.operators import similarity
from hive_feature_demo_spark.plans.registry import register

_DIM = 64
_BITS = 8
_PLANES = similarity.hyperplanes(_DIM, _BITS, seed=42)


def _sql_array(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"


def _sql_signature(vec_expr: str) -> str:
    """DuckDB replica of :func:`similarity.rp_signature` — same planes."""
    bits = [
        f"CASE WHEN list_dot_product({vec_expr}, {_sql_array(p)}) >= 0"
        " THEN '1' ELSE '0' END"
        for p in _PLANES
    ]
    return "concat(" + ", ".join(bits) + ")"


_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


# ---------------------------------------------------------------------------
# q61 — LSH-bucketed approximate top-k (scale path for similarity search).
# ---------------------------------------------------------------------------


@register(
    "q61_lsh_ann_topk",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             {_sql_signature("embedding::DOUBLE[]")} AS sig
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             {_sql_signature("embedding::DOUBLE[]")} AS sig
      FROM embeddings WHERE vec_id < 20
    ), scored AS (
      SELECT q.query_id, c.neighbor_id,
             {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} AS cos_sim
      FROM c JOIN q USING (sig)
      WHERE c.neighbor_id != q.query_id
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="ann",
)
def q61_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_bucketed_topk(
        emb, emb.filter(F.col("vec_id") < 20), dim=_DIM, k=5, bits=_BITS, seed=42
    )


# ---------------------------------------------------------------------------
# q62 — embedding-cosine near-duplicate pairs, SCALE PATH: banded
# random-projection candidates (bucket join on (band, band_sig)) -> exact
# cosine verify on candidates only, mirroring the text-dedup MinHash shape.
# The unbounded O(n^2) theta self-join (similarity.near_dup_pairs) remains
# available as the small-scale verifier (registered as q118, NOT the
# default path). The oracle replays the identical planes/banding, so even
# the LSH internals are hash-checked.
# ---------------------------------------------------------------------------

_ND_BANDS = 8
_ND_ROWS = 4
_ND_PLANES = similarity.hyperplanes(_DIM, _ND_BANDS * _ND_ROWS, seed=42)


def _sql_nd_signature(vec_expr: str) -> str:
    bits = [
        f"CASE WHEN list_dot_product({vec_expr}, {_sql_array(p)}) >= 0"
        " THEN '1' ELSE '0' END"
        for p in _ND_PLANES
    ]
    return "concat(" + ", ".join(bits) + ")"


_ND_BUCKETS_SQL = "\n      UNION ALL\n".join(
    f"      SELECT vec_id, {b} AS band,"
    f" substring(sig, {b * _ND_ROWS + 1}, {_ND_ROWS}) AS bsig FROM tagged"
    for b in range(_ND_BANDS)
)


@register(
    "q62_embedding_near_dup",
    oracle=f"""
    WITH tagged AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {_sql_nd_signature("embedding::DOUBLE[]")} AS sig
      FROM embeddings
    ), buckets AS (
{_ND_BUCKETS_SQL}
    ), cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bsig = b.bsig
      WHERE a.vec_id < b.vec_id
    ), pairs AS (
      SELECT c.id_a, c.id_b,
             {sql_round_det(_COS.format(a="a.e", b="b.e"), 4)} AS cos_sim
      FROM cands c
      JOIN tagged a ON a.vec_id = c.id_a
      JOIN tagged b ON b.vec_id = c.id_b
    )
    SELECT id_a, id_b, cos_sim
    FROM pairs WHERE cos_sim >= 0.4
    ORDER BY id_a, id_b
    """,
    category="ann",
)
def q62_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.rp_banded_near_dup_pairs(
        emb, dim=_DIM, bands=_ND_BANDS, rows_per_band=_ND_ROWS, seed=42, threshold=0.4
    )


# ---------------------------------------------------------------------------
# q63 — IVF approximate top-k (coarse quantize -> probe -> exact re-rank).
# ---------------------------------------------------------------------------


@register(
    "q63_ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < 16
    ), vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), lists AS (
      SELECT vec_id AS neighbor_id, v AS cv2, cid FROM (
        SELECT vecs.vec_id, vecs.v, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY {sql_round_det("list_distance(vecs.v, cent.cv)", 6)}, cent.cid
               ) AS rn
        FROM vecs, cent)
      WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, v AS qv, cid FROM (
        SELECT vecs.vec_id, vecs.v, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY {sql_round_det("list_distance(vecs.v, cent.cv)", 6)}, cent.cid
               ) AS rn
        FROM vecs, cent WHERE vecs.vec_id < 20)
      WHERE rn <= 4
    ), scored AS (
      SELECT p.query_id, l.neighbor_id,
             {sql_round_det(_COS.format(a="l.cv2", b="p.qv"), 4)} AS cos_sim
      FROM lists l JOIN probes p USING (cid)
      WHERE l.neighbor_id != p.query_id
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="ann",
)
def q63_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 20), n_centroids=16, nprobe=4, k=5
    )


# ---------------------------------------------------------------------------
# q82 — IVF with a TRAINED codebook: deterministic distributed Lloyd
# k-means (operators/similarity.train_centroids) feeding the same
# assign/probe/re-rank plan as q63. Training is deterministic by
# construction (init = k lowest-id vectors, rounded distances with cid
# tie-breaks, order-independent decimal means rounded to 6dp each
# iteration), so the FIXED iteration count (2) unrolls into plain SQL: the
# oracle replays init -> assign -> mean -> assign -> mean as CTEs and then
# the same probe/re-rank as the engine. Per-iteration 6dp rounding re-syncs
# both engines' float state, so the replay is exact, not approximate.
# ---------------------------------------------------------------------------

_Q82_K = 8


def _sql_assign(src: str, cents: str, where: str = "", nprobe: int = 1) -> str:
    """DuckDB replica of similarity.ivf_assign: nearest-centroid(s) by
    6dp-rounded L2 with centroid-id tie-break."""
    return f"""(
      SELECT vec_id, ev, cid FROM (
        SELECT s.vec_id, s.ev, c.cid,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                 ORDER BY {sql_round_det("list_distance(s.ev, c.cv)", 6)}, c.cid) AS rn
        FROM {src} s, {cents} c {where}) WHERE rn <= {nprobe})"""


_SQL_MEAN = """(
      SELECT cid, list(mv ORDER BY dim) AS cv FROM (
        SELECT a.cid, g.dim,
               {mean} AS mv
        FROM {assigned} a, generate_series(0, {maxdim}) g(dim)
        GROUP BY a.cid, g.dim)
      GROUP BY cid)"""


def _sql_lloyd_mean(assigned: str) -> str:
    return _SQL_MEAN.format(
        assigned=assigned,
        maxdim=_DIM - 1,
        mean=sql_round_det(
            "CAST(SUM(CAST(a.ev[g.dim + 1] AS DECIMAL(25,10))) AS DOUBLE)"
            " / COUNT(*)",
            6,
        ),
    )


@register(
    "q82_ivf_trained_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
             ev AS cv
      FROM (SELECT vec_id, ev FROM v ORDER BY vec_id LIMIT {_Q82_K})
    ),
    a1 AS {_sql_assign("v", "c0")},
    c1 AS {_sql_lloyd_mean("a1")},
    a2 AS {_sql_assign("v", "c1")},
    c2 AS {_sql_lloyd_mean("a2")},
    lists AS (
      SELECT vec_id AS neighbor_id, ev AS cvv, cid
      FROM {_sql_assign("v", "c2")}
    ),
    probes AS (
      SELECT vec_id AS query_id, ev AS qv, cid
      FROM {_sql_assign("v", "c2", where="WHERE s.vec_id < 10", nprobe=2)}
    ),
    scored AS (
      SELECT p.query_id, l.neighbor_id,
             {sql_round_det(_COS.format(a="l.cvv", b="p.qv"), 4)} AS cos_sim
      FROM lists l JOIN probes p USING (cid)
      WHERE l.neighbor_id != p.query_id
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="ann",
)
def q82_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    cents = similarity.train_centroids(emb, k=8, iters=2).withColumnRenamed(
        "cid", "vec_id"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    lists = similarity.ivf_assign(
        emb, cents, nprobe=1, out_id="neighbor_id"
    ).withColumnRenamed("v_vec", "c_vec")
    probes = similarity.ivf_assign(
        queries, cents, nprobe=2, out_id="query_id"
    ).withColumnRenamed("v_vec", "q_vec")
    from pyspark.sql import Window

    from hive_feature_demo_spark.functions.numeric import round_det

    scored = (
        lists.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_det(similarity.cosine(F.col("c_vec"), F.col("q_vec")), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# q84 — multi-table LSH (3 tables): the recall lever. The oracle replays
# all three plane sets (zipped unnest = Spark's posexplode) and the same
# dedup-then-rerank, so the multi-table path is fully hash-checked too.
# ---------------------------------------------------------------------------

_N_TABLES = 3
_ALL_PLANES = [similarity.hyperplanes(_DIM, _BITS, seed=42 + t) for t in range(_N_TABLES)]


def _sql_sig_for(planes: list[list[float]], vec_expr: str) -> str:
    bits = [
        f"CASE WHEN list_dot_product({vec_expr}, {_sql_array(p)}) >= 0"
        " THEN '1' ELSE '0' END"
        for p in planes
    ]
    return "concat(" + ", ".join(bits) + ")"


@register(
    "q84_lsh_multitable_topk",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             unnest(generate_series(0, {_N_TABLES - 1})) AS tbl,
             unnest([{", ".join(_sql_sig_for(p, "embedding::DOUBLE[]") for p in _ALL_PLANES)}]) AS sig
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             unnest(generate_series(0, {_N_TABLES - 1})) AS tbl,
             unnest([{", ".join(_sql_sig_for(p, "embedding::DOUBLE[]") for p in _ALL_PLANES)}]) AS sig
      FROM embeddings WHERE vec_id < 20
    ), pairs AS (
      SELECT DISTINCT q.query_id, c.neighbor_id, q.qv, c.cv
      FROM c JOIN q USING (tbl, sig)
      WHERE c.neighbor_id != q.query_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             {sql_round_det(_COS.format(a="qv", b="cv"), 4)} AS cos_sim
      FROM pairs
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="ann",
)
def q84_lsh_multitable_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.lsh_multitable_topk(
        emb,
        emb.filter(F.col("vec_id") < 20),
        dim=_DIM,
        k=5,
        bits=_BITS,
        n_tables=_N_TABLES,
        seed=42,
    )


# ---------------------------------------------------------------------------
# q93 — product-quantization encode (the IVF-PQ memory layer): 64 dims ->
# 8 sub-codes against a 16-entry codebook (lowest-id vectors, like q63).
# Oracle replays slice/argmin/concat with identical rounding + tie-breaks.
# ---------------------------------------------------------------------------


@register(
    "q93_pq_encode",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
      FROM embeddings WHERE vec_id < 16
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ), scored AS (
      SELECT v.vec_id, t.j, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id, t.j
               ORDER BY (FLOOR(list_distance(v.ve[t.j*8+1 : t.j*8+8],
                                             c.ce[t.j*8+1 : t.j*8+8])
                               * 1000000.0 + 0.5) / 1000000.0), c.cid
             ) AS rn
      FROM v, cent c, generate_series(0, 7) t(j)
    ), codes AS (
      SELECT vec_id, j, cid FROM scored WHERE rn = 1
    )
    SELECT vec_id,
           string_agg(lpad(CAST(cid AS VARCHAR), 2, '0'), '' ORDER BY j) AS pq_code
    FROM codes
    GROUP BY vec_id
    ORDER BY vec_id
    """,
    category="ann",
)
def q93_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.pq_encode(
        emb, emb.filter(F.col("vec_id") < 16), m=8, dim=_DIM
    )


# ---------------------------------------------------------------------------
# q94 — PQ search via asymmetric distance computation: candidates scored
# as sums of per-subvector table lookups against the q93 codes. The
# oracle replays codes, distance tables, and the exact-decimal sum.
# ---------------------------------------------------------------------------


@register(
    "q94_pq_adc_topk",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
      FROM embeddings WHERE vec_id < 16
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ), code_scored AS (
      SELECT v.vec_id AS neighbor_id, t.j, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id, t.j
               ORDER BY (FLOOR(list_distance(v.ve[t.j*8+1 : t.j*8+8],
                                             c.ce[t.j*8+1 : t.j*8+8])
                               * 1000000.0 + 0.5) / 1000000.0), c.cid
             ) AS rn
      FROM v, cent c, generate_series(0, 7) t(j)
    ), codes AS (
      SELECT neighbor_id, j, cid FROM code_scored WHERE rn = 1
    ), qtab AS (
      SELECT q.vec_id AS query_id, t.j, c.cid,
             POWER(FLOOR(list_distance(q.ve[t.j*8+1 : t.j*8+8],
                                       c.ce[t.j*8+1 : t.j*8+8])
                         * 1000000.0 + 0.5) / 1000000.0, 2) AS d2
      FROM v q, cent c, generate_series(0, 7) t(j)
      WHERE q.vec_id < 10
    ), scored AS (
      SELECT qt.query_id, cd.neighbor_id,
             FLOOR(CAST(SUM(CAST(qt.d2 AS DECIMAL(25,10))) AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS adc_dist2
      FROM codes cd JOIN qtab qt USING (j, cid)
      WHERE cd.neighbor_id != qt.query_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY adc_dist2 ASC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, adc_dist2, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="ann",
)
def q94_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        emb.filter(F.col("vec_id") < 16),
        m=8,
        dim=_DIM,
        k=5,
    )


# ---------------------------------------------------------------------------
# q98 — the composed production index: IVF pruning + PQ-ADC scoring
# (FAISS-IVFPQ shape). Oracle replays coarse assignment, probes, codes,
# distance tables, and the exact-decimal candidate sum.
# ---------------------------------------------------------------------------


@register(
    "q98_ivf_pq_topk",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
      FROM embeddings WHERE vec_id < 16
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ), lists AS (
      SELECT vec_id AS neighbor_id, cid FROM (
        SELECT v.vec_id, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY (FLOOR(list_distance(v.ve, cent.ce) * 1000000.0 + 0.5)
                           / 1000000.0), cent.cid
               ) AS rn
        FROM v, cent)
      WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT v.vec_id, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY (FLOOR(list_distance(v.ve, cent.ce) * 1000000.0 + 0.5)
                           / 1000000.0), cent.cid
               ) AS rn
        FROM v, cent WHERE v.vec_id < 10)
      WHERE rn <= 4
    ), cands AS (
      SELECT p.query_id, l.neighbor_id
      FROM probes p JOIN lists l USING (cid)
      WHERE l.neighbor_id != p.query_id
    ), code_scored AS (
      SELECT v.vec_id AS neighbor_id, t.j, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id, t.j
               ORDER BY (FLOOR(list_distance(v.ve[t.j*8+1 : t.j*8+8],
                                             c.ce[t.j*8+1 : t.j*8+8])
                               * 1000000.0 + 0.5) / 1000000.0), c.cid
             ) AS rn
      FROM v, cent c, generate_series(0, 7) t(j)
    ), codes AS (
      SELECT neighbor_id, j, cid FROM code_scored WHERE rn = 1
    ), qtab AS (
      SELECT q.vec_id AS query_id, t.j, c.cid,
             POWER(FLOOR(list_distance(q.ve[t.j*8+1 : t.j*8+8],
                                       c.ce[t.j*8+1 : t.j*8+8])
                         * 1000000.0 + 0.5) / 1000000.0, 2) AS d2
      FROM v q, cent c, generate_series(0, 7) t(j)
      WHERE q.vec_id < 10
    ), scored AS (
      SELECT ca.query_id, ca.neighbor_id,
             FLOOR(CAST(SUM(CAST(qt.d2 AS DECIMAL(25,10))) AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS adc_dist2
      FROM cands ca
      JOIN codes cd ON cd.neighbor_id = ca.neighbor_id
      JOIN qtab qt ON qt.query_id = ca.query_id AND qt.j = cd.j AND qt.cid = cd.cid
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY adc_dist2 ASC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, adc_dist2, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="ann",
)
def q98_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.ivf_pq_topk(
        emb, emb.filter(F.col("vec_id") < 10), n_centroids=16, nprobe=4, m=8, dim=_DIM, k=5
    )


# ---------------------------------------------------------------------------
# q118 — exact embedding-cosine near-dup pairs: the O(n^2) small-scale
# VERIFIER for q62's banded path (q62's result is a subset of this by
# construction). Kept registered so the exact semantics stay driver-checked,
# but it is not the recommended dedup path at scale — the theta self-join
# is the cost the q62 banding exists to avoid.
# ---------------------------------------------------------------------------


@register(
    "q118_embedding_near_dup_exact",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {sql_round_det(_COS.format(a="a.e", b="b.e"), 4)} AS cos_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim
    FROM pairs WHERE cos_sim >= 0.4
    ORDER BY id_a, id_b
    """,
    category="ann",
)
def q118_embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return similarity.near_dup_pairs(emb, threshold=0.4)


# ---------------------------------------------------------------------------
# q169 — ANN recall evaluation: recall@5 of the LSH-bucketed path (q61)
# against the exact brute-force top-5 (q36's machinery), per query point —
# the standard quality gate an ANN index must pass before deployment.
# Both paths are deterministic (rounded-cosine ranking, id tie-breaks,
# identical plane constants inlined into the oracle), so the recall
# NUMBERS are hash-exact: hits as integers, recall in basis points
# (hits * 10000 / 5 = hits * 2000). The broadcast-query brute pass is
# affordable because the probe set is small — precisely the regime where
# ground truth for recall eval is computed at 100 TB (sampled queries,
# full corpus scan once).
# ---------------------------------------------------------------------------


@register(
    "q169_ann_recall_eval",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             {_sql_signature("embedding::DOUBLE[]")} AS sig
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             {_sql_signature("embedding::DOUBLE[]")} AS sig
      FROM embeddings WHERE vec_id < 20
    ), lsh_scored AS (
      SELECT q.query_id, c.neighbor_id,
             {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} AS cos_sim
      FROM c JOIN q USING (sig)
      WHERE c.neighbor_id != q.query_id
    ), lsh_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM lsh_scored
      ) WHERE rank <= 5
    ), exact_scored AS (
      SELECT q.query_id, c.neighbor_id,
             {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} AS cos_sim
      FROM q, c
      WHERE c.neighbor_id != q.query_id
    ), exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM exact_scored
      ) WHERE rank <= 5
    )
    SELECT q.query_id,
           CAST(COALESCE(h.hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.hits, 0) * 2000 AS BIGINT) AS recall_bp
    FROM q LEFT JOIN (
      SELECT e.query_id, COUNT(*) AS hits
      FROM exact_top e JOIN lsh_top l
        ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
      GROUP BY e.query_id
    ) h ON q.query_id = h.query_id
    ORDER BY q.query_id
    """,
    category="ann",
)
def q169_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    lsh = similarity.lsh_bucketed_topk(
        emb, queries, dim=_DIM, k=5, bits=_BITS, seed=42
    ).select("query_id", "neighbor_id")
    exact = similarity.cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(lsh, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    spine = queries.select(F.col("vec_id").alias("query_id"))
    return (
        spine.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("hits", F.lit(0)) * 2000).cast("long").alias("recall_bp"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q199 — IVF recall sweep: recall@5 vs exact ground truth at nprobe in
# {1, 2, 4} in one report — the tuning curve an IVF deployment reads to
# pick its probe budget (recall must be non-decreasing in nprobe by
# construction: larger probe sets are supersets). Engine side runs the
# q63 IVF operator once per nprobe (each a bounded probe-list join);
# oracle ranks probes once and filters rn <= nprobe per sweep value.
# Counts are integers, recall in basis points — hash-exact.
# ---------------------------------------------------------------------------


@register(
    "q199_ivf_recall_sweep",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < 16
    ), vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), lists AS (
      SELECT vec_id AS neighbor_id, v AS cv2, cid FROM (
        SELECT vecs.vec_id, vecs.v, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY {sql_round_det("list_distance(vecs.v, cent.cv)", 6)}, cent.cid
               ) AS rn
        FROM vecs, cent)
      WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, v AS qv, cid, rn FROM (
        SELECT vecs.vec_id, vecs.v, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY {sql_round_det("list_distance(vecs.v, cent.cv)", 6)}, cent.cid
               ) AS rn
        FROM vecs, cent WHERE vecs.vec_id < 20)
      WHERE rn <= 4
    ), np AS (SELECT unnest([1, 2, 4]) AS nprobe),
    ivf_top AS (
      SELECT nprobe, query_id, neighbor_id FROM (
        SELECT np.nprobe, p.query_id, l.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY np.nprobe, p.query_id
                 ORDER BY {sql_round_det(_COS.format(a="l.cv2", b="p.qv"), 4)} DESC,
                          l.neighbor_id) AS rank
        FROM np JOIN probes p ON p.rn <= np.nprobe
        JOIN lists l USING (cid)
        WHERE l.neighbor_id != p.query_id)
      WHERE rank <= 5
    ), q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 20
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
    ), exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} DESC,
                          c.neighbor_id) AS rank
        FROM q, c WHERE c.neighbor_id != q.query_id)
      WHERE rank <= 5
    )
    SELECT np.nprobe,
           CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS n_queries,
           CAST(COALESCE(h.hits, 0) AS BIGINT) AS total_hits,
           CAST(COALESCE(h.hits, 0) * 10000
                // (5 * (SELECT COUNT(*) FROM q)) AS BIGINT) AS recall_bp
    FROM np LEFT JOIN (
      SELECT i.nprobe, COUNT(*) AS hits
      FROM ivf_top i JOIN exact_top e
        ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
      GROUP BY i.nprobe
    ) h ON np.nprobe = h.nprobe
    ORDER BY np.nprobe
    """,
    category="ann",
)
def q199_ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    n_queries = queries.count()  # driver scalar, bounded by the probe set
    exact = similarity.cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    exact = exact.localCheckpoint(eager=True)  # reused by all sweep points
    sweeps = []
    for nprobe in (1, 2, 4):
        ivf = similarity.ivf_topk(
            emb, queries, n_centroids=16, nprobe=nprobe, k=5
        ).select("query_id", "neighbor_id")
        sweeps.append(
            ivf.join(exact, ["query_id", "neighbor_id"])
            .agg(F.count("*").alias("hits"))
            .select(F.lit(nprobe).alias("nprobe"), "hits")
        )
    out = sweeps[0].unionByName(sweeps[1]).unionByName(sweeps[2])
    return (
        out.select(
            "nprobe",
            F.lit(n_queries).cast("long").alias("n_queries"),
            F.col("hits").cast("long").alias("total_hits"),
            F.expr(f"CAST(hits * 10000 div (5 * {n_queries}) AS BIGINT)").alias(
                "recall_bp"
            ),
        )
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# q210 — hard-negative mining: for each query vector, the top-5 most
# similar corpus vectors with a DIFFERENT label — the contrastive-
# training data op (retrieval models train on near-miss negatives, not
# random ones). Same broadcast-query brute pass as the recall evals
# (query set small, corpus scanned once); the label inequality filters
# BEFORE ranking so every returned row is a usable negative.
# ---------------------------------------------------------------------------


@register(
    "q210_hard_negative_mining",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS q_label, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 20
    ), c AS (
      SELECT vec_id AS neighbor_id, label AS n_label, embedding::DOUBLE[] AS cv
      FROM embeddings
    )
    SELECT query_id, neighbor_id, n_label AS negative_label, cos_sim, rank
    FROM (
      SELECT q.query_id, c.neighbor_id, c.n_label,
             {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} AS cos_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} DESC,
                        c.neighbor_id) AS BIGINT) AS rank
      FROM q JOIN c
        ON c.neighbor_id != q.query_id AND c.n_label != q.q_label
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    category="ann",
)
def q210_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hive_feature_demo_spark.operators.similarity import cosine
    from hive_feature_demo_spark.functions.numeric import round_det

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("negative_label") != F.col("q_label"))
        )
        .select(
            "query_id",
            "neighbor_id",
            "negative_label",
            round_det(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# q211 — kNN label consistency: for every query, the fraction (basis
# points) of its exact top-5 neighbors sharing its label — the intrinsic
# embedding-quality score (high consistency = the space separates
# classes; the aggregate per label pinpoints which classes bleed).
# Composes the deterministic exact top-k with one integer aggregate.
# ---------------------------------------------------------------------------


@register(
    "q211_knn_label_consistency",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS q_label, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 50
    ), c AS (
      SELECT vec_id AS neighbor_id, label AS n_label, embedding::DOUBLE[] AS cv
      FROM embeddings
    ), top5 AS (
      SELECT query_id, q_label, n_label FROM (
        SELECT q.query_id, q.q_label, c.n_label,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} DESC,
                          c.neighbor_id) AS rank
        FROM q JOIN c ON c.neighbor_id != q.query_id
      ) WHERE rank <= 5
    )
    SELECT q_label AS label,
           COUNT(DISTINCT query_id) AS n_queries,
           CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same_label,
           CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) * 10000
                // (5 * COUNT(DISTINCT query_id)) AS BIGINT) AS consistency_bp
    FROM top5
    GROUP BY q_label
    ORDER BY q_label
    """,
    category="ann",
)
def q211_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)
    top5 = similarity.cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    labels = emb.select(F.col("vec_id").alias("lid"), F.col("label").alias("lbl"))
    joined = (
        top5.join(
            F.broadcast(labels).withColumnRenamed("lid", "qid_l"),
            F.col("query_id") == F.col("qid_l"),
        )
        .withColumnRenamed("lbl", "q_label")
        .join(
            F.broadcast(labels).withColumnRenamed("lid", "nid_l"),
            F.col("neighbor_id") == F.col("nid_l"),
        )
        .withColumnRenamed("lbl", "n_label")
    )
    return (
        joined.groupBy(F.col("q_label").alias("label"))
        .agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            ).cast("long").alias("n_same_label"),
        )
        .withColumn(
            "consistency_bp",
            F.expr("CAST(n_same_label * 10000 div (5 * n_queries) AS BIGINT)"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q306 — truncated-dimension (Matryoshka-style) recall audit: recall@5 of
# cosine search over only the FIRST m components (m in 8/16/32) against
# the exact full-64-dim ground truth, per probe — the eval that decides
# whether shipping truncated embeddings (cheaper ANN, smaller index) is
# safe for this corpus. Same deterministic regime as q169: rounded
# cosines, id tie-breaks, integer hits, recall in basis points. Scale
# shape: the probe set is broadcast; each m is one more broadcast pass
# over the corpus with a SHORTER dot product — at 100 TB the m=8 pass
# reads 8x fewer vector bytes, which is the point being measured.
# ---------------------------------------------------------------------------

_MAT_DIMS = (8, 16, 32)


def _mat_top(dim_expr_a: str, dim_expr_b: str, label: str) -> str:
    return f"""
      SELECT query_id, neighbor_id, {label} AS m FROM (
        SELECT q.query_id, c.neighbor_id,
               {sql_round_det(_COS.format(a=dim_expr_a, b=dim_expr_b), 4)} AS cos_sim,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {sql_round_det(_COS.format(a=dim_expr_a, b=dim_expr_b), 4)} DESC,
                          c.neighbor_id) AS rank
        FROM q, c
        WHERE c.neighbor_id != q.query_id
      ) WHERE rank <= 5"""


@register(
    "q306_matryoshka_recall",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 20
    ), exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {sql_round_det(_COS.format(a="q.qv", b="c.cv"), 4)} DESC,
                          c.neighbor_id) AS rank
        FROM q, c WHERE c.neighbor_id != q.query_id
      ) WHERE rank <= 5
    ), trunc_top AS (
      {" UNION ALL ".join(
          _mat_top(f"q.qv[1:{m}]", f"c.cv[1:{m}]", m) for m in _MAT_DIMS
      )}
    )
    SELECT q.query_id AS query_id, m.m AS dims,
           CAST(COALESCE(h.hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.hits, 0) * 2000 AS BIGINT) AS recall_bp
    FROM q CROSS JOIN (SELECT DISTINCT m FROM trunc_top) m
    LEFT JOIN (
      SELECT t.query_id AS hq, t.m AS hm, COUNT(*) AS hits
      FROM exact_top e JOIN trunc_top t
        ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
      GROUP BY 1, 2
    ) h ON h.hq = q.query_id AND h.hm = m.m
    ORDER BY query_id, dims
    """,
    category="ann",
)
def q306_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    exact = exact.localCheckpoint(eager=True)  # reused by all three m passes
    out = None
    for m in _MAT_DIMS:
        emb_m = emb.select("vec_id", F.slice("embedding", 1, m).alias("embedding"))
        q_m = queries.select("vec_id", F.slice("embedding", 1, m).alias("embedding"))
        trunc = similarity.cosine_topk(emb_m, q_m, k=5).select(
            "query_id", "neighbor_id"
        )
        hits = (
            exact.join(trunc, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count("*").alias("hits"))
        )
        spine = queries.select(
            F.col("vec_id").alias("query_id"), F.lit(m).cast("long").alias("dims")
        )
        part = spine.join(hits, "query_id", "left").select(
            "query_id",
            "dims",
            F.coalesce("hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("hits", F.lit(0)) * 2000).cast("long").alias("recall_bp"),
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("query_id", "dims")
