"""Pin the NL rule grammar: each canned request parses to exactly the
typed filters the q122 oracle's handwritten WHERE clauses restate."""

from __future__ import annotations

from hive_feature_demo_spark.operators.nlquery import parse_nl_query
from hive_feature_demo_spark.operators.segment import SegmentFilters


def test_flagship_jazz_recency():
    f = parse_nl_query("Find jazz fans who haven't purchased in 3 months")
    assert f == SegmentFilters(genres=("jazz",), min_months_since_purchase=3.0)


def test_multi_genre_city_spend():
    f = parse_nl_query("Rock and blues fans in Chicago who spent at least $200")
    assert f == SegmentFilters(
        genres=("blues", "rock"), min_total_spent=200.0, city="Chicago"
    )


def test_city_max_recency():
    f = parse_nl_query("Fans in Springfield who bought within the last 6 months")
    assert f == SegmentFilters(max_months_since_purchase=6.0, city="Springfield")


def test_genre_spend_and_negated_recency():
    f = parse_nl_query("EDM fans who spent over $150 and haven't bought in 2 months")
    assert f == SegmentFilters(
        genres=("edm",), min_months_since_purchase=2.0, min_total_spent=150.0
    )


def test_spend_only():
    f = parse_nl_query("Fans who spent at least $500")
    assert f == SegmentFilters(min_total_spent=500.0)


def test_between_range_and_variants():
    f = parse_nl_query("hip hop fans between 2 and 8 months since purchase")
    assert f.genres == ("hip-hop",)
    assert f.min_months_since_purchase == 2.0
    assert f.max_months_since_purchase == 8.0

    assert parse_nl_query("rnb fans").genres == ("r&b",)
    assert parse_nl_query("more than 4 months since a purchase").min_months_since_purchase == 4.0


def test_unrecognized_text_is_no_filter():
    assert parse_nl_query("tell me a joke") == SegmentFilters()


def test_city_is_not_a_genre_word():
    # "in Jazz" must not become a city; "in Oak Park" must (multi-word)
    assert parse_nl_query("fans interested in Jazz").city is None
    f = parse_nl_query("fans in Oak Park who spent at least $50")
    assert f.city == "Oak Park" and f.min_total_spent == 50.0


def test_decimals_and_commas():
    f = parse_nl_query(
        "fans who haven't bought in 1.5 months and spent more than $1,250.50"
    )
    assert f.min_months_since_purchase == 1.5
    assert f.min_total_spent == 1250.50


def test_qualitative_high_spend_rule():
    """'high-spending' / 'big spenders' with no explicit amount pin the
    documented HIGH_SPEND_THRESHOLD; an explicit $N always wins; the
    chat example prompts compose A3+A5 and A3+A6 (r5-verdict item 6)."""
    from hive_feature_demo_spark.operators.nlquery import (
        HIGH_SPEND_THRESHOLD,
        parse_nl_query,
    )

    f = parse_nl_query(
        "What campaign strategy should I use for high-spending blues fans?"
    )
    assert f.genres == ("blues",)
    assert f.min_total_spent == HIGH_SPEND_THRESHOLD
    assert f.city is None and f.min_months_since_purchase is None

    g = parse_nl_query("Find fans in Chicago who love EDM")
    assert g.genres == ("edm",)
    assert g.city == "Chicago"
    assert g.min_total_spent is None

    assert parse_nl_query("big spenders only").min_total_spent == HIGH_SPEND_THRESHOLD
    assert parse_nl_query("HIGH SPENDERS").min_total_spent == HIGH_SPEND_THRESHOLD
    # explicit amount beats the qualitative tier
    e = parse_nl_query("high spenders who spent at least $200")
    assert e.min_total_spent == 200.0
    # and plain 'spending' with a qualifier+number is still the explicit rule
    assert parse_nl_query("fans spending over $90").min_total_spent == 90.0
