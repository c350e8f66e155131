"""NL -> typed segment query: the reference's front-door UX (A16).

The reference converts natural language to ``query_crm`` arguments with an
LLM inside a ReAct loop (``/root/reference/backend/agent.py:44-77``); the
*typed* query it produces is exactly :class:`operators.segment.SegmentFilters`.
This module supplies that conversion engine-side:

- :func:`parse_nl_query` — deterministic rule-based parser (the testable
  default: same text -> same filters, oracle-checkable downstream);
- LLM mode — the env-gated adapter (``operators/llm_client``) can produce
  the same JSON arguments from a real model; the parsed output feeds the
  identical :func:`segment.segment_stats` plan, so swapping parsers never
  changes execution semantics.

Rule grammar (documented because it IS the contract; each rule is
unit-tested in ``tests/test_nlquery.py``):

- **genres** — any known genre word in the text (case-insensitive;
  ``hip hop``/``hip-hop`` and ``rnb``/``r&b`` normalize), collected in
  alphabetical order for a canonical ``segment_id``;
- **recency** — "haven't/have not purchased|bought|attended in N months"
  or "more than N months since/ago" -> ``min_months_since_purchase=N``;
  "purchased|bought|active in/within the last N months" ->
  ``max_months_since_purchase=N``; "between N and M months" -> both;
- **spend** — "$N" or "N dollars" near spent/spend/worth with an
  at-least/over/more-than qualifier -> ``min_total_spent=N``;
- **qualitative spend** — "high-spending" / "high spender(s)" /
  "big spender(s)" with NO explicit amount ->
  ``min_total_spent=HIGH_SPEND_THRESHOLD`` (750.0 — roughly the fans
  fixture's top quartile, range 134..934 per FIXTURES.md §1; a
  deterministic documented constant where the reference's LLM would
  pick its own number, so the same prompt always builds the same
  segment. An explicit "$N" in the same request wins);
- **city** — "in <Capitalized Phrase>" (multi-word allowed) that is not a
  genre -> substring city filter, matching the reference's
  case-insensitive ``in`` containment.

Unrecognized text contributes no filter (the reference's LLM behaves the
same way: unspecified dimensions are simply omitted).
"""

from __future__ import annotations

import re

from hive_feature_demo_spark.operators.segment import SegmentFilters

#: canonical genre vocabulary (the fans fixture's genre set, FIXTURES.md §1)
#: plus spelling variants mapped onto it.
GENRE_VOCAB: dict[str, str] = {
    "alternative": "alternative",
    "blues": "blues",
    "classical": "classical",
    "edm": "edm",
    "electronic": "electronic",
    "folk": "folk",
    "gospel": "gospel",
    "hip-hop": "hip-hop",
    "hip hop": "hip-hop",
    "hiphop": "hip-hop",
    "indie": "indie",
    "jazz": "jazz",
    "latin": "latin",
    "punk": "punk",
    "r&b": "r&b",
    "rnb": "r&b",
    "rap": "rap",
    "rock": "rock",
}

_NUM = r"(\d+(?:\.\d+)?)"

_RE_NEG_RECENCY = re.compile(
    rf"(?:haven'?t|have\s+not|no)\s+(?:purchased|bought|attended)"
    rf"[^0-9]*?{_NUM}\s+months?",
    re.IGNORECASE,
)
_RE_MIN_MONTHS = re.compile(
    rf"more\s+than\s+{_NUM}\s+months?\s+(?:since|ago)", re.IGNORECASE
)
_RE_MAX_RECENCY = re.compile(
    rf"(?:purchased|bought|active)\s+(?:in|within)\s+the\s+last\s+{_NUM}\s+months?",
    re.IGNORECASE,
)
_RE_BETWEEN = re.compile(
    rf"between\s+{_NUM}\s+and\s+{_NUM}\s+months?", re.IGNORECASE
)
_RE_SPEND = re.compile(
    rf"(?:spent|spend|spending|worth)\s+(?:at\s+least|over|more\s+than)\s+"
    rf"\$?\s*([\d,]+(?:\.\d+)?)(?:\s+dollars)?",
    re.IGNORECASE,
)
#: qualitative spend tier (see module docstring): fans-fixture top quartile
HIGH_SPEND_THRESHOLD = 750.0
_RE_HIGH_SPEND = re.compile(
    r"(?:high|big)[- ]spend(?:ing|ers?)?", re.IGNORECASE
)
_RE_CITY = re.compile(r"\bin\s+((?:[A-Z][a-zA-Z&'-]*)(?:\s+[A-Z][a-zA-Z&'-]*)*)")


def parse_nl_query(text: str) -> SegmentFilters:
    """Parse a natural-language audience request into typed filters."""
    lowered = text.lower()

    found: set[str] = set()
    for variant, canonical in GENRE_VOCAB.items():
        if re.search(rf"(?<![a-z&]){re.escape(variant)}(?![a-z&])", lowered):
            found.add(canonical)
    genres = tuple(sorted(found)) or None

    min_months: float | None = None
    max_months: float | None = None
    if m := _RE_BETWEEN.search(text):
        min_months, max_months = float(m.group(1)), float(m.group(2))
    else:
        if m := (_RE_NEG_RECENCY.search(text) or _RE_MIN_MONTHS.search(text)):
            min_months = float(m.group(1))
        if m := _RE_MAX_RECENCY.search(text):
            max_months = float(m.group(1))

    min_spent: float | None = None
    if m := _RE_SPEND.search(text):
        min_spent = float(m.group(1).replace(",", ""))
    elif _RE_HIGH_SPEND.search(text):
        min_spent = HIGH_SPEND_THRESHOLD

    city: str | None = None
    for m in _RE_CITY.finditer(text):
        phrase = m.group(1)
        if phrase.lower() in GENRE_VOCAB:
            continue
        city = phrase
        break

    return SegmentFilters(
        genres=genres,
        min_months_since_purchase=min_months,
        max_months_since_purchase=max_months,
        min_total_spent=min_spent,
        city=city,
    )
