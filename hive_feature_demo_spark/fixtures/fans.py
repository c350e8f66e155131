"""Deterministic 80-row ``fans`` fixture mirroring the reference data shape.

Schema and value domains follow FIXTURES.md §1 (which mirrors
``/root/reference/backend/data/fans.json``): 14 fields, genre frequencies,
value ranges, plus the required edge rows:

- purchase dates exactly 91/92/93 days before ``TODAY=2024-11-01`` so the
  3.0-month boundary of the ``days/30.44`` recency filter is exercised on
  both sides (91d -> 2.99 months, excluded by ``>=3``; 92d -> 3.02, included);
- ``total_spent`` values exactly on common filter boundaries (200.00);
- a pair of fans whose spend average hits a half-to-even rounding case;
- city pairs with substring overlap ('Chicago' / 'West Chicago');
- genres stored capitalized; queries exercise case-insensitivity.

Generation is pure-Python, seed-fixed, and written once to
``data/fans.parquet`` (committed) via ``python -m
hive_feature_demo_spark.fixtures.fans`` — NOT synthesized per test run, so
the Spark engine and the DuckDB oracle read the identical file.
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa
import pyarrow.parquet as pq

TODAY = dt.date(2024, 11, 1)

_GENRE_WEIGHTS = {
    "Jazz": 52, "Blues": 26, "Indie": 11, "Gospel": 9, "Rock": 8,
    "Hip-Hop": 7, "Classical": 7, "Alternative": 6, "Latin": 6, "EDM": 4,
    "Electronic": 3, "R&B": 2, "Folk": 2, "Punk": 2, "Rap": 1,
}

_FIRST = ["Marcus", "Aisha", "Derek", "Elena", "Jamal", "Sofia", "Trevor",
          "Nina", "Paulo", "Keiko", "Andre", "Maya", "Victor", "Lena",
          "Omar", "Tasha", "Felix", "Ingrid", "Raj", "Carmen"]
_LAST = ["Chen", "Johnson", "Okafor", "Ramirez", "Nguyen", "Kowalski",
         "Brown", "Silva", "Tanaka", "Mueller", "Washington", "Osei",
         "Petrov", "Garcia", "Kim", "Rossi"]
_CITIES = ["Chicago", "West Chicago", "Evanston", "Oak Park", "Naperville",
           "Springfield", "Peoria", "Rockford", "Aurora", "Joliet"]


def build_fans() -> list[dict]:
    rng = random.Random(42)
    fans: list[dict] = []
    date_lo = dt.date(2023, 7, 18)
    date_hi = dt.date(2024, 10, 14)
    span = (date_hi - date_lo).days
    for i in range(80):
        fid = f"f{i + 1:03d}"
        first = _FIRST[rng.randrange(len(_FIRST))]
        last = _LAST[rng.randrange(len(_LAST))]
        n_genres = rng.choices([1, 2, 3], weights=[20, 54, 6])[0]
        pool = list(_GENRE_WEIGHTS)
        weights = list(_GENRE_WEIGHTS.values())
        genres: list[str] = []
        for _ in range(n_genres):
            g = rng.choices(pool, weights=weights)[0]
            idx = pool.index(g)
            pool.pop(idx)
            weights.pop(idx)
            genres.append(g)
        city = _CITIES[rng.randrange(len(_CITIES))]
        purchase = date_lo + dt.timedelta(days=rng.randrange(span + 1))
        fans.append({
            "id": fid,
            "first_name": first,
            "last_name": last,
            "email": f"{first[0].lower()}{last.lower()}{i}@example.com",
            "phone": f"+1312555{1000 + i:04d}",
            "city": city,
            "state": "IL",
            "events_attended": [
                f"Event {rng.randrange(1, 40)} {rng.choice([2023, 2024])}"
                for _ in range(rng.randrange(1, 5))
            ],
            "genres": genres,
            "last_purchase_date": purchase,
            "total_spent": round(rng.uniform(134.0, 934.0), 2),
            "email_open_rate": round(rng.uniform(0.36, 0.82), 2),
            "email_click_rate": round(rng.uniform(0.10, 0.35), 2),
            "subscribed": rng.random() < 0.9,
        })

    # --- required edge rows (overwrite generated values deterministically) ---
    # 3.0-month recency boundary around TODAY (91/92/93 days back)
    fans[0]["last_purchase_date"] = TODAY - dt.timedelta(days=91)   # 2.990 months
    fans[1]["last_purchase_date"] = TODAY - dt.timedelta(days=92)   # 3.022 months
    fans[2]["last_purchase_date"] = TODAY - dt.timedelta(days=93)   # 3.055 months
    # spend exactly on a filter boundary
    fans[3]["total_spent"] = 200.00
    # half-to-even average pair: (287.11 + 287.14)/2 = 287.125 -> bround 287.12
    fans[4]["total_spent"] = 287.11
    fans[5]["total_spent"] = 287.14
    fans[4]["genres"] = ["R&B"]
    fans[5]["genres"] = ["R&B"]
    # substring-overlap cities + case-insensitive genre target
    fans[6]["city"] = "Chicago"
    fans[7]["city"] = "West Chicago"
    fans[8]["genres"] = ["Jazz"]
    return fans


_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("first_name", pa.string()),
    ("last_name", pa.string()),
    ("email", pa.string()),
    ("phone", pa.string()),
    ("city", pa.string()),
    ("state", pa.string()),
    ("events_attended", pa.list_(pa.string())),
    ("genres", pa.list_(pa.string())),
    ("last_purchase_date", pa.date32()),
    ("total_spent", pa.float64()),
    ("email_open_rate", pa.float64()),
    ("email_click_rate", pa.float64()),
    ("subscribed", pa.bool_()),
])


def write_fixture(path: str = "data/fans.parquet") -> str:
    fans = build_fans()
    tbl = pa.Table.from_pylist(fans, schema=_SCHEMA)
    pq.write_table(tbl, path)
    return path


if __name__ == "__main__":
    import os

    os.makedirs("data", exist_ok=True)
    print(write_fixture())
