"""Temporal helpers.

The reference's recency metric (``backend/tools.py:31-34``) is::

    months_since = (date.today() - last_purchase_date).days / 30.44

Two contract decisions carried over from SURVEY.md §7.4:

- the divisor is exactly 30.44 (NOT calendar ``months_between`` — results
  differ near boundaries);
- ``today`` is an explicit parameter. The reference calls ``date.today()``
  per row, which makes results drift daily and is irreproducible; Catalyst
  would constant-fold ``current_date()`` anyway, so the frozen parameter is
  both the reproducible and the idiomatic-Spark form.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTH_DAYS = 30.44

#: Frozen reference date used by tests/fixtures (inside the fans data range).
REF_TODAY = dt.date(2024, 11, 1)


def months_since(date_col: Column | str, today: dt.date) -> Column:
    """Fractional months between ``today`` and ``date_col`` (days / 30.44)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.datediff(F.lit(today), c) / F.lit(MONTH_DAYS)


def epoch_micros(ts_col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-safe.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ outright (DATATYPE_MISMATCH).
    With the session zone pinned to UTC (catalog._RUNTIME_CONFS) the
    NTZ->TIMESTAMP cast is value-preserving and a no-op on columns already
    TIMESTAMP, so this works under every events-ts encoding the catalog
    normalizes. Prefer this over raw ``unix_micros`` for any gap/horizon
    arithmetic on event time (``cast('long')`` is NOT a substitute: it
    truncates to seconds and shifts session boundaries on sub-second gaps).
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.unix_micros(c.cast("timestamp"))
