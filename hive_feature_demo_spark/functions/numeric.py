"""Deterministic numeric aggregation helpers.

Distributed double summation is order-dependent (IEEE addition is not
associative), so ``SUM(double)`` differs in the last ulps between runs,
partitionings, and engines. That breaks hash-based correctness checks and
makes results non-reproducible at any scale. The fix is to sum in exact
decimal space: per-row values are cast to a fixed-scale DECIMAL (the per-row
double expression is itself deterministic — same IEEE operations on both
engines), summed exactly, and only then converted back to double.

DECIMAL(25,10) holds 10 fractional digits — far beyond the 2-4 decimal
digits of real money values, so the cast never loses information — and
15 integral digits, enough for 100 TB-scale money sums (1e15).

The matching DuckDB/ANSI spelling is produced by :func:`sql_exact_sum` /
:func:`sql_exact_avg` so Spark query and oracle stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(25,10)"


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent double sum via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent double average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def exact_sum_partial(col: Column | str, alias: str | None = None) -> Column:
    """Partial leg of a re-associated :func:`exact_sum`.

    Sums the per-row DECIMAL(25,10) cast but STAYS in decimal space, so a
    second :func:`exact_sum_merge` over the partials is bit-identical to
    one :func:`exact_sum` over the original rows — decimal addition is
    exact, hence associative, unlike double addition. This is the helper
    for pushing an exact sum below a join (pre-aggregate the fact side on
    the join key, join 1:1, then merge), which shrinks the join's shuffle
    and removes count-distinct Expands without perturbing the value hash.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC))
    return out.alias(alias) if alias else out


def exact_sum_merge(col: Column | str, alias: str | None = None) -> Column:
    """Merge leg of a re-associated :func:`exact_sum` (see partial)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c).cast("double")
    return out.alias(alias) if alias else out


def money(col: Column | str) -> Column:
    """Round a double to 2 decimal places, HALF_EVEN (Python semantics).

    The reference uses Python ``round`` (banker's rounding) for its
    aggregates (``backend/tools.py:75-76``); Spark's ``F.round`` is HALF_UP
    and would mismatch, ``F.bround`` is the closest match. Boundary caveat:
    parity is approximate, not exact — the reference rounds a *binary
    float* quotient (``round(sum/len, 2)``) while ``segment_stats`` rounds
    an exact decimal quotient, so on .005 representation boundaries (e.g.
    0.35/2, where the float is 0.17499999...) the two can differ by one
    cent. Deliberate tradeoff: cross-engine/run-order determinism of the
    decimal path over bit-parity with one engine's float artifacts.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.bround(c, 2)


def round_det(col: Column | str, digits: int = 4) -> Column:
    """Deterministic cross-engine rounding: ``floor(x*10^d + 0.5) / 10^d``.

    ``F.round`` rounds the double's shortest decimal *representation*
    (java BigDecimal.valueOf) while DuckDB rounds the true binary value —
    they disagree whenever the printed decimal sits on a .5 boundary the
    binary value is just below. The floor form is the same IEEE ops on both
    engines, so results are bit-identical. Non-negative inputs only.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.floor(c * scale + F.lit(0.5)) / F.lit(scale)


def sql_round_det(expr: str, digits: int = 4) -> str:
    """DuckDB/ANSI spelling of :func:`round_det`."""
    scale = float(10**digits)
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


def sql_exact_sum(expr: str) -> str:
    """DuckDB/ANSI spelling of :func:`exact_sum` over ``expr``."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,10))) AS DOUBLE)"


def sql_exact_avg(expr: str) -> str:
    """DuckDB/ANSI spelling of :func:`exact_avg` over ``expr``."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,10))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def exact_sum_fixed(col: Column | str, digits: int, alias: str | None = None) -> Column:
    """Lossless fixed-point sum for columns with <= ``digits`` decimals.

    Money/count columns have a known decimal precision; scaling each row to
    integer units (exact — the double holds the decimal value exactly up
    to ~2^53/10^d) and summing as long is ~2x faster than the
    DECIMAL(25,10) path while staying order-independent. Headroom at
    100 TB: int64 overflows at 9.2e18 units; with cents (d=2) that is
    ~9e11 rows of $100k values per group — use :func:`exact_sum` for
    unbounded-precision expressions instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**digits
    units = F.floor(c * scale + F.lit(0.5)).cast("long")
    out = F.sum(units).cast("double") / F.lit(float(scale))
    return out.alias(alias) if alias else out


def exact_avg_fixed(col: Column | str, digits: int, alias: str | None = None) -> Column:
    """Fixed-point average: exact long sum / count (see exact_sum_fixed)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**digits
    units = F.floor(c * scale + F.lit(0.5)).cast("long")
    out = (F.sum(units).cast("double") / F.lit(float(scale))) / F.count(c)
    return out.alias(alias) if alias else out


def sql_exact_sum_fixed(expr: str, digits: int) -> str:
    """DuckDB/ANSI spelling of :func:`exact_sum_fixed`."""
    scale = 10**digits
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {float(scale)})"
    )


def sql_exact_avg_fixed(expr: str, digits: int) -> str:
    """DuckDB/ANSI spelling of :func:`exact_avg_fixed`."""
    scale = 10**digits
    return (
        f"((CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {float(scale)}) / COUNT({expr}))"
    )


def sql_hex_to_int(h: str, pos: str, n_digits: int) -> str:
    """DuckDB: integer value of ``n_digits`` hex chars of ``h`` at 1-based
    ``pos`` (md5 output is lowercase; shared by every oracle that needs to
    replay Python's ``int(hex, 16)``)."""
    d = "'0123456789abcdef'"
    terms = [
        f"(strpos({d}, substr({h}, ({pos}) + {i}, 1)) - 1) * {16 ** (n_digits - 1 - i)}"
        for i in range(n_digits)
    ]
    return "(" + " + ".join(terms) + ")"
