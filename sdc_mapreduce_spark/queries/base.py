"""Shared helpers for the query registry.

Cross-engine float determinism: double sums depend on accumulation order,
which Spark does not fix across partitions. Every money/measure aggregate
therefore goes through an exact decimal sum (order-independent) and is cast
back to double for a stable, engine-agnostic value:

    spark:  cast(sum(cast(x as decimal(28,S))) as double)
    duckdb: CAST(SUM(CAST(x AS DECIMAL(28,S))) AS DOUBLE)

Averages are decimal-sum / count (one double division by an exact integer —
bitwise deterministic). Per-row double arithmetic (products, differences)
is IEEE-deterministic and safe as-is.

CAVEAT (learned the hard way in round 5): the decimal-cast trick is only
cross-engine-exact when the doubles are exactly representable at the target
scale (money at scale 2, counts, ratios of ints). For ARBITRARY doubles the
two engines can round the cast differently — Spark casts via the shortest
decimal repr (BigDecimal.valueOf(double)), DuckDB rounds the exact binary
value — and the results diverge at the last decimal place when digits
beyond the scale straddle a half boundary. For such inputs accumulate
explicit integer quantizations instead: sum(cast(floor(x * 1e9) as long))
is order-free, exact, and boundary-free on both engines (floor of an exact
binary product never consults a rounding mode). See
functions.simsearch.label_centroid_rank for the pattern.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False
    description: str = ""


# --- per-query cache hygiene (VERDICT r9 ask #5) -------------------------
# The pin()/drain_pins() ledger lives in sdc_mapreduce_spark.cache (so
# library modules under functions/ can use it without importing the query
# layer — VERDICT r10 ask #5); re-exported here for the harnesses and
# tests that historically import it from queries.base.

from sdc_mapreduce_spark.cache import drain_pins, pin, pinned_frames  # noqa: F401


def dsum(expr: str, alias: str, scale: int = 2) -> Column:
    """Order-independent double sum via exact decimal accumulation."""
    return F.expr(
        f"cast(sum(cast(({expr}) as decimal(28,{scale}))) as double)"
    ).alias(alias)


def davg(expr: str, alias: str, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum / count."""
    return F.expr(
        f"cast(sum(cast(({expr}) as decimal(28,{scale}))) as double) / count(*)"
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    # The VARCHAR hop matters: DuckDB's DECIMAL->DOUBLE converts the
    # hugeint unscaled value to double and THEN divides by 10^scale — two
    # roundings, off by one ulp from the correctly-rounded result once the
    # unscaled value exceeds 2^53 (first seen on the 10x corpus: q1
    # sum_charge 27864155010.941590 -> ...941593 instead of ...94159).
    # DECIMAL->VARCHAR is exact and VARCHAR->DOUBLE is correctly rounded,
    # which is also what Spark's Decimal.toDouble produces — so both
    # engines agree at any magnitude.
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS VARCHAR)"
        f" AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS VARCHAR)"
        f" AS DOUBLE) / COUNT(*) AS {alias}"
    )
