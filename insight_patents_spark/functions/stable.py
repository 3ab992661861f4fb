"""Cross-engine-stable aggregate helpers (determinism contract, SURVEY §5).

Floating-point sums depend on accumulation order, which differs between
Spark partitions and DuckDB, and between partition counts. Rounding alone
leaves a boundary-flip risk, so money-style sums go through exact decimal
arithmetic instead:

    SUM(CAST(x AS DECIMAL(22,6)))  -- exact, order-independent
    -> CAST(... AS DOUBLE)         -- nearest-double of the same rational

Both engines then produce bit-identical doubles. Averages reuse the exact
sum divided by COUNT (double/bigint IEEE division is deterministic).

Order-statistic and merge-based aggregates (stddev/corr/percentile) stay
double but are computed over small-magnitude columns and rounded (see
individual queries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(22,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, bit-identical to the
    DuckDB oracle expression ``CAST(SUM(CAST(x AS DECIMAL(22,6))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, both engines.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(22,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(22,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(22,6))) AS DOUBLE) / COUNT({expr})"
