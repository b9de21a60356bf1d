"""Exact wide-integer arithmetic lane for moment statistics.

The exact-moment formulas this repo uses for cross-engine-stable
statistics (slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), Pearson/ACF/
assortativity/Gini variants) multiply a row COUNT by corpus-sized SUMS.
Those products grow with the square of the data: at sf0.1×10 the
largest (n·Σxy in q_grouped_regression) reached 5.8e18 — just under
int64 max — and at ×100 it overflowed (SCALING_100X probe,
ARITHMETIC_OVERFLOW under ANSI mode). The 10× probe could never see
this class; only the second decade did.

``d38`` casts into decimal(38,0): Spark's widest exact integer lane and
precisely the headroom of DuckDB's int128 ``hugeint``, which is what
the oracle side uses implicitly (``sum(BIGINT)`` → hugeint, integer
expressions promote). Computing the combination step in d38 keeps both
engines bit-identical on the same values and moves the overflow ceiling
from 9.2e18 to 1e38 — beyond any conceivable corpus for these formulas
(n ≤ 1e12 rows, sums ≤ 1e20 → products ≤ 1e32).

Use it (a) on every factor of a moment-combination product and (b) as
the SUM lane when per-row products fit int64 but their corpus-wide sum
does not: ``F.sum(d38(x * y))`` mirrors DuckDB's BIGINT-product →
hugeint-sum exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["d38"]


def d38(col: Column | str) -> Column:
    """Cast to decimal(38,0) — the exact 128-bit-ish integer lane that
    mirrors DuckDB's hugeint. See module docstring."""
    return (F.col(col) if isinstance(col, str) else col).cast("decimal(38,0)")
