"""Warehouse-maintenance operators: batch upsert (MERGE) and SCD2
interval builds — the Load-side siblings of the reference's Extract/
Transform surface (etl4s pipelines end in exactly these writes;
/root/reference/docs/examples-spark.md Load nodes).

Spark without a table format (Delta/Iceberg) has no transactional MERGE
INTO; the batch-native equivalent is a keyed full-outer reconciliation
producing the next table version — same output, explicit plan. With a
lakehouse format these compile to MERGE; the logical content below is
what that MERGE executes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keyed upsert: rows from ``updates`` replace same-key rows in
    ``base``; new keys are inserted; unmatched base rows pass through.
    Both frames must share a schema.

    ONE shuffle per side on the key (full outer join); at 100 TB make
    ``keys`` the partition/bucket key of the base table so the
    reconciliation co-locates. Updates win column-wise as a whole row
    (coalesce on a per-side struct), never a field mix of both."""
    keys = list(keys)
    value_cols = [c for c in base.columns if c not in keys]
    b = base.select(*keys, F.struct(*value_cols).alias("__base"))
    u = updates.select(*keys, F.struct(*value_cols).alias("__upd"))
    merged = b.join(u, keys, "full_outer").select(
        *keys, F.coalesce("__upd", "__base").alias("__row")
    )
    return merged.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in value_cols])


def scd2_intervals(
    df: DataFrame,
    key: str,
    change_ts: str,
    order_tiebreak: str,
) -> DataFrame:
    """Slowly-Changing-Dimension type-2 validity intervals from a change
    log: each change row becomes a version valid from its own timestamp
    until the NEXT change of the same key (open-ended for the current
    version). One window shuffle on the key — identical cost to a
    groupBy; the tiebreak column makes the ordering total when several
    changes share a timestamp."""
    w = Window.partitionBy(key).orderBy(F.col(change_ts).asc(), F.col(order_tiebreak).asc())
    nxt = F.lead(change_ts).over(w)
    return df.select(
        "*",
        F.col(change_ts).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    integer columns — the multi-dimensional clustering layout. Sorting a
    table by this key before writing makes parquet row-group min/max
    stats selective on BOTH dimensions at once, so filters on either
    column (or both) skip row groups — where a plain sort serves only
    its leading column. This is the layout job you run on a 100 TB fact
    table queried by (customer, day): ``df.repartitionByRange(N, zkey)
    .sortWithinPartitions(zkey).write...``.

    Pure codegen'd bit arithmetic (2·bits shift/mask/or terms, no UDF);
    callers pre-map values onto [0, 2^bits) — rank, epoch-day, or a
    truncation, whatever preserves the locality they want."""
    from functools import reduce

    xi = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    yi = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)
