"""Spatial radius join via grid bucketing — the scale pattern that
replaces an O(N·M) cross join with a co-located equi-join.

Points are binned into square grid cells whose side equals the search
radius; a pair within ``radius`` of each other is then ALWAYS in the
same cell or one of its 8 neighbors, so generating the 9 neighbor cells
on ONE side (the smaller one) and equi-joining on the cell id proposes
a candidate superset, and the exact distance predicate verifies. This
is the standard spatial-bucketing decomposition (the same
propose-then-verify shape as the MinHash-LSH dedup funnel in
operators/dedup.py): the join key is an integer pair, Catalyst plans a
plain shuffled (or broadcast) hash join, and per-cell fan-out is
bounded by local point density rather than corpus size.

Coordinates here are PLANAR (e.g. km on a projected plane). For
spherical lat/lon the same decomposition applies with the cell width
divided by cos(max |lat|) on the longitude axis and haversine as the
verify predicate — only the two expressions below change, the plan
shape is identical. Planar keeps every expression inside IEEE +,−,×,
sqrt, which both Spark and any SQL oracle round identically, so the
operator is exactly cross-engine-checkable.

Reference parity: the reference ships no spatial operator (it is a
pipeline DSL — /root/reference/docs/faq.md:11-15); this extends the
engine's join family (SURVEY.md §2.B Joins) with the standard
grid-bucketed formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_grid_cell(
    df: DataFrame, x: str, y: str, cell_size: float, out: str = "cell"
) -> DataFrame:
    """Attach the integer grid cell (floor(x/s), floor(y/s)) as a struct
    column. floor of identical doubles is engine-identical, so cell
    membership is deterministic."""
    return df.withColumn(
        out,
        F.struct(
            F.floor(F.col(x) / F.lit(cell_size)).alias("cx"),
            F.floor(F.col(y) / F.lit(cell_size)).alias("cy"),
        ),
    )


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    lx: str,
    ly: str,
    rx: str,
    ry: str,
    radius: float,
    broadcast_right: bool = True,
) -> DataFrame:
    """All (left, right) pairs within ``radius`` (Euclidean, planar).

    The RIGHT side is exploded to its cell plus 8 neighbors (9 rows per
    point — explode the small side, scan the big side once); the join is
    an integer equi-join on (cx, cy); the exact predicate
    dx²+dy² ≤ r² verifies. With ``broadcast_right`` the 9× right side
    is broadcast and the left table never shuffles at all — the right
    plan for a bounded site list against a huge point table. Columns of
    both inputs survive; the squared distance is returned as ``dist_sq``
    (take sqrt at the call site if the metric itself is wanted).

    The grid side is ``radius × (1 + 1e-9)``, NOT radius: the float
    predicate dx²+dy² ≤ r² admits pairs whose per-axis delta exceeds r
    by up to ~1 ulp (dist² rounds DOWN onto r² exactly), and such a
    delta can straddle TWO cell boundaries when one coordinate sits
    just below zero — hypothesis found the counterexample (x=1.0 vs
    x=-2e-309, r=1): cells 0 and −1 become 1 and −1, outside the
    9-neighbor explode. Any cell side strictly greater than the
    largest qualifying |delta| restores the lemma |cell(a)−cell(b)| ≤ 1
    per axis, and 1e-9 relative slack dwarfs the 2⁻⁵² predicate
    rounding while changing no verify decision.

    Preconditions (enforced — ADVICE r5: the operator used to silently
    misbehave): left/right column names must be DISJOINT (after the
    equi-join, F.col(lx)/F.col(rx) would be ambiguous), and neither side
    may already carry the reserved ``cell`` / ``dist_sq`` columns.
    Callers with overlapping schemas rename before calling.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"grid_radius_join requires disjoint column names; both sides "
            f"have {sorted(overlap)} — rename one side before joining"
        )
    reserved = {"cell", "dist_sq"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"grid_radius_join reserves {sorted(reserved)}; rename the "
            f"input column(s)"
        )
    s = float(radius) * (1.0 + 1e-9)
    lcell = add_grid_cell(left, lx, ly, s)
    off = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    rcell = (
        right.withColumn("_o", F.explode(off))
        .withColumn(
            "cell",
            F.struct(
                (F.floor(F.col(rx) / F.lit(s)) + F.col("_o.dx")).alias("cx"),
                (F.floor(F.col(ry) / F.lit(s)) + F.col("_o.dy")).alias("cy"),
            ),
        )
        .drop("_o")
    )
    if broadcast_right:
        rcell = F.broadcast(rcell)
    dx = F.col(lx) - F.col(rx)
    dy = F.col(ly) - F.col(ry)
    return (
        lcell.join(rcell, "cell")
        .withColumn("dist_sq", dx * dx + dy * dy)
        .filter(F.col("dist_sq") <= F.lit(float(radius) * float(radius)))
        .drop("cell")
    )
