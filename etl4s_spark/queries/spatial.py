"""Spatial analytics on a projected plane (round 5, continued).

Coordinates are derived deterministically from row keys (md5-prefix →
uniform [0, range)) — the same content-addressed recipe as
operators/sampling.py, so query and oracle re-derive IDENTICAL doubles:
u32/2^32 is an exact power-of-two division and the scale multiply is a
single correctly-rounded IEEE op in both engines. That keeps the whole
spatial surface (cell binning, radius join, density ranking) exactly
hash-checkable, which a real lat/lon corpus with trig-based distances
would not be (sin/cos differ in the last ulp across libm
implementations — the docstrings in operators/geo.py note the swap-in).

Scale story: both queries are one scan per input plus an integer-key
shuffle (or broadcast); nothing here is quadratic, and the radius join
is the propose/verify grid decomposition that holds at any density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table

_RANGE_KM = 1000.0


def _coord(prefix: str, key: str) -> F.Column:
    """Uniform [0, 1000) km from md5(prefix || key) — bit-identical in
    Spark and DuckDB (see module docstring)."""
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), F.col(key).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    return u32 / F.lit(4294967296.0) * F.lit(_RANGE_KM)


def _coord_sql(prefix: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{prefix}' || CAST({key} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) / 4294967296.0 * 1000.0"
    )


@query(
    "q_join_geo_radius",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_coord_sql("cx:", "c_custkey")} AS x,
             {_coord_sql("cy:", "c_custkey")} AS y
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_coord_sql("sx:", "s_suppkey")} AS x,
             {_coord_sql("sy:", "s_suppkey")} AS y
      FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           round(sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)), 3)
             AS dist_km
    FROM c, s
    WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 30.0 * 30.0
    ORDER BY c.c_custkey, s.s_suppkey
    """,
)
def q_join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join (all customer sites within 30 km of a supplier site)
    via grid bucketing: suppliers exploded to their cell + 8 neighbors,
    broadcast, integer equi-join on the cell id, exact dist² verify —
    the O(N·M) cross join the ORACLE runs becomes a broadcast hash join
    whose probe side scans customers exactly once and never shuffles.
    At 100 TB of points the same plan holds: candidate fan-out is local
    density × 9, not corpus size (operators/geo.py)."""
    from etl4s_spark.operators.geo import grid_radius_join

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", _coord("cx:", "c_custkey").alias("x"), _coord("cy:", "c_custkey").alias("y")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", _coord("sx:", "s_suppkey").alias("sx"), _coord("sy:", "s_suppkey").alias("sy")
    )
    return (
        grid_radius_join(c, s, "x", "y", "sx", "sy", radius=30.0)
        .select(
            "c_custkey",
            "s_suppkey",
            F.round(F.sqrt("dist_sq"), 3).alias("dist_km"),
        )
        .orderBy("c_custkey", "s_suppkey")
    )


@query(
    "q_geo_cell_density",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_coord_sql("cx:", "c_custkey")} AS x,
             {_coord_sql("cy:", "c_custkey")} AS y
      FROM customer
    ), binned AS (
      SELECT CAST(floor(x / 50.0) AS BIGINT) AS cell_x,
             CAST(floor(y / 50.0) AS BIGINT) AS cell_y
      FROM c
    ), counted AS (
      SELECT cell_x, cell_y, CAST(count(*) AS BIGINT) AS n_points
      FROM binned GROUP BY cell_x, cell_y
    )
    SELECT cell_x, cell_y, n_points
    FROM counted
    ORDER BY n_points DESC, cell_x, cell_y
    LIMIT 20
    """,
)
def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotspot detection: bin points into 50 km grid cells, rank cells
    by density. One scan, one map-side-combined shuffle on the integer
    cell id, TakeOrdered(20) — output is O(cells), never O(points).
    The aggregation-side twin of the radius join's bucketing (same cell
    arithmetic, so the two results can be joined on cell id)."""
    c = load_table(spark, sf_dir, "customer").select(
        _coord("cx:", "c_custkey").alias("x"), _coord("cy:", "c_custkey").alias("y")
    )
    return (
        c.select(
            F.floor(F.col("x") / 50.0).cast("long").alias("cell_x"),
            F.floor(F.col("y") / 50.0).cast("long").alias("cell_y"),
        )
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
        .orderBy(F.desc("n_points"), "cell_x", "cell_y")
        .limit(20)
    )


@query(
    "q_join_geo_nearest",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_coord_sql("cx:", "c_custkey")} AS x,
             {_coord_sql("cy:", "c_custkey")} AS y
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_coord_sql("sx:", "s_suppkey")} AS x,
             {_coord_sql("sy:", "s_suppkey")} AS y
      FROM supplier
    ), pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS d2
      FROM c, s
    ), best AS (
      SELECT c_custkey, min(d2) AS md FROM pairs GROUP BY c_custkey
    )
    SELECT p.c_custkey,
           min(p.s_suppkey)               AS nearest_suppkey,
           round(sqrt(any_value(b.md)), 3) AS dist_km
    FROM pairs p JOIN best b
      ON p.c_custkey = b.c_custkey AND p.d2 = b.md
    GROUP BY p.c_custkey
    ORDER BY p.c_custkey
    """,
)
def q_join_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-site assignment: every customer mapped to its closest
    supplier site — the fulfillment/routing primitive. The site list is
    BOUNDED (warehouses, not customers), so the right plan at 100 TB is
    exactly this one: broadcast the sites, evaluate |sites| distances
    per row IN the scan stage, and reduce with a map-side-combined
    min(struct(dist², suppkey)) — one aggregate shuffle of combiners,
    no row explosion survives the map side, ties broken by the struct's
    lexicographic order (same rule the oracle states as min-over-
    argmin). The grid radius join (q_join_geo_radius) is the shape for
    site lists too big to broadcast.

    The customer side goes through the SCAN-WIDTH guard
    (operators/parallelism.py widen): the broadcast join, the 15M
    distance evaluations, and the partial min-aggregate all pipeline
    into the scan stage, so their parallelism IS the scan's — and a
    small parquet table arrives as ONE split, putting the entire
    fan-out on one core (measured at sf0.1: 27.7 s on the 1-split scan
    vs 1.9 s widened, ~the core count). widen() is a no-op at scale
    where the scan is already thousands of splits, so no gratuitous
    shuffle ships to the 100 TB plan. (An earlier revision mis-diagnosed
    this as CollapseProject recomputing the coords per pair — the
    formatted plan shows the coord Project intact below the join; the
    14× was single-task execution. The count()-based r5 bench read
    0.5 s for this query because counting prunes the min-struct
    aggregate entirely — the noop-write bench measures the real plan.)"""
    from etl4s_spark.operators.parallelism import widen

    c = widen(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            _coord("cx:", "c_custkey").alias("x"),
            _coord("cy:", "c_custkey").alias("y"),
        ),
        "c_custkey",
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", _coord("sx:", "s_suppkey").alias("sx"), _coord("sy:", "s_suppkey").alias("sy")
    )
    dx = F.col("x") - F.col("sx")
    dy = F.col("y") - F.col("sy")
    pairs = c.join(F.broadcast(s)).select(
        "c_custkey",
        F.struct((dx * dx + dy * dy).alias("d2"), F.col("s_suppkey").alias("k")).alias("p"),
    )
    return (
        pairs.groupBy("c_custkey")
        .agg(F.min("p").alias("best"))
        .select(
            "c_custkey",
            F.col("best.k").alias("nearest_suppkey"),
            F.round(F.sqrt("best.d2"), 3).alias("dist_km"),
        )
        # no final global sort: order-insensitive compare (FIXTURES §C);
        # a cosmetic range sort re-runs the pair aggregation for its
        # boundary sampling — measured 2x (8.6 s vs 4.4 s at sf0.1)
    )
