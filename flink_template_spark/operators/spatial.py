"""Grid-bucketed spatial self-join — the geospatial radius-join
primitive.

"All point pairs within distance R" is the spatial analogue of the
near-dup joins: the naive plan is a cross join (quadratic in points),
the scale plan is GRID BUCKETING — hash every point to an
R-sized cell, join each point's cell against its 3×3 cell
neighborhood (any pair within R must fall in adjacent cells — the
pigeonhole that makes the candidate set complete), then verify the
exact distance on candidates only. Same candidate/verify shape as
MinHash-LSH (operators.dedup), SimHash banding, and the IVF cell join
(operators.similarity), applied to coordinates; this is what the
"geohash join" in every geospatial warehouse does under the hood.

Exactness: coordinates are INTEGER centi-units and the verify is an
integer squared-distance compare (planar — the grid primitive; a
great-circle metric swaps in at the verify without touching the
join), so a DuckDB brute-force oracle matches bit-for-bit.

Scale shape: each point emits 9 (cell, point) rows on ONE side of an
equi-join on the cell id (the other side stays 1×) — candidates are
bounded by local density × 9, never |points|²; the exact filter is
map-side on candidate rows. Skewed cells (urban cores) are ordinary
hash-agg hot keys: AQE skew-split or salting applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_self_join(
    pts: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Ordered pairs (id_a < id_b, d2) with squared planar distance
    d2 <= radius² over integer coordinates. Cell size = radius, 3×3
    neighborhood candidates, exact integer verify."""
    cell_x = F.floor(F.col(x_col) / radius).cast("long")
    cell_y = F.floor(F.col(y_col) / radius).cast("long")
    base = pts.select(
        F.col(id_col).alias("id"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        cell_x.alias("cx"),
        cell_y.alias("cy"),
    )
    # side A expands to its 9-cell neighborhood; side B stays 1x and
    # keys on its own cell — every pair within `radius` shares a
    # neighborhood by pigeonhole, so candidates are complete
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.alias("d2"))
        .filter(F.col("d2") <= radius * radius)
    )
