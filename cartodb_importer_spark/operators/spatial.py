"""Blocked spatial join: points x regions via grid-cell equi-join.

The naive point-in-region join is a cartesian/theta join — quadratic and
unshuffleable. The scalable formulation (the same blocking PostGIS gets
from its GIST index, re-expressed as a shuffle key):

1. each region explodes to the grid cells its bbox overlaps (a handful);
2. each point maps to exactly one cell;
3. equi-join on the cell id — only co-located candidates meet;
4. the exact containment predicate filters candidates.

At 100 TB the join is hash-partitioned on the cell id: work is
proportional to candidates, not |points| x |regions|. Cell size trades
replication of regions (bbox cells) against candidate precision — pick
~the median region diameter (SCALE.md geo note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cell_of(x: Column, y: Column, cell: float) -> Column:
    """(cx, cy) integer grid coordinates of a point, as a struct."""
    return F.struct(
        F.floor(x / cell).cast("int").alias("cx"),
        F.floor(y / cell).cast("int").alias("cy"),
    )


def rect_cells(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column, cell: float
) -> Column:
    """All grid cells a rectangle's bbox overlaps, padded by ONE cell on
    every side (array of structs). The pad is load-bearing correctness,
    not belt-and-braces: floor(x/cell) is not monotone across float
    noise — a point at x = 0.06 (stored 0.0599…98) floors one cell BELOW
    floor(xmin/cell) for a rect whose xmin computed to 0.0600…00, and the
    blocking would silently drop true matches. One pad cell covers any
    such boundary discrepancy; the exact post-join predicate discards the
    extra candidates. Bounded by (diameter/cell + 3)^2 — keep cell near
    region size."""
    cx0 = F.floor(xmin / cell).cast("int") - 1
    cx1 = F.floor(xmax / cell).cast("int") + 1
    cy0 = F.floor(ymin / cell).cast("int") - 1
    cy1 = F.floor(ymax / cell).cast("int") + 1
    return F.flatten(
        F.transform(
            F.sequence(cx0, cx1),
            lambda cx: F.transform(
                F.sequence(cy0, cy1),
                lambda cy: F.struct(
                    cx.cast("int").alias("cx"), cy.cast("int").alias("cy")
                ),
            ),
        )
    )


def spatial_join_points_rects(
    points: DataFrame,
    rects: DataFrame,
    x: str = "x",
    y: str = "y",
    cell: float = 0.02,
    closed: bool = True,
) -> DataFrame:
    """Join point rows to rectangle rows they fall inside.

    ``points`` needs columns x, y; ``rects`` needs rect_id, xmin, ymin,
    xmax, ymax. Returns points columns + rect_id, one row per (point,
    containing rect). The plan is an equi-join on (cx, cy) — never a
    cartesian — with the exact bounds check applied post-join; broadcast
    kicks in automatically when the exploded rect side is small."""
    p = points.withColumn("__cell", cell_of(F.col(x), F.col(y), cell))
    r = rects.withColumn(
        "__cell",
        F.explode(
            rect_cells(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), cell
            )
        ),
    )
    lo = F.col(x) >= F.col("xmin") if closed else F.col(x) > F.col("xmin")
    hi = F.col(x) <= F.col("xmax") if closed else F.col(x) < F.col("xmax")
    lo_y = F.col(y) >= F.col("ymin") if closed else F.col(y) > F.col("ymin")
    hi_y = F.col(y) <= F.col("ymax") if closed else F.col(y) < F.col("ymax")
    return (
        p.join(r, "__cell")
        .filter(lo & hi & lo_y & hi_y)
        .drop("__cell", "xmin", "ymin", "xmax", "ymax")
    )
