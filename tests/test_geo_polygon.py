"""Unit tests for the WKT polygon functions (functions/geo.py): ring
parsing, shoelace area, perimeter, centroid, and ray-casting containment —
verified against hand-computed values for known shapes, both winding
orders, and a concave ring where the crossing count actually varies.
"""

import math

import pytest
from pyspark.sql import functions as F

from cartodb_importer_spark.functions.geo import (
    st_area,
    st_centroid_x,
    st_centroid_y,
    st_perimeter,
    st_point_in_polygon,
    st_polygon,
    st_ring_xs,
    st_ring_ys,
)

# 3-4-5 right triangle at the origin (closed ring, CCW).
TRIANGLE = "POLYGON((0 0, 3 0, 0 4, 0 0))"
# Unit square, CCW and CW windings.
SQUARE_CCW = "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"
SQUARE_CW = "POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))"
# Concave L: a 2x3 rectangle missing its upper-right 1x2 notch.
L_SHAPE = "POLYGON((0 0, 2 0, 2 1, 1 1, 1 3, 0 3, 0 0))"


def _metrics(spark, wkt):
    row = (
        spark.range(1)
        .select(
            st_area(F.lit(wkt)).alias("area"),
            st_perimeter(F.lit(wkt)).alias("perim"),
            st_centroid_x(F.lit(wkt)).alias("cx"),
            st_centroid_y(F.lit(wkt)).alias("cy"),
        )
        .first()
    )
    return row


def test_ring_parse(spark):
    row = (
        spark.range(1)
        .select(
            st_ring_xs(F.lit(TRIANGLE)).alias("xs"),
            st_ring_ys(F.lit(TRIANGLE)).alias("ys"),
        )
        .first()
    )
    assert row.xs == [0.0, 3.0, 0.0, 0.0]
    assert row.ys == [0.0, 0.0, 4.0, 0.0]


def test_triangle_metrics(spark):
    m = _metrics(spark, TRIANGLE)
    assert m.area == pytest.approx(6.0)
    assert m.perim == pytest.approx(3 + 4 + 5)
    assert m.cx == pytest.approx(1.0)
    assert m.cy == pytest.approx(4.0 / 3.0)


@pytest.mark.parametrize("wkt", [SQUARE_CCW, SQUARE_CW])
def test_square_winding_invariance(spark, wkt):
    m = _metrics(spark, wkt)
    assert m.area == pytest.approx(1.0)
    assert m.perim == pytest.approx(4.0)
    assert m.cx == pytest.approx(0.5)
    assert m.cy == pytest.approx(0.5)


def test_degenerate_ring_null_centroid(spark):
    flat = "POLYGON((0 0, 2 0, 2 0, 0 0, 0 0))"
    m = _metrics(spark, flat)
    assert m.area == pytest.approx(0.0, abs=1e-12)
    assert m.cx is None or math.isnan(m.cx)


def test_st_polygon_roundtrip(spark):
    m = (
        spark.range(1)
        .select(
            st_area(
                st_polygon(F.lit(1.0), F.lit(2.0), F.lit(4.0), F.lit(6.0))
            ).alias("area")
        )
        .first()
    )
    assert m.area == pytest.approx(12.0)


def test_point_in_concave_polygon(spark):
    # (x, y, expected): notch points are outside, arm points inside.
    cases = [
        (0.5, 0.5, True),   # lower-left, inside both arms' union
        (1.5, 0.5, True),   # lower arm
        (0.5, 2.5, True),   # left arm
        (1.5, 2.5, False),  # the notch
        (2.5, 0.5, False),  # right of everything
        (0.5, 3.5, False),  # above everything
        (-0.5, 0.5, False),
    ]
    df = spark.createDataFrame(
        [(x, y, exp) for x, y, exp in cases], "x double, y double, exp boolean"
    )
    got = df.select(
        "x",
        "y",
        "exp",
        st_point_in_polygon(F.col("x"), F.col("y"), F.lit(L_SHAPE)).alias("inside"),
    ).collect()
    for r in got:
        assert r.inside == r.exp, f"({r.x},{r.y}) expected {r.exp} got {r.inside}"


def test_point_in_polygon_winding_invariance(spark):
    cw = "POLYGON((0 0, 0 3, 1 3, 1 1, 2 1, 2 0, 0 0))"  # L_SHAPE reversed
    df = spark.createDataFrame([(0.5, 0.5), (1.5, 2.5)], "x double, y double")
    got = df.select(
        st_point_in_polygon(F.col("x"), F.col("y"), F.lit(L_SHAPE)).alias("a"),
        st_point_in_polygon(F.col("x"), F.col("y"), F.lit(cw)).alias("b"),
    ).collect()
    for r in got:
        assert r.a == r.b


# --- multi-ring (holes) + geodesic -----------------------------------------

from cartodb_importer_spark.functions.geo import (  # noqa: E402
    st_area_multi,
    st_geodesic_area_km2,
    st_point_in_polygon_multi,
    st_rings,
)

# Unit square shell with a 0.5x0.5 hole in the middle.
DONUT = (
    "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0), "
    "(0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25))"
)


def test_rings_split(spark):
    row = spark.range(1).select(st_rings(F.lit(DONUT)).alias("r")).first()
    assert len(row.r) == 2
    assert row.r[0].startswith("0 0")
    assert row.r[1].startswith("0.25 0.25")


def test_single_ring_multi_matches_simple(spark):
    row = (
        spark.range(1)
        .select(
            st_area(F.lit(TRIANGLE)).alias("a"),
            st_area_multi(F.lit(TRIANGLE)).alias("am"),
        )
        .first()
    )
    assert row.am == pytest.approx(row.a)


def test_donut_area_subtracts_hole(spark):
    row = spark.range(1).select(st_area_multi(F.lit(DONUT)).alias("a")).first()
    assert row.a == pytest.approx(1.0 - 0.25)


@pytest.mark.parametrize(
    "x,y,expected",
    [
        (0.1, 0.1, True),   # in shell, outside hole
        (0.5, 0.5, False),  # inside the hole
        (1.5, 0.5, False),  # outside entirely
        (0.5, 0.1, True),   # below the hole, inside shell
    ],
)
def test_point_in_donut(spark, x, y, expected):
    row = (
        spark.range(1)
        .select(
            st_point_in_polygon_multi(
                F.lit(float(x)), F.lit(float(y)), F.lit(DONUT)
            ).alias("inside")
        )
        .first()
    )
    assert row.inside is expected


def test_geodesic_band_area(spark):
    # 10-deg-wide lon box from equator to lat 10: exact spherical area is
    # R^2 * dlam * (sin(10 deg) - sin 0).
    wkt = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"
    R = 6371.0088
    expected = R * R * math.radians(10.0) * math.sin(math.radians(10.0))
    row = (
        spark.range(1)
        .select(st_geodesic_area_km2(F.lit(wkt)).alias("a"))
        .first()
    )
    assert row.a == pytest.approx(expected, rel=1e-9)


def test_geodesic_donut_subtracts_hole(spark):
    shell = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"
    holed = (
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(2 2, 8 2, 8 8, 2 8, 2 2))"
    )
    hole_only = "POLYGON((2 2, 8 2, 8 8, 2 8, 2 2))"
    row = (
        spark.range(1)
        .select(
            st_geodesic_area_km2(F.lit(shell)).alias("s"),
            st_geodesic_area_km2(F.lit(holed)).alias("h"),
            st_geodesic_area_km2(F.lit(hole_only)).alias("o"),
        )
        .first()
    )
    assert row.h == pytest.approx(row.s - row.o, rel=1e-9)


def test_spatial_join_blocked_equals_naive(spark):
    """The grid-cell blocked spatial join must be lossless vs the naive
    range-predicate join, including points exactly on cell boundaries
    (the floor(x/cell) float hazard the pad cell exists for)."""
    from pyspark.sql import functions as F

    from cartodb_importer_spark.operators.spatial import (
        spatial_join_points_rects,
    )

    pts = spark.createDataFrame(
        [(float(i) * 0.01, float(j) * 0.01) for i in range(9) for j in range(11)],
        "x double, y double",
    )
    rects = spark.createDataFrame(
        [(0, 0.02, 0.03, 0.06, 0.07), (1, 0.0, 0.0, 0.02, 0.02)],
        "rect_id int, xmin double, ymin double, xmax double, ymax double",
    )
    blocked = spatial_join_points_rects(pts, rects, cell=0.02)
    naive = pts.crossJoin(rects).filter(
        (F.col("x") >= F.col("xmin")) & (F.col("x") <= F.col("xmax"))
        & (F.col("y") >= F.col("ymin")) & (F.col("y") <= F.col("ymax"))
    )
    got = {(r["rect_id"], r["x"], r["y"]) for r in blocked.collect()}
    want = {(r["rect_id"], r["x"], r["y"]) for r in naive.collect()}
    assert got == want
    assert len(got) > 10
    # the blocked plan is an equi-join, never a cartesian
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_zorder_bbox_range_property(spark):
    """Morton-key containment: every point inside a quantized bbox has a
    z-value within [z(lo_corner), z(hi_corner)] — the property that turns
    a 2-D bbox predicate into one coarse z-range scan prune."""
    from cartodb_importer_spark.queries import QUERIES

    rows = QUERIES["geo_zorder_key"](spark, "/root/testdata/sf0.001").collect()

    def interleave(xq, yq):
        z = 0
        for i in range(16):
            z |= ((xq >> i) & 1) << (2 * i)
            z |= ((yq >> i) & 1) << (2 * i + 1)
        return z

    # spark-side zval must equal the reference interleave
    for r in rows[:50]:
        assert r["zval"] == interleave(r["xq"], r["yq"])

    xs = sorted(r["xq"] for r in rows)
    ys = sorted(r["yq"] for r in rows)
    x_lo, x_hi = xs[len(xs) // 4], xs[len(xs) // 2]
    y_lo, y_hi = ys[len(ys) // 4], ys[len(ys) // 2]
    z_lo, z_hi = interleave(x_lo, y_lo), interleave(x_hi, y_hi)
    inside = [
        r for r in rows
        if x_lo <= r["xq"] <= x_hi and y_lo <= r["yq"] <= y_hi
    ]
    assert inside, "bbox should be non-empty"
    assert all(z_lo <= r["zval"] <= z_hi for r in inside)
