"""Kernel-op goldens ported from the reference's test suites:
distance_test.cc (DistanceScalarScalarTest golden table, :355-1069),
predicates_test.cc (:9-110), accessors/coverings property checks.
"""

import numpy as np
import pytest

from s2geography_spark.core import cellid as C
from s2geography_spark.core import ops
from s2geography_spark.core.geog import from_wkt

# (name, lhs, rhs, distance_m, max_distance_m) — None = null result
DISTANCE_GOLDENS = [
    ("null_distance", None, "POINT EMPTY", None, None),
    ("distance_null", "POINT EMPTY", None, None, None),
    ("null_distance_null", None, None, None, None),
    ("distance_empty", "POINT (0 0)", "POINT EMPTY", None, None),
    ("empty_distance", "POINT EMPTY", "POINT (0 0)", None, None),
    ("distance_empty_zm", "POINT ZM (0 0 0 0)", "POINT ZM EMPTY", None, None),
    ("empty_distance_zm", "POINT ZM EMPTY", "POINT ZM (0 0 0 0)", None, None),
    ("point_distance_same_point", "POINT (0 0)", "POINT (0 0)", 0.0, 0.0),
    ("point_distance_point", "POINT (0 0)", "POINT (0 1)",
     111195.10117748393, 111195.10117748393),
    ("point_distance_wraparound_lng", "POINT (0 0)", "POINT (360 361)",
     111195.10117748113, 111195.10117748113),
    ("point_distance_point_zm", "POINT ZM (0 0 1 2)", "POINT ZM (0 1 2 3)",
     111195.10117748393, 111195.10117748393),
    ("point_distance_point_z", "POINT Z (0 0 1)", "POINT Z (0 1 2)",
     111195.10117748393, 111195.10117748393),
    ("point_distance_point_m", "POINT M (0 0 2)", "POINT M (0 1 3)",
     111195.10117748393, 111195.10117748393),
    ("point_distance_linestring_on", "POINT (0 0)", "LINESTRING (0 0, 0 1)",
     0.0, 111195.10117748393),
    ("point_distance_linestring_off", "POINT (1 0)", "LINESTRING (0 0, 0 1)",
     111195.10117748393, 157249.62809250789),
    ("linestring_distance_point_on", "LINESTRING (0 0, 0 1)", "POINT (0 0)",
     0.0, 111195.10117748393),
    ("linestring_distance_point_off", "LINESTRING (0 0, 0 1)", "POINT (1 0)",
     111195.10117748393, 157249.62809250789),
    ("point_distance_polygon_inside", "POINT (0.25 0.25)",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))", 0.0, 196566.41390163341),
    ("point_distance_polygon_boundary", "POINT (0 0)",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))", 0.0, 222390.20235496786),
    ("point_distance_polygon_outside", "POINT (-1 0)",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))", 111195.10117748393, 333585.3035324518),
    ("linestring_distance_polygon_inside", "LINESTRING (0.25 0.25, 0.5 0.5)",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))", 0.0, 196566.41390163341),
    ("polygon_distance_linestring_inside", "POLYGON ((0 0, 2 0, 0 2, 0 0))",
     "LINESTRING (0.25 0.25, 0.5 0.5)", 0.0, 196566.41390163341),
    ("linestring_distance_polygon_crossing", "LINESTRING (0.25 0.25, 3 3)",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))", 0.0, 471653.02881023812),
    ("linestring_distance_polygon_through", "LINESTRING (-1 0.5, 3 0.5)",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))", 0.0, 372880.15844616242),
    ("linestring_distance_polygon_outside", "LINESTRING (3 3, 4 4)",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))", 314367.35908786188, 628758.78426786896),
    ("polygon_distance_polygon_inside", "POLYGON ((0 0, 2 0, 0 2, 0 0))",
     "POLYGON ((0.1 0.1, 0.5 0.1, 0.1 0.5, 0.1 0.1))", 0.0, 218461.11755505961),
    ("polygon_distance_polygon_crossing", "POLYGON ((0 0, 2 0, 0 2, 0 0))",
     "POLYGON ((1 0, 3 0, 1 2, 1 0))", 0.0, 400863.2536725945),
    ("polygon_distance_polygon_outside", "POLYGON ((0 0, 1 0, 0 1, 0 0))",
     "POLYGON ((30 30, 31 30, 30 31, 30 30))",
     4520972.0955287321, 4677959.9936393471),
    ("polygon_distance_polygon_poles",
     "POLYGON ((-120 80, 0 80, 120 80, -120 80))",
     "POLYGON ((-120 -80, 0 -80, 120 -80, -120 -80))",
     17791216.188397426, 20015118.21194711),
    ("linestring_distance_linestring_poles", "LINESTRING (-90 -80, 90 -80)",
     "LINESTRING (0 80, 180 80)", 18446595.193179362, 20015118.022076216),
    ("point_distance_point_poles", "POINT (0 -90)", "POINT (0 90)",
     20015118.21194711, 20015118.21194711),
    ("gc_no_polygon_distance_point",
     "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 0 1))", "POINT (0 0)",
     0.0, 785768.45419216133),
    ("gc_with_polygon_distance_point_inside",
     "GEOMETRYCOLLECTION (POINT (5 5), POLYGON ((0 0, 2 0, 0 2, 0 0)))",
     "POINT (0.25 0.25)", 0.0, 746455.18632442318),
    ("gc_with_polygon_distance_point_outside",
     "GEOMETRYCOLLECTION (POINT (30 30), POLYGON ((0 0, 2 0, 0 2, 0 0)))",
     "POINT (-1 0)", 111195.10117748393, 4677959.9936393471),
    ("gc_no_polygon_distance_linestring",
     "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 0 1))",
     "LINESTRING (0 0.5, 1 0.5)", 0.0, 747405.65220515686),
    ("gc_distance_gc_overlapping",
     "GEOMETRYCOLLECTION (POINT (5 5), POLYGON ((0 0, 2 0, 0 2, 0 0)))",
     "GEOMETRYCOLLECTION (POINT (6 6), POLYGON ((0.5 0.5, 1.5 0.5, 0.5 1.5, 0.5 0.5)))",
     0.0, 942657.82524783083),
    ("gc_distance_gc_disjoint",
     "GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 1 0, 0 1, 0 0)))",
     "GEOMETRYCOLLECTION (POINT (40 40), POLYGON ((30 30, 31 30, 30 31, 30 30)))",
     4520972.0955287321, 6012101.3650370687),
]


@pytest.mark.parametrize("name,lhs,rhs,exp,exp_max",
                         DISTANCE_GOLDENS, ids=[g[0] for g in DISTANCE_GOLDENS])
def test_distance_goldens(name, lhs, rhs, exp, exp_max):
    g1 = from_wkt(lhs) if lhs is not None else None
    g2 = from_wkt(rhs) if rhs is not None else None
    d = ops.s2_distance(g1, g2)
    if exp is None:
        assert d is None
    else:
        assert d == pytest.approx(exp, abs=1e-4), f"{name}: {d} != {exp}"
    md = ops.s2_max_distance(g1, g2)
    if exp_max is None:
        assert md is None
    else:
        # near the antipodal limit the reference's S1ChordAngle representation
        # quantizes (~3e-8 rad ≈ 0.19 m); our value is the exact geodesic max
        pi_r = np.pi * ops.EARTH_RADIUS_METERS
        tol = 0.25 if abs(exp_max - pi_r) < 1.0 else 1e-4
        assert md == pytest.approx(exp_max, abs=tol), f"{name}: {md} != {exp_max}"


def test_point_distance_pi_over_2():
    # distance_test.cc:10-18
    g1 = from_wkt("POINT (0 0)")
    g2 = from_wkt("POINT (90 0)")
    assert ops.s2_distance_radians(g1, g2) == pytest.approx(np.pi / 2, abs=1e-15)


def test_dwithin():
    # distance_test.cc:40-58: POINT(0 0) within 50km of LINESTRING(0 0,0 1)
    # but not of POINT(0 1)
    p = from_wkt("POINT (0 0)")
    assert ops.s2_dwithin(p, from_wkt("POINT (0 1)"), 50000.0) is False
    assert ops.s2_dwithin(p, from_wkt("LINESTRING (0 0, 0 1)"), 50000.0) is True
    assert ops.s2_dwithin(p, None, 50000.0) is None
    assert ops.s2_dwithin(p, from_wkt("POINT (0 1)"), -1.0) is False
    # threshold exactly at the true distance -> inclusive true
    assert ops.s2_dwithin(p, from_wkt("POINT (0 1)"), 111195.10117748393) is True


# --- predicates_test.cc fixtures ------------------------------------------

TRIANGLE = "POLYGON ((0 0, 1 0, 0 1, 0 0))"
TRIANGLE_BIG = "POLYGON ((0 0, 2 0, 0 2, 0 0))"


def test_intersects():
    poly = from_wkt(TRIANGLE)
    assert ops.s2_intersects(poly, from_wkt("POINT (0.25 0.25)")) is True
    assert ops.s2_intersects(poly, from_wkt("POINT (-1 -1)")) is False
    assert ops.s2_intersects(poly, None) is None
    assert ops.s2_intersects(poly, from_wkt("POINT EMPTY")) is False


def test_intersects_linestrings():
    poly = from_wkt(TRIANGLE_BIG)
    assert ops.s2_intersects(poly, from_wkt("LINESTRING (0.25 0.25, 0.5 0.5)")) is True
    assert ops.s2_intersects(poly, from_wkt("LINESTRING (0.25 0.25, 3 3)")) is True
    assert ops.s2_intersects(poly, from_wkt("LINESTRING (3 3, 4 4)")) is False


def test_contains():
    poly = from_wkt(TRIANGLE_BIG)
    assert ops.s2_contains(poly, from_wkt("POINT (0.25 0.25)")) is True
    assert ops.s2_contains(poly, from_wkt("POINT (-1 -1)")) is False
    assert ops.s2_contains(poly, None) is None
    assert ops.s2_contains(poly, from_wkt("POINT EMPTY")) is False
    # a point contains nothing (predicates.cc:306-310)
    assert ops.s2_contains(from_wkt("POINT (0 0)"), from_wkt("POINT (0 0)")) is False
    # polygon contains its interior linestring, not a crossing one
    assert ops.s2_contains(poly, from_wkt("LINESTRING (0.25 0.25, 0.5 0.5)")) is True
    assert ops.s2_contains(poly, from_wkt("LINESTRING (0.25 0.25, 3 3)")) is False
    # polygon in polygon
    assert ops.s2_contains(poly, from_wkt(
        "POLYGON ((0.1 0.1, 0.5 0.1, 0.1 0.5, 0.1 0.1))")) is True
    assert ops.s2_contains(poly, from_wkt("POLYGON ((1 0, 3 0, 1 2, 1 0))")) is False


def test_within_disjoint():
    poly = from_wkt(TRIANGLE_BIG)
    assert ops.s2_within(from_wkt("POINT (0.25 0.25)"), poly) is True
    assert ops.s2_disjoint(poly, from_wkt("POINT (-1 -1)")) is True
    assert ops.s2_disjoint(poly, from_wkt("POINT (0.25 0.25)")) is False


def test_equals_ring_rotation():
    # predicates_test.cc:49-68
    a = from_wkt("POLYGON ((0 0, 1 0, 0 1, 0 0))")
    b = from_wkt("POLYGON ((1 0, 0 1, 0 0, 1 0))")
    c = from_wkt("POLYGON ((0 0, 2 0, 0 2, 0 0))")
    assert ops.s2_equals(a, b) is True
    assert ops.s2_equals(a, c) is False
    assert ops.s2_equals(a, None) is None
    assert ops.s2_equals(from_wkt("POINT EMPTY"), from_wkt("POLYGON EMPTY")) is True
    # reversed linestring is geometrically equal
    assert ops.s2_equals(from_wkt("LINESTRING (0 0, 1 1)"),
                         from_wkt("LINESTRING (1 1, 0 0)")) is True


# --- accessors -------------------------------------------------------------

def test_area_length_perimeter():
    tri = from_wkt(TRIANGLE)
    R = ops.EARTH_RADIUS_METERS
    a = ops.s2_area(tri)
    # ~ half of a 1-degree square
    approx = 0.5 * (np.radians(1) * R) ** 2
    assert a == pytest.approx(approx, rel=1e-3)
    assert ops.s2_area(from_wkt("POINT (0 0)")) == 0.0
    assert ops.s2_length(from_wkt("LINESTRING (0 0, 0 1)")) == pytest.approx(
        111195.10117748393, abs=1e-6)
    assert ops.s2_length(tri) == 0.0
    assert ops.s2_perimeter(tri) > 0
    assert ops.s2_perimeter(from_wkt("LINESTRING (0 0, 0 1)")) == 0.0
    # polygon with hole: hole area subtracted
    holed = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))")
    full = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    hole = from_wkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert ops.s2_area(holed) == pytest.approx(
        ops.s2_area(full) - ops.s2_area(hole), rel=1e-12)


def test_xy():
    assert ops.s2_x(from_wkt("POINT (-64 45)")) == -64
    assert ops.s2_y(from_wkt("POINT (-64 45)")) == 45
    assert np.isnan(ops.s2_x(from_wkt("LINESTRING (0 0, 1 1)")))
    assert np.isnan(ops.s2_y(from_wkt("POINT EMPTY")))


def test_centroid():
    # symmetric square -> its center
    sq = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    c = ops.s2_centroid(sq)
    assert c.points[0][0] == pytest.approx(0.5, abs=1e-9)
    assert c.points[0][1] == pytest.approx(0.5, abs=1e-3)
    # point set centroid
    mp = from_wkt("MULTIPOINT ((0 0), (0 2))")
    c2 = ops.s2_centroid(mp)
    assert c2.points[0][1] == pytest.approx(1.0, abs=1e-9)
    # dimension priority: polygon beats point
    gc = from_wkt("GEOMETRYCOLLECTION (POINT (30 30), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))")
    c3 = ops.s2_centroid(gc)
    assert c3.points[0][0] == pytest.approx(0.5, abs=1e-9)
    assert ops.s2_centroid(from_wkt("POINT EMPTY")).is_empty()


def test_bounds():
    b = ops.s2_bounds(from_wkt("POLYGON ((0 0, 2 0, 0 2, 0 0))"))
    assert b[0] == pytest.approx(0.0, abs=1e-12)
    assert b[2] == pytest.approx(2.0, abs=1e-12)
    assert b[1] == pytest.approx(0.0, abs=1e-12)
    assert b[3] == pytest.approx(2.0, abs=1e-12)
    # geodesic bulge: east-west edge at lat 45 bulges north
    b2 = ops.s2_bounds(from_wkt("LINESTRING (0 45, 90 45)"))
    assert b2[3] > 54.7 and b2[3] < 54.8
    # antimeridian-crossing polygon: xmin > xmax (wrapped interval)
    b3 = ops.s2_bounds(from_wkt("POLYGON ((170 0, -170 0, -170 10, 170 10, 170 0))"))
    assert b3[0] == pytest.approx(170.0, abs=1e-9)
    assert b3[2] == pytest.approx(-170.0, abs=1e-9)
    # pole-containing polygon
    b4 = ops.s2_bounds(from_wkt("POLYGON ((-120 80, 0 80, 120 80, -120 80))"))
    assert b4[3] == pytest.approx(90.0, abs=1e-9)
    assert b4[0] == -180.0 and b4[2] == 180.0


# --- linear referencing -----------------------------------------------------

def test_line_interpolate_locate():
    line = from_wkt("LINESTRING (0 0, 0 1, 0 2)")
    p = ops.s2_line_interpolate_point(line, 0.5)
    assert p.points[0][1] == pytest.approx(1.0, abs=1e-9)
    p0 = ops.s2_line_interpolate_point(line, -1.0)
    assert p0.points[0][1] == pytest.approx(0.0, abs=1e-12)
    p1 = ops.s2_line_interpolate_point(line, 2.0)
    assert p1.points[0][1] == pytest.approx(2.0, abs=1e-9)
    f = ops.s2_line_locate_point(line, from_wkt("POINT (0 1)"))
    assert f == pytest.approx(0.5, abs=1e-9)
    f2 = ops.s2_line_locate_point(line, from_wkt("POINT (0.1 0.5)"))
    assert f2 == pytest.approx(0.25, abs=1e-3)


# --- coverings ---------------------------------------------------------------

def test_cell_from_point():
    g = from_wkt("POINT (-64 45)")
    cid = ops.s2_cell_from_point(g)
    expect = int(C.from_lnglat(np.array([-64.0]), np.array([45.0])).view(np.int64)[0])
    assert cid == expect
    assert ops.s2_cell_from_point(from_wkt("POINT EMPTY")) is None
    with pytest.raises(ValueError):
        ops.s2_cell_from_point(from_wkt("LINESTRING (0 0, 1 1)"))


def test_covering_points():
    # point -> its own cell (coverings.cc:246-254)
    g = from_wkt("POINT (-64 45)")
    cov = ops.s2_covering(g)
    assert cov == [ops.s2_cell_from_point(g)]
    assert ops.s2_covering(from_wkt("POINT EMPTY")) == []


def test_covering_polygon_properties():
    g = from_wkt("POLYGON ((0 0, 2 0, 0 2, 0 0))")
    cov = ops.s2_covering(g, max_cells=8)
    assert 1 <= len(cov) <= 8
    ids = np.array(cov, dtype=np.int64).view(np.uint64)
    assert C.is_valid(ids).all()
    # every vertex leaf-cell must be contained in some covering cell
    for lng, lat in [(0, 0), (2, 0), (0, 2), (0.5, 0.5), (1, 0.5)]:
        leaf = C.from_lnglat(np.array([float(lng)]), np.array([float(lat)]))
        assert C.contains(ids, np.broadcast_to(leaf, ids.shape)).any(), (lng, lat)


def test_covering_buffered_superset():
    g = from_wkt("POINT (10 10)")
    cov = np.array(ops.s2_covering_buffered(g, 100000.0), dtype=np.int64).view(np.uint64)
    # a point 50 km away must land inside the buffered covering
    near = from_wkt("POINT (10 10.45)")
    leaf = C.from_lnglat(np.array([10.0]), np.array([10.45]))
    assert C.contains(cov, np.broadcast_to(leaf, cov.shape)).any()


@pytest.mark.parametrize("wkt,expected", [
    # accessors-geog_test.cc centroid table (XY rows with exact printed
    # coordinates — validates the true-centroid math to 1e-6 deg)
    ("POINT (0 1)", (0.0, 1.0)),
    ("MULTIPOINT ((0 0), (0 1))", (0.0, 0.5)),
    ("LINESTRING (0 0, 0 1)", (0.0, 0.5)),
    ("LINESTRING (0 0, 0 1, 0 5)", (0.0, 2.5)),
    ("MULTILINESTRING ((0 0, 0 1), (10 0, 10 5))", (8.336347, 2.171205)),
    ("POLYGON ((0 0, 0 1, 1 0, 0 0))", (0.33335, 0.333344)),
    ("POLYGON ((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, 0.1 0.1))",
     (0.684859, 0.68481)),
    ("MULTIPOLYGON (((0 0, 0 1, 1 0, 0 0)), ((10 10, 10 11, 11 10, 10 10)))",
     (5.254205, 5.315242)),
    ("MULTIPOLYGON (((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, "
     "0.1 0.1)), ((10 10, 10 11, 11 10, 10 10)))", (2.624356, 2.655749)),
])
def test_centroid_reference_goldens(wkt, expected):
    got = ops.s2_centroid(from_wkt(wkt))
    assert got.points[0, 0] == pytest.approx(expected[0], abs=2e-6)
    assert got.points[0, 1] == pytest.approx(expected[1], abs=2e-6)


@pytest.mark.parametrize("wkt,area,perimeter", [
    # accessors-geog_test.cc Area/Perimeter scalar tables (exact doubles)
    ("POLYGON ((0 0, 0 1, 1 0, 0 0))", 6182489130.9071951, 379639.83044747578),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 12364036567.076418,
     444763.46872762055),
    ("MULTIPOLYGON (((0 0, 0 1, 1 0, 0 0)), ((10 10, 10 11, 11 10, 10 10)))",
     12271037686.230379, 756282.14701838186),
    ("POLYGON ((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, 0.1 0.1))",
     23744568445.094166, 911112.66968130425),
    ("GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 0 1), "
     "POLYGON ((0 0, 0 1, 1 0, 0 0)))", 6182489130.9071951,
     379639.83044747578),
])
def test_area_perimeter_reference_goldens(wkt, area, perimeter):
    g = from_wkt(wkt)
    assert ops.s2_area(g) == pytest.approx(area, rel=1e-12)
    assert ops.s2_perimeter(g) == pytest.approx(perimeter, rel=1e-12)


@pytest.mark.parametrize("wkt,expected", [
    ("POINT EMPTY", 0.0), ("POINT (0 0)", 0.0),
    ("MULTIPOINT ((0 0), (1 1))", 0.0),
    ("LINESTRING (0 0, 0 1)", 0.0),
    ("MULTILINESTRING ((0 0, 0 1), (1 0, 1 1))", 0.0),
])
def test_area_zero_for_lower_dims(wkt, expected):
    assert ops.s2_area(from_wkt(wkt)) == expected
