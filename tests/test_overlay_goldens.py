"""Overlay goldens ported from the reference's build_test.cc parameterized
suites (UnionTest/IntersectionTest/DifferenceTest/SymDifferenceTest,
/root/reference/src/s2geography/build_test.cc:223-680): empty typing,
mixed dimensions, closed-model dimension collapse, and the adjacent /
shared-edge cases the round-1 engine could not handle.

Comparison: typed-EMPTY expectations compare WKT exactly; non-empty
expectations compare geometrically after snapping both sides to 1e-5
degrees (the reference prints tessellated geodesic crossings to 6
decimals, e.g. '10 5.019002')."""

import pytest

from s2geography_spark.core import build as B
from s2geography_spark.core import ops
from s2geography_spark.core.geog import from_wkt, to_wkt


def check(result, expected_wkt):
    exp = from_wkt(expected_wkt)
    if exp.is_empty():
        assert result.is_empty(), f"got {to_wkt(result)}, want {expected_wkt}"
        assert to_wkt(result) == expected_wkt
        return
    ra = B.s2_reduce_precision(result, 5)
    rb = B.s2_reduce_precision(exp, 5)
    assert ops.s2_equals(ra, rb) is True, \
        f"got {to_wkt(result, 8)}, want {expected_wkt}"


SQ10 = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"

UNION = [
    ("both_empty", "POINT EMPTY", "POINT EMPTY", "POINT EMPTY"),
    ("empty_a_point", "POINT EMPTY", "POINT (0 0)", "POINT (0 0)"),
    ("empty_b_point", "POINT (0 0)", "POINT EMPTY", "POINT (0 0)"),
    ("empty_a_polygon", "POLYGON EMPTY", SQ10, SQ10),
    ("empty_b_polygon", SQ10, "POLYGON EMPTY", SQ10),
    ("point_same", "POINT (0 0)", "POINT (0 0)", "POINT (0 0)"),
    ("point_different", "POINT (0 0)", "POINT (0 1)",
     "MULTIPOINT ((0 0), (0 1))"),
    ("multipoint_point", "MULTIPOINT ((0 0), (1 1))", "POINT (2 2)",
     "MULTIPOINT ((0 0), (1 1), (2 2))"),
    ("multipoint_point_overlap", "MULTIPOINT ((0 0), (1 1))", "POINT (0 0)",
     "MULTIPOINT ((0 0), (1 1))"),
    ("point_very_close", "POINT (0 0)", "POINT (0 0.001)",
     "MULTIPOINT ((0 0), (0 0.001))"),
    ("point_very_far", "POINT (0 0)", "POINT (180 0)",
     "MULTIPOINT ((0 0), (180 0))"),
    ("linestring_disjoint", "LINESTRING (0 0, 10 0)",
     "LINESTRING (0 10, 10 10)",
     "MULTILINESTRING ((0 0, 10 0), (0 10, 10 10))"),
    ("linestring_same", "LINESTRING (0 0, 10 0)", "LINESTRING (0 0, 10 0)",
     "LINESTRING (0 0, 10 0)"),
    ("linestring_very_close", "LINESTRING (0 0, 10 0)",
     "LINESTRING (0 0.001, 10 0.001)",
     "MULTILINESTRING ((0 0, 10 0), (0 0.001, 10 0.001))"),
    ("linestring_very_far", "LINESTRING (0 0, 10 0)",
     "LINESTRING (170 0, 180 0)",
     "MULTILINESTRING ((0 0, 10 0), (170 0, 180 0))"),
    ("polygon_disjoint", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((10 10, 15 10, 15 15, 10 15, 10 10))",
     "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
     "((10 10, 15 10, 15 15, 10 15, 10 10)))"),
    ("polygon_same", SQ10, SQ10, SQ10),
    ("polygon_very_close", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((5.001 0, 10 0, 10 5, 5.001 5, 5.001 0))",
     "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
     "((5.001 0, 10 0, 10 5, 5.001 5, 5.001 0)))"),
    ("polygon_very_far", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((170 -5, 175 -5, 175 0, 170 0, 170 -5))",
     "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
     "((170 -5, 175 -5, 175 0, 170 0, 170 -5)))"),
    ("point_linestring", "POINT (5 5)", "LINESTRING (0 0, 10 0)",
     "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 10 0))"),
    ("point_polygon", "POINT (5 5)", SQ10, SQ10),
    ("point_outside_polygon", "POINT (20 20)", SQ10,
     "GEOMETRYCOLLECTION (POINT (20 20), "
     "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)))"),
    ("linestring_polygon", "LINESTRING (0 0, 10 0)", SQ10, SQ10),
    ("linestring_outside_polygon", "LINESTRING (20 0, 30 0)", SQ10,
     "GEOMETRYCOLLECTION (LINESTRING (20 0, 30 0), "
     "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)))"),
]


@pytest.mark.parametrize("name,wa,wb,expected", UNION,
                         ids=[r[0] for r in UNION])
def test_union_goldens(name, wa, wb, expected):
    check(B.s2_union(from_wkt(wa), from_wkt(wb)), expected)


INTERSECTION = [
    ("both_empty", "POINT EMPTY", "POINT EMPTY", "GEOMETRYCOLLECTION EMPTY"),
    ("empty_a_point", "POINT EMPTY", "POINT (0 0)",
     "GEOMETRYCOLLECTION EMPTY"),
    ("empty_b_point", "POINT (0 0)", "POINT EMPTY",
     "GEOMETRYCOLLECTION EMPTY"),
    ("empty_a_polygon", "POLYGON EMPTY", SQ10, "GEOMETRYCOLLECTION EMPTY"),
    ("empty_b_polygon", SQ10, "POLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY"),
    ("point_same", "POINT (0 0)", "POINT (0 0)", "POINT (0 0)"),
    ("point_different", "POINT (0 0)", "POINT (0 1)", "POINT EMPTY"),
    ("multipoint_point_overlap", "MULTIPOINT ((0 0), (1 1))", "POINT (0 0)",
     "POINT (0 0)"),
    ("multipoint_point_disjoint", "MULTIPOINT ((0 0), (1 1))", "POINT (2 2)",
     "POINT EMPTY"),
    ("point_very_far", "POINT (0 0)", "POINT (180 0)", "POINT EMPTY"),
    ("linestring_disjoint", "LINESTRING (0 0, 10 0)",
     "LINESTRING (0 10, 10 10)", "LINESTRING EMPTY"),
    ("linestring_same", "LINESTRING (0 0, 10 0)", "LINESTRING (0 0, 10 0)",
     "LINESTRING (0 0, 10 0)"),
    ("linestring_crossing", "LINESTRING (0 -5, 0 5)", "LINESTRING (-5 0, 5 0)",
     "POINT (0 0)"),
    ("polygon_disjoint", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((10 10, 15 10, 15 15, 10 15, 10 10))", "POLYGON EMPTY"),
    ("polygon_same", SQ10, SQ10, SQ10),
    ("polygon_overlap", SQ10, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))",
     "POLYGON ((5 5, 10 5.019002, 10 10, 5 10.037423, 5 5))"),
    ("polygon_contains", "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))",
     "POLYGON ((5 5, 10 5, 10 10, 5 10, 5 5))",
     "POLYGON ((5 5, 10 5, 10 10, 5 10, 5 5))"),
    ("point_on_linestring", "POINT (0 0)", "LINESTRING (0 0, 10 0)",
     "POINT (0 0)"),
    ("point_off_linestring", "POINT (5 5)", "LINESTRING (0 0, 10 0)",
     "POINT EMPTY"),
    ("point_inside_polygon", "POINT (5 5)", SQ10, "POINT (5 5)"),
    ("point_outside_polygon", "POINT (20 20)", SQ10, "POINT EMPTY"),
    ("point_on_polygon_boundary", "POINT (10 5)", SQ10, "POINT (10 5)"),
    ("linestring_inside_polygon", "LINESTRING (2 5, 8 5)", SQ10,
     "LINESTRING (2 5, 8 5)"),
    ("linestring_outside_polygon", "LINESTRING (20 0, 30 0)", SQ10,
     "LINESTRING EMPTY"),
    ("linestring_crossing_polygon", "LINESTRING (-5 5, 5 5)", SQ10,
     "LINESTRING (0 5.019002, 5 5)"),
]


@pytest.mark.parametrize("name,wa,wb,expected", INTERSECTION,
                         ids=[r[0] for r in INTERSECTION])
def test_intersection_goldens(name, wa, wb, expected):
    check(B.s2_intersection(from_wkt(wa), from_wkt(wb)), expected)


DIFFERENCE = [
    ("empty_a", "POINT EMPTY", "POINT (0 0)", "GEOMETRYCOLLECTION EMPTY"),
    ("empty_b_point", "POINT (0 0)", "POINT EMPTY", "POINT (0 0)"),
    ("empty_b_polygon", SQ10, "POLYGON EMPTY", SQ10),
    ("point_very_far", "POINT (0 0)", "POINT (180 0)", "POINT (0 0)"),
    ("polygon_very_far", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((170 -5, 175 -5, 175 0, 170 0, 170 -5))",
     "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"),
    ("point_same", "POINT (0 0)", "POINT (0 0)", "POINT EMPTY"),
    ("point_different", "POINT (0 0)", "POINT (0 1)", "POINT (0 0)"),
    ("linestring_same", "LINESTRING (0 0, 10 0)", "LINESTRING (0 0, 10 0)",
     "LINESTRING EMPTY"),
    ("linestring_disjoint", "LINESTRING (0 0, 10 0)",
     "LINESTRING (0 10, 10 10)", "LINESTRING (0 0, 10 0)"),
    ("polygon_same", SQ10, SQ10, "POLYGON EMPTY"),
    ("polygon_disjoint", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((10 10, 15 10, 15 15, 10 15, 10 10))",
     "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"),
    ("polygon_overlap", SQ10, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))",
     "POLYGON ((5 10.037423, 0 10, 0 0, 10 0, 10 5.019002, 5 5, "
     "5 10.037423))"),
    ("polygon_a_contains_b", "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))",
     "POLYGON ((5 5, 10 5, 10 10, 5 10, 5 5))",
     "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), "
     "(5 10, 10 10, 10 5, 5 5, 5 10))"),
    ("polygon_b_contains_a", "POLYGON ((5 5, 10 5, 10 10, 5 10, 5 5))",
     "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))", "POLYGON EMPTY"),
]


@pytest.mark.parametrize("name,wa,wb,expected", DIFFERENCE,
                         ids=[r[0] for r in DIFFERENCE])
def test_difference_goldens(name, wa, wb, expected):
    check(B.s2_difference(from_wkt(wa), from_wkt(wb)), expected)


SYMDIFFERENCE = [
    ("both_empty", "POINT EMPTY", "POINT EMPTY", "POINT EMPTY"),
    ("empty_a", "POINT EMPTY", "POINT (0 0)", "POINT (0 0)"),
    ("empty_a_polygon", "POLYGON EMPTY", SQ10, SQ10),
    ("empty_b", "POINT (0 0)", "POINT EMPTY", "POINT (0 0)"),
    ("empty_b_polygon", SQ10, "POLYGON EMPTY", SQ10),
    ("point_very_far", "POINT (0 0)", "POINT (180 0)",
     "MULTIPOINT ((0 0), (180 0))"),
    ("polygon_very_far", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((170 -5, 175 -5, 175 0, 170 0, 170 -5))",
     "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
     "((170 -5, 175 -5, 175 0, 170 0, 170 -5)))"),
    ("point_same", "POINT (0 0)", "POINT (0 0)", "POINT EMPTY"),
    ("point_different", "POINT (0 0)", "POINT (0 1)",
     "MULTIPOINT ((0 0), (0 1))"),
    ("linestring_same", "LINESTRING (0 0, 10 0)", "LINESTRING (0 0, 10 0)",
     "LINESTRING EMPTY"),
    ("linestring_disjoint", "LINESTRING (0 0, 10 0)",
     "LINESTRING (0 10, 10 10)",
     "MULTILINESTRING ((0 0, 10 0), (0 10, 10 10))"),
    ("polygon_same", SQ10, SQ10, "POLYGON EMPTY"),
    ("polygon_disjoint", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
     "POLYGON ((10 10, 15 10, 15 15, 10 15, 10 10))",
     "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
     "((10 10, 15 10, 15 15, 10 15, 10 10)))"),
    ("polygon_b_contains_a", "POLYGON ((5 5, 10 5, 10 10, 5 10, 5 5))",
     "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))",
     "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), "
     "(5 10, 10 10, 10 5, 5 5, 5 10))"),
]


@pytest.mark.parametrize("name,wa,wb,expected", SYMDIFFERENCE,
                         ids=[r[0] for r in SYMDIFFERENCE])
def test_symdifference_goldens(name, wa, wb, expected):
    check(B.s2_sym_difference(from_wkt(wa), from_wkt(wb)), expected)


# -- shared-edge / adjacency cases (the round-2 robustness target; semantics
#    follow the CLOSED model + closed-set normalization of BuildOverlay,
#    build.cc:1236-1257) -------------------------------------------------------

SQ_A = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
SQ_B = "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"  # shares the edge lng=1
SQ_C = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"  # shares only corner (1,1)


def test_adjacent_union_merges():
    r = B.s2_union(from_wkt(SQ_A), from_wkt(SQ_B))
    assert len(r.polys) == 1 and len(r.polys[0]) == 1
    exp = from_wkt("POLYGON ((0 0, 1 0, 2 0, 2 1, 1 1, 0 1, 0 0))")
    assert ops.s2_equals(r, exp) is True


def test_adjacent_intersection_is_shared_edge():
    r = B.s2_intersection(from_wkt(SQ_A), from_wkt(SQ_B))
    assert r.dimension() == 1 and len(r.lines) == 1
    assert ops.s2_equals(r, from_wkt("LINESTRING (1 0, 1 1)")) is True


def test_adjacent_difference_keeps_a():
    r = B.s2_difference(from_wkt(SQ_A), from_wkt(SQ_B))
    assert ops.s2_equals(r, from_wkt(SQ_A)) is True


def test_corner_touch_union_two_rings():
    r = B.s2_union(from_wkt(SQ_A), from_wkt(SQ_C))
    assert len(r.polys) == 2


def test_corner_touch_intersection_is_point():
    r = B.s2_intersection(from_wkt(SQ_A), from_wkt(SQ_C))
    assert ops.s2_equals(r, from_wkt("POINT (1 1)")) is True


def test_partial_shared_edge_union():
    # B shares only half of A's right edge
    b = from_wkt("POLYGON ((1 0, 2 0, 2 0.5, 1 0.5, 1 0))")
    r = B.s2_union(from_wkt(SQ_A), b)
    assert len(r.polys) == 1
    area = ops.s2_area(r)
    expected = ops.s2_area(from_wkt(SQ_A)) + ops.s2_area(b)
    assert abs(area - expected) / expected < 1e-9


def test_collinear_partial_line_overlap():
    a = from_wkt("LINESTRING (0 0, 10 0)")
    b = from_wkt("LINESTRING (5 0, 15 0)")
    inter = B.s2_intersection(a, b)
    assert ops.s2_length(inter) == pytest.approx(
        ops.s2_length(from_wkt("LINESTRING (5 0, 10 0)")), rel=1e-9)
    diff = B.s2_difference(a, b)
    assert ops.s2_length(diff) == pytest.approx(
        ops.s2_length(from_wkt("LINESTRING (0 0, 5 0)")), rel=1e-9)
    uni = B.s2_union(a, b)
    assert ops.s2_length(uni) == pytest.approx(
        ops.s2_length(from_wkt("LINESTRING (0 0, 15 0)")), rel=1e-9)


def test_overlay_across_antimeridian():
    """Overlay of polygons straddling lng=180: xyz-space algebra is
    projection-free, so crossing the antimeridian is not special."""
    a = from_wkt("POLYGON ((179 0, -179 0, -179 2, 179 2, 179 0))")
    b = from_wkt("POLYGON ((179.5 1, -179.5 1, -179.5 3, 179.5 3, 179.5 1))")
    i = B.s2_intersection(a, b)
    u = B.s2_union(a, b)
    box = ops.s2_area(from_wkt("POLYGON ((0 1, 1 1, 1 2, 0 2, 0 1))"))
    assert ops.s2_area(i) == pytest.approx(box, rel=1e-3)
    assert ops.s2_area(u) == pytest.approx(
        ops.s2_area(a) + ops.s2_area(b) - ops.s2_area(i), rel=1e-12)
    # shared-edge adjacency across the antimeridian merges to one ring
    adj = from_wkt("POLYGON ((-179 0, -178 0, -178 2, -179 2, -179 0))")
    m = B.s2_union(a, adj)
    assert len(m.polys) == 1 and len(m.polys[0]) == 1
    assert ops.s2_area(m) == pytest.approx(
        ops.s2_area(a) + ops.s2_area(adj), rel=1e-9)
