"""Build-op goldens from the reference's accessors-geog_test.cc (convex
hull :497-556, point-on-surface :564-630) and build_test.cc semantics
(overlay empty/disjoint shortcuts), plus simplify/buffer/reduce-precision
property checks.
"""

import numpy as np
import pytest

from s2geography_spark.core import build as B
from s2geography_spark.core import ops, sphere
from s2geography_spark.core.geog import from_wkt, to_wkt

HULL_GOLDENS = [
    ("point_empty", "POINT EMPTY", "GEOMETRYCOLLECTION EMPTY"),
    ("linestring_empty", "LINESTRING EMPTY", "GEOMETRYCOLLECTION EMPTY"),
    ("polygon_empty", "POLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY"),
    ("point", "POINT (0 1)", "POINT (0 1)"),
    ("multipoint_two", "MULTIPOINT ((0 0), (0 1))", "LINESTRING (0 0, 0 1)"),
    ("multipoint_three", "MULTIPOINT ((0 0), (0 1), (1 0))",
     "POLYGON ((0 0, 1 0, 0 1, 0 0))"),
    ("linestring", "LINESTRING (0 0, 0 1)", "LINESTRING (0 0, 0 1)"),
    ("linestring_non_colinear", "LINESTRING (0 0, 0 1, 1 0)",
     "POLYGON ((0 0, 1 0, 0 1, 0 0))"),
    ("triangle", "POLYGON ((0 0, 0 1, 1 0, 0 0))",
     "POLYGON ((0 0, 1 0, 0 1, 0 0))"),
    ("polygon_with_hole",
     "POLYGON ((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, 0.1 0.1))",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))"),
    ("multipolygon_with_hole",
     "MULTIPOLYGON (((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, 0.1 0.1)),"
     " ((10 10, 10 11, 11 10, 10 10)))",
     "POLYGON ((0 0, 2 0, 11 10, 10 11, 0 2, 0 0))"),
    ("geometrycollection",
     "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 0 1),"
     " POLYGON ((0 0, 0 1, 1 0, 0 0)))",
     "POLYGON ((0 0, 1 0, 5 5, 0 1, 0 0))"),
]


@pytest.mark.parametrize("name,wkt,expected", HULL_GOLDENS,
                         ids=[g[0] for g in HULL_GOLDENS])
def test_convex_hull_goldens(name, wkt, expected):
    got = B.s2_convex_hull(from_wkt(wkt))
    exp = from_wkt(expected)
    if exp.is_empty():
        assert got.is_empty()
    else:
        assert ops.s2_equals(got, exp) is True, (to_wkt(got), expected)
    assert B.s2_convex_hull(None) is None


def test_linestring_colinear_hull():
    # reference golden: LINESTRING (0 0, 0 1, 0 2) -> LINESTRING (0 0, 0 2)
    got = B.s2_convex_hull(from_wkt("LINESTRING (0 0, 0 1, 0 2)"))
    assert got.dimension() == 1
    ends = {tuple(got.lines[0][0]), tuple(got.lines[0][-1])}
    assert ends == {(0.0, 0.0), (0.0, 2.0)}


POS_SIMPLE = [
    ("point", "POINT (0 1)", "POINT (0 1)"),
    ("multipoint", "MULTIPOINT ((0 0), (0 1))", "POINT (0 1)"),
    ("linestring", "LINESTRING (0 0, 0 1)", "POINT (0 1)"),
    ("linestring_three_vertices", "LINESTRING (0 0, 0 1, 0 5)", "POINT (0 1)"),
    ("multilinestring", "MULTILINESTRING ((0 0, 0 1), (10 0, 10 5))",
     "POINT (10 0)"),
]


@pytest.mark.parametrize("name,wkt,expected", POS_SIMPLE,
                         ids=[g[0] for g in POS_SIMPLE])
def test_point_on_surface_dim01(name, wkt, expected):
    got = B.s2_point_on_surface(from_wkt(wkt))
    assert ops.s2_equals(got, from_wkt(expected)) is True, to_wkt(got)


def test_point_on_surface_polygon_interior():
    for wkt in ["POLYGON ((0 0, 0 1, 1 0, 0 0))",
                "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
                "POLYGON ((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, 0.1 0.1))"]:
        g = from_wkt(wkt)
        p = B.s2_point_on_surface(g)
        assert ops.s2_contains(g, p) is True, (wkt, to_wkt(p))
    assert B.s2_point_on_surface(from_wkt("POINT EMPTY")).is_empty()
    assert B.s2_point_on_surface(None) is None


def test_simplify():
    line = from_wkt("LINESTRING (0 0, 0.0001 1, 0 2)")
    s = B.s2_simplify(line, 50)       # 50 m tolerance keeps the bump (~11 m off-line? no: 0.0001 deg ~ 11 m -> dropped)
    s2 = B.s2_simplify(line, 1.0)     # 1 m keeps it
    assert len(s.lines[0]) == 2
    assert len(s2.lines[0]) == 3
    # negative tolerance treated as abs (build.cc:1214-1216)
    s3 = B.s2_simplify(line, -50)
    assert len(s3.lines[0]) == 2
    # polygon ring simplification keeps validity
    ring = from_wkt("POLYGON ((0 0, 1 0.0001, 2 0, 2 2, 0 2, 0 0))")
    sp = B.s2_simplify(ring, 100)
    assert ops.s2_area(sp) == pytest.approx(ops.s2_area(ring), rel=1e-3)
    assert len(sp.polys[0][0]) == 5  # bump vertex removed


def test_reduce_precision():
    g = from_wkt("LINESTRING (0.123456 0.654321, 1.111111 1.999999)")
    r = B.s2_reduce_precision(g, 2)
    np.testing.assert_allclose(r.lines[0], [[0.12, 0.65], [1.11, 2.0]])
    # collapsing ring -> dropped
    tiny = from_wkt("POLYGON ((0 0, 0.001 0, 0 0.001, 0 0))")
    assert B.s2_reduce_precision(tiny, 1).is_empty()


def test_buffer_point():
    g = from_wkt("POINT (10 45)")
    buf = B.s2_buffer(g, 100000.0)  # 100 km
    assert buf.dimension() == 2
    # area ~ pi r^2 (spherical correction tiny at 100 km)
    area = ops.s2_area(buf)
    assert area == pytest.approx(np.pi * 100000.0 ** 2, rel=2e-2)
    # the center is inside; a point 99 km away inside; 101 km away outside
    assert ops.s2_contains(buf, g) is True
    near = from_wkt("POINT (10 45.89)")   # ~99 km north
    far = from_wkt("POINT (10 45.92)")    # ~102 km north
    assert ops.s2_contains(buf, near) is True
    assert ops.s2_contains(buf, far) is False
    assert B.s2_buffer(g, -1.0).is_empty()


def test_buffer_line_and_polygon():
    R = ops.EARTH_RADIUS_METERS
    r = 50000.0
    # line buffer area ~ L*2r + pi r^2 (capsule)
    line = from_wkt("LINESTRING (10 45, 12 45)")
    buf = B.s2_buffer(line, r)
    approx = ops.s2_length(line) * 2 * r + np.pi * r * r
    assert ops.s2_area(buf) == pytest.approx(approx, rel=1e-2)
    assert ops.s2_contains(buf, from_wkt("POINT (11 45.43)")) is True  # ~48 km
    assert ops.s2_contains(buf, from_wkt("POINT (11 45.47)")) is False  # ~52 km
    # polygon buffer area ~ A + P*r + pi r^2
    poly = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    bp = B.s2_buffer(poly, r)
    approx2 = ops.s2_area(poly) + ops.s2_perimeter(poly) * r + np.pi * r * r
    assert ops.s2_area(bp) == pytest.approx(approx2, rel=1e-2)
    assert ops.s2_contains(bp, from_wkt("POINT (2.44 1)")) is True
    assert ops.s2_contains(bp, from_wkt("POINT (2.5 2.5)")) is False
    # corner polyline: the joint is rounded and filled
    zig = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0, 1 1)"), 30000.0)
    assert ops.s2_contains(zig, from_wkt("POINT (1 0.5)")) is True
    assert ops.s2_contains(zig, from_wkt("POINT (0.5 0.1)")) is True


def test_overlay_intersection():
    tri = from_wkt("POLYGON ((0 0, 2 0, 0 2, 0 0))")
    # empty / disjoint shortcuts (build.cc:1339-1359)
    assert B.s2_intersection(tri, from_wkt("POINT EMPTY")).is_empty()
    assert B.s2_intersection(tri, from_wkt("POLYGON ((30 30, 31 30, 30 31, 30 30))")).is_empty()
    # point x polygon
    mp = from_wkt("MULTIPOINT ((0.25 0.25), (-1 -1), (0.5 0.5))")
    r = B.s2_intersection(mp, tri)
    assert {tuple(p) for p in r.points} == {(0.25, 0.25), (0.5, 0.5)}
    # line x polygon: clip
    line = from_wkt("LINESTRING (-1 0.5, 3 0.5)")
    clipped = B.s2_intersection(line, tri)
    assert clipped.dimension() == 1
    L = ops.s2_length(clipped)
    # inside portion spans lng 0 -> ~1.5 at lat 0.5
    assert L == pytest.approx(ops.s2_length(from_wkt("LINESTRING (0 0.5, 1.5 0.5)")), rel=2e-3)
    # polygon containment fast path
    inner = from_wkt("POLYGON ((0.1 0.1, 0.5 0.1, 0.1 0.5, 0.1 0.1))")
    assert ops.s2_equals(B.s2_intersection(tri, inner), inner) is True
    # general crossing overlay (tests/test_overlay.py verifies exactness)
    crossing = B.s2_intersection(tri, from_wkt("POLYGON ((1 0, 3 0, 1 2, 1 0))"))
    assert crossing.dimension() == 2 and ops.s2_area(crossing) > 0


def test_overlay_union_difference_symdiff():
    tri = from_wkt("POLYGON ((0 0, 2 0, 0 2, 0 0))")
    far = from_wkt("POLYGON ((30 30, 31 30, 30 31, 30 30))")
    # union: empty regurgitation + disjoint concat (build.cc:1271-1299)
    assert ops.s2_equals(B.s2_union(tri, from_wkt("POLYGON EMPTY")), tri) is True
    u = B.s2_union(tri, far)
    assert len(u.polys) == 2
    inner = from_wkt("POLYGON ((0.1 0.1, 0.5 0.1, 0.1 0.5, 0.1 0.1))")
    assert ops.s2_equals(B.s2_union(tri, inner), tri) is True
    # difference
    assert ops.s2_equals(B.s2_difference(tri, far), tri) is True
    mp = from_wkt("MULTIPOINT ((0.25 0.25), (-1 -1))")
    d = B.s2_difference(mp, tri)
    assert {tuple(p) for p in d.points} == {(-1.0, -1.0)}
    line = from_wkt("LINESTRING (-1 0.5, 3 0.5)")
    dl = B.s2_difference(line, tri)
    assert dl.dimension() == 1 and len(dl.lines) == 2
    # symdifference of disjoint = both
    sd = B.s2_sym_difference(tri, far)
    assert len(sd.polys) == 2
    assert ops.s2_equals(B.s2_sym_difference(tri, from_wkt("POLYGON EMPTY")), tri) is True


def test_aggregates(spark):
    from pyspark.sql import functions as F
    from s2geography_spark.core.geog import to_wkb, from_wkb
    from s2geography_spark.operators.aggregates import (centroid_agg,
                                                        convex_hull_agg,
                                                        union_agg)
    rows = []
    for k in range(40):
        lng, lat = float(k % 8), float(k // 8)
        rows.append((k % 2, to_wkb(from_wkt(f"POINT ({lng} {lat})"))))
    df = spark.createDataFrame(rows, "grp int, geog binary")

    cen = {r.grp: (r.centroid_lng, r.centroid_lat)
           for r in centroid_agg(df, "geog", ["grp"]).collect()}
    assert len(cen) == 2
    for grp, (clng, clat) in cen.items():
        pts = [(float(k % 8), float(k // 8)) for k in range(40) if k % 2 == grp]
        v = sphere.lnglat_to_xyz(np.array(pts)).sum(axis=0)
        v /= np.linalg.norm(v)
        exp = sphere.xyz_to_lnglat(v)
        assert clng == pytest.approx(exp[0], abs=1e-9)
        assert clat == pytest.approx(exp[1], abs=1e-9)

    hull = {r.grp: from_wkb(bytes(r.hull))
            for r in convex_hull_agg(df, "geog", ["grp"]).collect()}
    for grp, h in hull.items():
        assert h.dimension() == 2
        pts = [(float(k % 8), float(k // 8)) for k in range(40) if k % 2 == grp]
        for lng, lat in pts:
            assert ops.s2_contains(h, from_wkt(f"POINT ({lng} {lat})")) or \
                sphere.point_on_boundary(
                    sphere.lnglat_to_xyz(np.array([[lng, lat]])),
                    *h.ring_edges_xyz(), eps=1e-9)[0]

    un = {r.grp: from_wkb(bytes(r.geog_union))
          for r in union_agg(df, "geog", ["grp"]).collect()}
    for grp, u in un.items():
        assert len(u.points) == 20  # all distinct points preserved


def test_line_line_and_point_line_intersection():
    # crossing geodesics -> the crossing point
    r = B.s2_intersection(from_wkt("LINESTRING (0 -1, 0 1)"),
                          from_wkt("LINESTRING (-1 0, 1 0)"))
    assert len(r.points) == 1
    assert abs(r.points[0][0]) < 1e-9 and abs(r.points[0][1]) < 1e-9
    # disjoint -> empty; shared endpoint -> that point (closed model)
    assert B.s2_intersection(from_wkt("LINESTRING (0 0, 1 1)"),
                             from_wkt("LINESTRING (5 5, 6 6)")).is_empty()
    t = B.s2_intersection(from_wkt("LINESTRING (0 0, 1 1)"),
                          from_wkt("LINESTRING (1 1, 2 0)"))
    assert len(t.points) == 1
    # point exactly on a meridian geodesic; off by 0.01 deg -> empty
    assert len(B.s2_intersection(from_wkt("POINT (0 0.5)"),
                                 from_wkt("LINESTRING (0 0, 0 1)")).points) == 1
    assert B.s2_intersection(from_wkt("POINT (0.01 0.5)"),
                             from_wkt("LINESTRING (0 0, 0 1)")).is_empty()


def test_unary_union_invalid_polygon_repair():
    """build.cc:157-257: invalid polygons (loops crossing) repair by
    loop-parity fold — overlapping sibling loops dissolve into their union."""
    g = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                 "(2 2, 6 2, 6 6, 2 6, 2 2))")
    assert ops.s2_find_validation_error(g) == "polygon rings cross"
    u = B.s2_unary_union(g)
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = from_wkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    exp = ops.s2_area(a) + ops.s2_area(b) - ops.s2_area(B.s2_intersection(a, b))
    assert ops.s2_area(u) == pytest.approx(exp, rel=1e-9)
    assert ops.s2_find_validation_error(u) is None


def test_multi_depth_ring_nesting():
    """Island-inside-hole (valid in the reference's S2Polygon model):
    decode-time depth-parity orientation keeps winding PIP and signed area
    exact at every nesting depth."""
    g = from_wkt("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), "
                 "(2 2, 6 2, 6 6, 2 6, 2 2), (3 3, 5 3, 5 5, 3 5, 3 3))")
    assert ops.s2_find_validation_error(g) is None
    sq = lambda w: ops.s2_area(from_wkt(w))  # noqa: E731
    exp = sq("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))") \
        - sq("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))") \
        + sq("POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))")
    assert ops.s2_area(g) == pytest.approx(exp, rel=1e-9)
    assert ops.s2_contains(g, from_wkt("POINT (4 4)")) is True      # island
    assert ops.s2_contains(g, from_wkt("POINT (2.5 2.5)")) is False  # hole
    assert ops.s2_contains(g, from_wkt("POINT (1 1)")) is True       # shell


@pytest.mark.parametrize("wkt,grid,expected", [
    # build_test.cc ReducePrecision goldens (grid-size form)
    ("POINT (0 0)", 1.0, "POINT (0 0)"),
    ("POINT (0.001 0.001)", 1.0, "POINT (0 0)"),
    ("MULTIPOINT ((0.001 0.001), (0.002 0.002))", 1.0, "POINT (0 0)"),
    ("LINESTRING (0.01 0.02, 0.03 0.04)", 1.0, "LINESTRING EMPTY"),
    ("LINESTRING (0 0, 10 10)", -1.0, "LINESTRING (0 0, 10 10)"),
    ("LINESTRING (0.001 0, 4.999 5.001, 10 10.001)", 1.0,
     "LINESTRING (0 0, 5 5, 10 10)"),
])
def test_reduce_precision_grid_goldens(wkt, grid, expected):
    got = B.s2_reduce_precision_grid(from_wkt(wkt), grid)
    assert to_wkt(got, 6) == expected


def test_reduce_precision_keeps_zm():
    g = B.s2_reduce_precision(from_wkt("LINESTRING Z (0.001 0 7.123, 10 10.001 8.456)"), 0)
    assert to_wkt(g, 6) == "LINESTRING Z (0 0 7.123, 10 10 8.456)"


@pytest.mark.parametrize("wkt,tol,expected", [
    # build_test.cc Simplify goldens
    ("POINT (0 0)", 1000000.0, "POINT (0 0)"),
    ("MULTIPOINT ((0 0), (10 10))", 0.0, "MULTIPOINT ((0 0), (10 10))"),
    ("MULTIPOINT ((0 0), (0.001 0.001))", 1000000.0, "POINT (0 0)"),
    ("MULTIPOINT ((0 0), (0.001 0.001))", -1000000.0, "POINT (0 0)"),
    ("LINESTRING (0 0, 10 0)", 0.0, "LINESTRING (0 0, 10 0)"),
    ("LINESTRING (0 0, 5 1, 10 0)", 0.0, "LINESTRING (0 0, 5 1, 10 0)"),
    ("LINESTRING (0 0, 5 1, 10 0)", 200000.0, "LINESTRING (0 0, 10 0)"),
    ("LINESTRING (0 0, 5 1, 10 0)", 50000.0, "LINESTRING (0 0, 5 1, 10 0)"),
    ("LINESTRING (0 0, 0.0001 0.0001)", 1000000.0, "LINESTRING EMPTY"),
    ("LINESTRING Z (0 0 100, 10 0 200)", 0.0,
     "LINESTRING Z (0 0 100, 10 0 200)"),
    ("LINESTRING M (0 0 100, 10 0 200)", 0.0,
     "LINESTRING M (0 0 100, 10 0 200)"),
    ("LINESTRING ZM (0 0 100 1000, 10 0 200 2000)", 0.0,
     "LINESTRING ZM (0 0 100 1000, 10 0 200 2000)"),
])
def test_simplify_goldens(wkt, tol, expected):
    assert to_wkt(B.s2_simplify(from_wkt(wkt), tol), 6) == expected


def test_build_layer_coercions():
    """build.cc:321-364 + the layer-action INCLUDE semantics
    (build_test.cc:48-147): extract one dimension; strict errors on mixed."""
    gc = from_wkt("GEOMETRYCOLLECTION (POINT (-64 45), "
                  "LINESTRING (-64 45, 0 1), POLYGON ((0 0, 1 0, 0 1, 0 0)))")
    assert to_wkt(B.s2_build_point(gc, strict=False), 6) == "POINT (-64 45)"
    assert to_wkt(B.s2_build_polyline(gc, strict=False), 6) == \
        "LINESTRING (-64 45, 0 1)"
    assert to_wkt(B.s2_build_polygon(gc, strict=False), 6) == \
        "POLYGON ((0 0, 1 0, 0 1, 0 0))"
    for fn in (B.s2_build_point, B.s2_build_polyline, B.s2_build_polygon):
        with pytest.raises(ValueError):
            fn(gc)
    # rebuild merges duplicate points (default DuplicateEdges::MERGE)
    assert to_wkt(B.s2_rebuild(from_wkt("MULTIPOINT ((-64 45), (-64 45))")),
                  6) == "POINT (-64 45)"
    # ring orientation fixed by rebuild
    r = B.s2_rebuild(from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"))
    from s2geography_spark.core import sphere
    assert sphere.ring_signed_area(sphere.lnglat_to_xyz(r.polys[0][0])) > 0


@pytest.mark.parametrize("wkt", [
    "POINT (-64 45)",
    "MULTIPOINT ((0 0), (10 10), (-64 45))",
    "LINESTRING (0 0, 10 10, 20 0)",
    "MULTILINESTRING ((0 0, 10 10), (20 20, 30 30))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2))",
    "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
    "((20 20, 25 20, 25 25, 20 25, 20 20)))",
])
def test_unary_union_roundtrip(wkt):
    """Build.UnaryUnionRoundtrip: valid input passes through unary union
    preserving dimension, length, and area."""
    g = from_wkt(wkt)
    u = B.s2_unary_union(g)
    assert u.dimension() == g.dimension()
    assert ops.s2_length(u) == pytest.approx(ops.s2_length(g), rel=1e-12)
    assert ops.s2_area(u) == pytest.approx(ops.s2_area(g), rel=1e-12)
