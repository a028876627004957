"""Z/M coordinate retention goldens, ported from the reference's
distance_test.cc (Z point x polygon rows, ZM empty rows :378-385, :428-454,
:570-612) and linear-referencing_test.cc ZM interpolation tables, plus
WKT/WKB round-trips (wkb_test.cc behavior)."""

import numpy as np
import pytest

from s2geography_spark.core import ops
from s2geography_spark.core.geog import from_wkb, from_wkt, to_wkb, to_wkt


@pytest.mark.parametrize("wkt", [
    "POINT ZM (0 0 1 2)",
    "POINT Z (0 0 1)",
    "POINT M (0 0 1)",
    "LINESTRING Z (0 0 10, 0 2 12)",
    "LINESTRING ZM (0 0 10 20, 0 1 11 21, 0 2 12 22)",
    "POLYGON Z ((0 0 12, 2 0 12, 0 2 12, 0 0 12))",
    "POINT ZM EMPTY",
    "LINESTRING ZM EMPTY",
    "POINT Z EMPTY",
    "MULTIPOINT ((0 0), (1 1))",
    "POINT (5 5)",
])
def test_wkt_wkb_zm_roundtrip(wkt):
    g = from_wkt(wkt)
    assert to_wkt(g, 6) == wkt
    assert to_wkt(from_wkb(to_wkb(g)), 6) == wkt


def test_zm_ignored_by_metrics():
    # distances are XY-spherical regardless of Z/M (distance_test goldens)
    a = from_wkt("POINT ZM (0 0 1 2)")
    b = from_wkt("POINT ZM (0 1 2 3)")
    assert ops.s2_distance(a, b) == pytest.approx(111195.10117748393)
    az = from_wkt("POINT Z (0.25 0.25 10)")
    poly = from_wkt("POLYGON Z ((0 0 12, 2 0 12, 0 2 12, 0 0 12))")
    assert ops.s2_distance(az, poly) == 0.0


# point_distance_point_zm golden row (distance_test.cc:428-441)
def test_point_point_zm_lines_and_closest():
    a = from_wkt("POINT ZM (0 0 1 2)")
    b = from_wkt("POINT ZM (0 1 2 3)")
    assert to_wkt(ops.s2_shortest_line(a, b), 6) == \
        "LINESTRING ZM (0 0 1 2, 0 1 2 3)"
    assert to_wkt(ops.s2_longest_line(a, b), 6) == \
        "LINESTRING ZM (0 0 1 2, 0 1 2 3)"
    assert to_wkt(ops.s2_closest_point(a, b), 6) == "POINT ZM (0 0 1 2)"


def test_point_point_z():
    a = from_wkt("POINT Z (0 0 1)")
    b = from_wkt("POINT Z (0 1 2)")
    assert to_wkt(ops.s2_shortest_line(a, b), 6) == \
        "LINESTRING Z (0 0 1, 0 1 2)"
    assert to_wkt(ops.s2_closest_point(a, b), 6) == "POINT Z (0 0 1)"


# Z point x polygon golden rows (distance_test.cc:570-612)
ZPOLY = "POLYGON Z ((0 0 12, 2 0 12, 0 2 12, 0 0 12))"


def test_z_point_polygon_inside():
    a = from_wkt("POINT Z (0.25 0.25 10)")
    p = from_wkt(ZPOLY)
    assert to_wkt(ops.s2_shortest_line(a, p), 6) == \
        "LINESTRING Z (0.25 0.25 10, 0.25 0.25 10)"
    assert to_wkt(ops.s2_closest_point(a, p), 6) == "POINT Z (0.25 0.25 10)"
    ll = ops.s2_longest_line(a, p)
    assert to_wkt(ll, 6) == "LINESTRING Z (0.25 0.25 10, 2 0 12)"


def test_z_point_polygon_boundary():
    a = from_wkt("POINT Z (0 0 10)")
    p = from_wkt(ZPOLY)
    assert to_wkt(ops.s2_shortest_line(a, p), 6) == \
        "LINESTRING Z (0 0 10, 0 0 12)"
    # farthest vertex from (0 0) is an EXACT tie between (2 0) and (0 2);
    # the reference golden picks (2 0) by its internal traversal order —
    # both answers are correct, and the Z (12) must be carried either way
    assert to_wkt(ops.s2_longest_line(a, p), 6) in (
        "LINESTRING Z (0 0 10, 2 0 12)", "LINESTRING Z (0 0 10, 0 2 12)")
    assert to_wkt(ops.s2_closest_point(a, p), 6) == "POINT Z (0 0 10)"


def test_z_point_polygon_outside():
    a = from_wkt("POINT Z (-1 0 10)")
    p = from_wkt(ZPOLY)
    assert ops.s2_distance(a, p) == pytest.approx(111195.10117748393)
    assert to_wkt(ops.s2_shortest_line(a, p), 6) == \
        "LINESTRING Z (-1 0 10, 0 0 12)"
    assert to_wkt(ops.s2_longest_line(a, p), 6) == \
        "LINESTRING Z (-1 0 10, 2 0 12)"
    assert to_wkt(ops.s2_closest_point(a, p), 6) == "POINT Z (-1 0 10)"


# ZM empty rows (distance_test.cc:378-385)
def test_zm_empty_propagation():
    a = from_wkt("POINT ZM (0 0 0 0)")
    e = from_wkt("POINT ZM EMPTY")
    assert ops.s2_distance(a, e) is None
    assert to_wkt(ops.s2_shortest_line(a, e)) == "LINESTRING ZM EMPTY"
    assert to_wkt(ops.s2_longest_line(e, a)) == "LINESTRING ZM EMPTY"
    assert to_wkt(ops.s2_closest_point(a, e)) == "POINT ZM EMPTY"


# linear-referencing ZM interpolation table (linear-referencing_test.cc)
@pytest.mark.parametrize("wkt,frac,expected", [
    ("LINESTRING ZM (1 1 10 20, 1 1 10 20)", 0.5, "POINT ZM (1 1 10 20)"),
    ("LINESTRING Z (0 0 10, 0 2 12)", 0.0, "POINT Z (0 0 10)"),
    ("LINESTRING Z (0 0 10, 0 2 12)", 1.0, "POINT Z (0 2 12)"),
    ("LINESTRING Z (0 0 10, 0 2 12)", 0.5, "POINT Z (0 1 11)"),
    ("LINESTRING M (0 0 10, 0 2 12)", 0.5, "POINT M (0 1 11)"),
    ("LINESTRING ZM (0 0 10 20, 0 2 12 22)", 0.0, "POINT ZM (0 0 10 20)"),
    ("LINESTRING ZM (0 0 10 20, 0 2 12 22)", 1.0, "POINT ZM (0 2 12 22)"),
    ("LINESTRING ZM (0 0 10 20, 0 2 12 22)", 0.5, "POINT ZM (0 1 11 21)"),
    ("LINESTRING Z (0 0 10, 0 1 11, 0 2 12)", 0.25, "POINT Z (0 0.5 10.5)"),
    ("LINESTRING Z (0 0 10, 0 1 11, 0 2 12)", 0.75, "POINT Z (0 1.5 11.5)"),
    ("LINESTRING M (0 0 10, 0 1 11, 0 2 12)", 0.75, "POINT M (0 1.5 11.5)"),
    ("LINESTRING ZM (0 0 10 20, 0 1 11 21, 0 2 12 22)", 0.25,
     "POINT ZM (0 0.5 10.5 20.5)"),
    ("LINESTRING ZM (0 0 10 20, 0 1 11 21, 0 2 12 22)", 0.75,
     "POINT ZM (0 1.5 11.5 21.5)"),
])
def test_line_interpolate_zm(wkt, frac, expected):
    got = ops.s2_line_interpolate_point(from_wkt(wkt), frac)
    # meridian interpolation is exact in lat; compare at 1e-9 precision
    exp = from_wkt(expected)
    assert got.zm == exp.zm
    assert np.allclose(got.points, exp.points, atol=1e-9), to_wkt(got, 8)


def test_mixed_collection_zm_nan_padding():
    g = from_wkt("GEOMETRYCOLLECTION (POINT Z (1 1 5), LINESTRING (0 0, 1 0))")
    assert g.zm == (True, False)
    assert g.points.shape == (1, 3) and g.points[0, 2] == 5.0
    assert np.isnan(g.lines[0][:, 2]).all()
    assert ops.s2_find_validation_error(g) is None  # NaN Z is legal


def test_zm_sql_roundtrip(spark):
    from s2geography_spark.functions.geo import register_sql_functions
    register_sql_functions(spark)
    r = spark.sql(
        "SELECT st_astext(st_lineinterpolatepoint(st_geogfromtext("
        "'LINESTRING ZM (0 0 10 20, 0 2 12 22)'), 0.5)) AS p,"
        " st_astext(st_closestpoint(st_geogfromtext('POINT Z (0 0 10)'),"
        " st_geogfromtext('POINT Z (0 1 2)'))) AS c"
    ).collect()[0]
    assert r.p == "POINT ZM (0 1 11 21)"
    assert r.c == "POINT Z (0 0 10)"


# ---------------------------------------------------------------------------
# planar-input import options (geoarrow.h:40-76)
# ---------------------------------------------------------------------------

def test_from_wkb_oriented_preserves_winding():
    import struct
    from s2geography_spark.core import sphere
    ring = np.array([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]], dtype="<f8")
    wkb_cw = struct.pack("<bII", 1, 3, 1) + struct.pack("<I", 5) + ring.tobytes()
    g_def = from_wkb(wkb_cw)
    g_or = from_wkb(wkb_cw, oriented=True)
    a_def = sphere.ring_signed_area(sphere.lnglat_to_xyz(g_def.polys[0][0]))
    a_or = sphere.ring_signed_area(sphere.lnglat_to_xyz(g_or.polys[0][0]))
    assert a_def > 0 and a_or < 0  # default normalizes CCW; oriented keeps CW


def test_from_wkb_check_raises_on_invalid():
    import struct
    ring = np.array([[0, 0], [0, 1], [1, 1]], dtype="<f8")  # unclosed, short
    bad = struct.pack("<bII", 1, 3, 1) + struct.pack("<I", 3) + ring.tobytes()
    with pytest.raises(ValueError, match="check=True"):
        from_wkb(bad, check=True)
    assert from_wkb(bad) is not None  # default: tolerant


def test_planar_tessellation_follows_parallel():
    from s2geography_spark.core.geog import tessellate_planar
    g = from_wkt("LINESTRING (0 60, 30 60)")
    t = tessellate_planar(g, tolerance_m=100.0)
    lats = t.lines[0][:, 1]
    assert len(t.lines[0]) > 10          # densified
    assert float(np.abs(lats - 60).max()) < 1e-9  # stays on the parallel
    # geodesic deviation of each sub-edge from the planar line is < tol
    from s2geography_spark.core import sphere
    v = sphere.lnglat_to_xyz(t.lines[0])
    mids = sphere.arc_interpolate(v[:-1], v[1:], 0.5)
    planar_mids = sphere.lnglat_to_xyz((t.lines[0][:-1, :2] + t.lines[0][1:, :2]) / 2)
    dev = sphere.angle(mids, planar_mids) * ops.EARTH_RADIUS_METERS
    assert float(dev.max()) <= 100.0 * 1.01


def test_planar_import_sql(spark):
    from s2geography_spark.functions.geo import register_sql_functions
    register_sql_functions(spark)
    r = spark.sql(
        "SELECT st_npoints(st_geogfromwkb(st_geogfromtext("
        "'LINESTRING (0 60, 30 60)'), false, true)) AS n").collect()[0]
    assert r.n > 10


# -- WKT writer precision goldens (wkt-writer_test.cc:8-40) ------------------

def test_wkt_writer_precision_semantics():
    g = from_wkt("POINT (0 3.333333333333334)")
    # default 16 decimals: the engine stores lnglat exactly (no xyz
    # roundtrip), so the input value itself round-trips
    assert to_wkt(g) == "POINT (0 3.333333333333334)"
    assert to_wkt(g, 6) == "POINT (0 3.333333)"
    assert to_wkt(from_wkt("POINT (10 3.5)"), 2) == "POINT (10 3.5)"


@pytest.mark.parametrize("wkt", [
    "POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY", "MULTIPOINT EMPTY",
    "MULTILINESTRING EMPTY", "MULTIPOLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY",
])
def test_wkt_empty_roundtrip(wkt):
    assert to_wkt(from_wkt(wkt), 2) == wkt


def test_mixed_zm_union_concat_pads():
    """Disjoint union of mixed-dimension inputs pads missing Z/M with NaN
    (the reference's output dimension negotiation) instead of crashing."""
    from s2geography_spark.core import build as B
    u = B.s2_union(from_wkt("POINT Z (0 0 5)"), from_wkt("POINT (90 0)"))
    assert u.zm == (True, False) and len(u.points) == 2
    assert to_wkt(u, 6) == "MULTIPOINT Z ((0 0 5), (90 0 nan))"
    gc = B.s2_union(from_wkt("POINT Z (0 0 5)"),
                    from_wkt("LINESTRING (50 0, 51 0)"))
    assert gc.zm == (True, False)
    # computed overlays emit XY (build.cc:1283-1286)
    d = B.s2_difference(from_wkt("MULTIPOINT Z ((0 0 5), (3 3 6))"),
                        from_wkt("POINT (0 0)"))
    assert to_wkt(d, 6) == "POINT (3 3)"


def test_equals_ignores_zm():
    # the reference's equality operates on S2 shapes (XY); Z/M don't count
    assert ops.s2_equals(from_wkt("POINT Z (0 0 1)"), from_wkt("POINT (0 0)")) is True
    assert ops.s2_equals(from_wkt("LINESTRING ZM (0 0 1 2, 1 0 3 4)"),
                         from_wkt("LINESTRING (0 0, 1 0)")) is True
    assert ops.s2_equals(from_wkt("POINT Z (0 0 1)"),
                         from_wkt("POINT (0 1)")) is False


# centroid ZM goldens (accessors-geog_test.cc:373-421)
@pytest.mark.parametrize("wkt,expected", [
    ("POINT Z (0 1 10)", "POINT Z (0 1 10)"),
    ("MULTIPOINT Z ((0 0 10), (0 1 11))", "POINT Z (0 0.5 10.5)"),
    ("POINT M (0 1 10)", "POINT M (0 1 10)"),
    ("MULTIPOINT M ((0 0 10), (0 1 11))", "POINT M (0 0.5 10.5)"),
    ("POINT ZM (0 1 10 20)", "POINT ZM (0 1 10 20)"),
    ("MULTIPOINT ZM ((0 0 10 20), (0 1 11 21))", "POINT ZM (0 0.5 10.5 20.5)"),
    ("LINESTRING Z (0 0 10, 0 1 11)", "POINT Z (0 0.5 10.5)"),
    ("LINESTRING Z (0 0 10, 0 1 11, 0 5 15)", "POINT Z (0 2.5 12.5)"),
    ("LINESTRING M (0 0 10, 0 1 11, 0 5 15)", "POINT M (0 2.5 12.5)"),
    ("LINESTRING ZM (0 0 10 20, 0 1 11 21)", "POINT ZM (0 0.5 10.5 20.5)"),
    ("LINESTRING ZM (0 0 10 20, 0 1 11 21, 0 5 15 25)",
     "POINT ZM (0 2.5 12.5 22.5)"),
])
def test_centroid_zm_goldens(wkt, expected):
    got = ops.s2_centroid(from_wkt(wkt))
    exp = from_wkt(expected)
    assert got.zm == exp.zm
    assert np.allclose(got.points, exp.points, atol=1e-9), to_wkt(got, 8)


def test_oriented_cw_shell_area_wraps():
    """oriented=True keeps a CW shell as 'everything else': its area is
    the sphere minus the loop (S2Loop inverted-loop convention)."""
    import struct
    from s2geography_spark.core import sphere as sp
    ring = np.array([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]], dtype="<f8")
    wkb_cw = struct.pack("<bII", 1, 3, 1) + struct.pack("<I", 5) + ring.tobytes()
    small = ops.s2_area(from_wkb(wkb_cw))          # default: normalized CCW
    big = ops.s2_area(from_wkb(wkb_cw, oriented=True))
    sphere_area = 4.0 * np.pi * ops.EARTH_RADIUS_METERS ** 2
    assert big == pytest.approx(sphere_area - small, rel=1e-12)
