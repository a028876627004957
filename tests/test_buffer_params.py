"""st_buffer parameter-string goldens ported from the reference
(BufferParamsParse / BufferParamsTest / SedonaUdfBufferQuadSegs,
/root/reference/src/s2geography/build_test.cc:1205-1515).

Flat-cap and side-buffer straight parts compare EXACTLY (after 1e-5-degree
snap, like the overlay goldens); round arcs compare by area/containment
because the reference's circle sampling phase is an S2-internal detail."""

import numpy as np
import pytest

from s2geography_spark.core import build as B
from s2geography_spark.core import ops
from s2geography_spark.core.geog import from_wkt, to_wkt

R = ops.EARTH_RADIUS_METERS


def geq(a, b) -> bool:
    return ops.s2_equals(B.s2_reduce_precision(a, 5),
                         B.s2_reduce_precision(b, 5)) is True


# -- BufferParams::Parse goldens ---------------------------------------------

def test_parse_empty_defaults():
    p = B.BufferParams.parse("")
    assert (p.end_cap, p.side, p.quad_segs) == ("round", "both", 8)


@pytest.mark.parametrize("s,cap", [
    ("endcap=round", "round"), ("endcap=flat", "flat"),
    ("endcap=butt", "flat"), ("ENDCAP=Round", "round"),
])
def test_parse_endcap(s, cap):
    assert B.BufferParams.parse(s).end_cap == cap


def test_parse_side_defaults_flat_cap():
    p = B.BufferParams.parse("side=left")
    assert p.side == "left" and p.end_cap == "flat"
    p = B.BufferParams.parse("side=right")
    assert p.side == "right" and p.end_cap == "flat"
    p = B.BufferParams.parse("side=both")
    assert p.side == "both" and p.end_cap == "round"
    # explicit endcap wins over the side default
    p = B.BufferParams.parse("side=left endcap=round")
    assert p.side == "left" and p.end_cap == "round"


@pytest.mark.parametrize("bad", [
    "endcap=invalid", "join=invalid", "side=invalid", "quad_segs=0",
    "quad_segs=-3", "mitre_limit=x", "unknown=1", "noequals",
])
def test_parse_invalid(bad):
    with pytest.raises(ValueError):
        B.BufferParams.parse(bad)


# -- behavior goldens ---------------------------------------------------------

def test_flat_endcap_single_edge_exact():
    # build_test.cc endcap_flat golden: the 4-corner quad
    g = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0,
                    params="endcap=flat")
    exp = from_wkt("POLYGON ((0 0.89932, 0 -0.89932, "
                   "1 -0.89932, 1 0.89932, 0 0.89932))")
    assert geq(g, exp), to_wkt(g, 8)


def test_side_left_round_exact():
    g = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0,
                    params="endcap=round side=left")
    exp = from_wkt(
        "POLYGON ((1.89932 0, 1.88204 0.175456, 1.830862 0.34417, "
        "1.747752 0.499657, 1.635901 0.635943, 1.499604 0.747788, "
        "1.344099 0.830892, 1.175364 0.882058, 1 0.89932, 0 0.89932, "
        "-0.175477 0.882036, -0.344206 0.830847, -0.4997 0.747724, "
        "-0.635982 0.635862, -0.747816 0.499561, -0.830907 0.344063, "
        "-0.882062 0.175343, -0.89932 0, 0 0, 1 0, 1.89932 0))")
    # snap at 1e-3 deg: phases align but the reference's arc vertices carry
    # its own tessellation error (~1e-4 deg)
    assert ops.s2_equals(B.s2_reduce_precision(g, 3),
                         B.s2_reduce_precision(exp, 3)) is True, to_wkt(g, 8)


def test_side_right_mirrors_left():
    left = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0,
                       params="endcap=round side=left")
    right = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0,
                        params="endcap=round side=right")
    assert ops.s2_area(left) == pytest.approx(ops.s2_area(right), rel=1e-9)
    # sides are disjoint except the shared baseline
    inter = B.s2_intersection(left, right)
    assert inter.dimension() <= 1


def test_side_flat_is_half_flat_quad():
    g = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0,
                    params="side=left")  # side default: flat cap
    exp = from_wkt("POLYGON ((0 0, 1 0, 1 0.89932, 0 0.89932, 0 0))")
    assert geq(g, exp), to_wkt(g, 8)
    both = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0,
                       params="endcap=flat")
    assert ops.s2_area(g) == pytest.approx(ops.s2_area(both) / 2.0, rel=1e-9)


def test_round_default_equals_capsule_and_area():
    g = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0,
                    params="endcap=round")
    g2 = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0)"), 100000.0)
    assert ops.s2_equals(g, g2) is True
    r = 100000.0
    L = ops.s2_length(from_wkt("LINESTRING (0 0, 1 0)"))
    # capsule area ~ 2rL + pi r^2 (flat area slightly less than analytic
    # because of the 32-gon circle approximation)
    assert ops.s2_area(g) == pytest.approx(L * 2 * r + np.pi * r * r, rel=1e-2)


def test_quad_segs_vertex_counts():
    # SedonaUdfBufferQuadSegs: quad_segs=4 -> 17 vertices, 2 -> 9 (closed)
    g4 = B.s2_buffer(from_wkt("POINT (0 0)"), 100000.0, params="quad_segs=4")
    g2 = B.s2_buffer(from_wkt("POINT (0 0)"), 100000.0, quad_segs=2)
    assert len(g4.polys[0][0]) == 17
    assert len(g2.polys[0][0]) == 9
    # circle area converges from below: A(n) = analytic * sinc-ish factor
    a4 = ops.s2_area(g4)
    exact = np.pi * 100000.0 ** 2
    assert a4 == pytest.approx(exact * np.sin(2 * np.pi / 16) / (2 * np.pi / 16),
                               rel=1e-3)


def test_polygon_negative_distance_erosion():
    # large negative distance fully erodes (build_test golden)
    g = B.s2_buffer(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
                    -1_000_000.0)
    assert g.is_empty() and to_wkt(g) == "POLYGON EMPTY"
    # partial erosion: 2x2-degree square shrunk by ~0.45 degrees per side
    g2 = B.s2_buffer(from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
                     -50_000.0)
    shrink = 2.0 - 2 * np.degrees(50000.0 / R)
    approx = ops.s2_area(from_wkt(
        f"POLYGON ((0 0, {shrink} 0, {shrink} {shrink}, 0 {shrink}, 0 0))"))
    assert ops.s2_area(g2) == pytest.approx(approx, rel=2e-2)
    assert ops.s2_contains(from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
                           g2) is True


def test_flat_cap_multi_edge_round_joints():
    # interior joint stays round: the corner point beyond the joint is in
    g = B.s2_buffer(from_wkt("LINESTRING (0 0, 1 0, 1 1)"), 50000.0,
                    params="endcap=flat")
    # beyond the chain ENDS (flat caps): excluded
    assert ops.s2_contains(g, from_wkt("POINT (-0.2 0)")) is False
    assert ops.s2_contains(g, from_wkt("POINT (1 1.2)")) is False
    # around the interior joint (1, 0): the round join disc covers ~45 deg
    # outside both edge quads (dist to vertex ~47 km < 50 km)
    assert ops.s2_contains(g, from_wkt("POINT (1.3 -0.3)")) is True
    assert ops.s2_contains(g, from_wkt("POINT (0.5 0.2)")) is True


def test_empty_and_degenerate_typed_polygon_empty():
    for wkt, d in [("POINT EMPTY", 100000.0), ("LINESTRING EMPTY", 100000.0),
                   ("POINT (0 0)", 0.0), ("POINT (0 0)", -100000.0),
                   ("LINESTRING (0 0, 10 0)", 0.0)]:
        g = B.s2_buffer(from_wkt(wkt), d)
        assert to_wkt(g) == "POLYGON EMPTY", (wkt, d)
