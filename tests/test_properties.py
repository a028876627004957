"""Hypothesis property tests for the geometry core: invariants that must
hold for ANY input, complementing the golden tables."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geography_spark.core import cellid as C
from s2geography_spark.core import ops, sphere
from s2geography_spark.core.geog import Geog, from_wkb, to_wkb

lngs = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
levels = st.integers(min_value=0, max_value=30)


@settings(max_examples=200, deadline=None)
@given(lngs, lats)
def test_cellid_roundtrip_contains_point(lng, lat):
    leaf = C.from_lnglat(np.array([lng]), np.array([lat]))
    assert C.is_valid(leaf)[0] and C.level(leaf)[0] == 30
    # every ancestor contains the leaf; tokens round-trip
    for lev in (0, 5, 12, 29):
        p = C.parent(leaf, lev)
        assert C.level(p)[0] == lev
        assert C.contains(p, leaf)[0]
    assert C.from_token(C.to_token(leaf))[0] == leaf[0]


@settings(max_examples=100, deadline=None)
@given(lngs, lats, lngs, lats)
def test_distance_symmetry_and_triangle(lng1, lat1, lng2, lat2):
    a = sphere.lnglat_to_xyz(np.array([lng1, lat1]))
    b = sphere.lnglat_to_xyz(np.array([lng2, lat2]))
    d_ab = float(sphere.angle(a, b))
    d_ba = float(sphere.angle(b, a))
    assert d_ab == d_ba
    assert 0.0 <= d_ab <= np.pi + 1e-12


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lngs, lats), min_size=1, max_size=8))
def test_wkb_roundtrip_multipoint(coords):
    g = Geog(points=np.array(coords, dtype=np.float64))
    g2 = from_wkb(to_wkb(g))
    np.testing.assert_array_equal(g.points, g2.points)
    assert g2.num_points() == len(coords)


@settings(max_examples=60, deadline=None)
@given(st.floats(min_value=-170, max_value=160, allow_nan=False),
       st.floats(min_value=-80, max_value=70, allow_nan=False),
       st.floats(min_value=0.5, max_value=9.0, allow_nan=False),
       st.floats(min_value=0.5, max_value=9.0, allow_nan=False),
       lngs, lats)
def test_predicate_consistency(lng0, lat0, w, h, plng, plat):
    ring = np.array([[lng0, lat0], [lng0 + w, lat0], [lng0 + w, lat0 + h],
                     [lng0, lat0 + h], [lng0, lat0]])
    poly = Geog(polys=[[ring]])
    pt = Geog(points=np.array([[plng, plat]]))
    inter = ops.s2_intersects(poly, pt)
    cont = ops.s2_contains(poly, pt)
    disj = ops.s2_disjoint(poly, pt)
    # contains => intersects; disjoint == !intersects
    assert (not cont) or inter
    assert disj == (not inter)
    # distance consistent with intersects at the engine's touch tolerance
    # (EPS_RAD ~ 6 um); points within a gray zone around it are skipped
    d = ops.s2_distance(poly, pt)
    eps_m = ops.EPS_RAD * ops.EARTH_RADIUS_METERS
    if d > 2 * eps_m:
        assert not inter
    elif d <= 0.5 * eps_m:
        assert inter


@settings(max_examples=60, deadline=None)
@given(st.floats(min_value=-170, max_value=160, allow_nan=False),
       st.floats(min_value=-80, max_value=70, allow_nan=False),
       st.floats(min_value=1.0, max_value=9.0, allow_nan=False),
       st.floats(min_value=1.0, max_value=9.0, allow_nan=False))
def test_area_positive_and_bbox_covers(lng0, lat0, w, h):
    ring = np.array([[lng0, lat0], [lng0 + w, lat0], [lng0 + w, lat0 + h],
                     [lng0, lat0 + h], [lng0, lat0]])
    poly = Geog(polys=[[ring]])
    assert ops.s2_area(poly) > 0
    b = ops.s2_bounds(poly)
    assert b[1] <= lat0 + 1e-9 and b[3] >= lat0 + h - 1e-9
    # every vertex within the bbox longitudes (non-wrapped rects here)
    assert b[0] <= lng0 + 1e-9 and b[2] >= lng0 + w - 1e-9


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(lngs, lats), min_size=3, max_size=10))
def test_convex_hull_contains_inputs(coords):
    g = Geog(points=np.array(coords, dtype=np.float64))
    try:
        hull = __import__("s2geography_spark.core.build",
                          fromlist=["s2_convex_hull"]).s2_convex_hull(g)
    except ValueError:
        return  # inputs exceed a hemisphere — documented limitation
    if hull.dimension() < 2:
        return
    ra, rb = hull.ring_edges_xyz()
    pts = g.points_xyz()
    inside = sphere.contains_points(pts, ra, rb, model="closed")
    onb = sphere.point_on_boundary(pts, ra, rb, eps=1e-9)
    assert (inside | onb).all()
