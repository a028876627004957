"""General polygon-overlay verification.

Since no independent geometry library exists here, correctness is checked
with two strong independent oracles:
  * area additivity: area(A∩B) + area(A\\B) = area(A), and
    area(A∪B) = area(A) + area(B) - area(A∩B)
  * Monte-Carlo membership: for a dense deterministic point grid,
    PIP(result) == PIP(A) <op> PIP(B) pointwise (off-boundary points).
"""

import numpy as np
import pytest

from s2geography_spark.core import build as B
from s2geography_spark.core import ops, sphere
from s2geography_spark.core.geog import from_wkt, to_wkt

CASES = [
    ("triangles_cross",
     "POLYGON ((0 0, 2 0, 0 2, 0 0))",
     "POLYGON ((1 0, 3 0, 1 2, 1 0))"),
    ("squares_corner_overlap",
     "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),
    ("tall_thin_cross",
     "POLYGON ((0 -3, 1 -3, 1 3, 0 3, 0 -3))",
     "POLYGON ((-3 0, 3 0, 3 1, -3 1, -3 0))"),
    ("mid_latitude",
     "POLYGON ((10 40, 20 40, 20 50, 10 50, 10 40))",
     "POLYGON ((15 45, 25 45, 25 55, 15 55, 15 45))"),
    ("double_lobe",
     "POLYGON ((0 0, 6 0, 6 1, 1 1, 1 2, 6 2, 6 3, 0 3, 0 0))",
     "POLYGON ((5 -1, 7 -1, 7 4, 5 4, 5 -1))"),
]


def _grid_points(lo=-8.0, hi=8.0, n=60):
    xs = np.linspace(lo, hi, n) + 0.0137
    ys = np.linspace(lo, hi, n) + 0.0071
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1)


def _membership(g, pts_lnglat):
    ra, rb = g.ring_edges_xyz()
    if len(ra) == 0:
        return np.zeros(len(pts_lnglat), dtype=bool)
    return sphere.contains_points(sphere.lnglat_to_xyz(pts_lnglat), ra, rb,
                                  model="semi_open")


@pytest.mark.parametrize("name,wa,wb", CASES, ids=[c[0] for c in CASES])
def test_overlay_area_additivity(name, wa, wb):
    a, b = from_wkt(wa), from_wkt(wb)
    inter = B.s2_intersection(a, b)
    union = B.s2_union(a, b)
    diff_ab = B.s2_difference(a, b)
    diff_ba = B.s2_difference(b, a)
    Aa, Ab = ops.s2_area(a), ops.s2_area(b)
    Ai, Au = ops.s2_area(inter), ops.s2_area(union)
    Adab, Adba = ops.s2_area(diff_ab), ops.s2_area(diff_ba)
    # rel 1e-7 allows for the <=0.2 mm deterministic perturbation that
    # resolves exact vertex-on-edge contact (overlay.py _perturb)
    assert Ai > 0 and Au > 0
    assert Ai + Adab == pytest.approx(Aa, rel=1e-7), (name, to_wkt(inter))
    assert Ai + Adba == pytest.approx(Ab, rel=1e-7)
    assert Au == pytest.approx(Aa + Ab - Ai, rel=1e-7)


@pytest.mark.parametrize("name,wa,wb", CASES, ids=[c[0] for c in CASES])
def test_overlay_membership_oracle(name, wa, wb):
    a, b = from_wkt(wa), from_wkt(wb)
    pts = _grid_points(-8, 28, 70) if name == "mid_latitude" else _grid_points()
    in_a = _membership(a, pts)
    in_b = _membership(b, pts)
    inter = B.s2_intersection(a, b)
    union = B.s2_union(a, b)
    diff = B.s2_difference(a, b)
    np.testing.assert_array_equal(_membership(inter, pts), in_a & in_b)
    np.testing.assert_array_equal(_membership(union, pts), in_a | in_b)
    np.testing.assert_array_equal(_membership(diff, pts), in_a & ~in_b)


def test_difference_punches_hole():
    a = from_wkt("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))")
    b = from_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    d = B.s2_difference(a, b)
    assert len(d.polys) == 1 and len(d.polys[0]) == 2  # shell + hole
    assert ops.s2_area(d) == pytest.approx(ops.s2_area(a) - ops.s2_area(b), rel=1e-12)
    assert ops.s2_contains(d, from_wkt("POINT (1 1)")) is True
    assert ops.s2_contains(d, from_wkt("POINT (3 3)")) is False


def test_overlay_with_holes_in_input():
    a = from_wkt("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    b = from_wkt("POLYGON ((3 -1, 7 -1, 7 3, 3 3, 3 -1))")
    pts = _grid_points(-2, 8, 60)
    in_a = _membership(a, pts)
    in_b = _membership(b, pts)
    inter = B.s2_intersection(a, b)
    np.testing.assert_array_equal(_membership(inter, pts), in_a & in_b)
    assert ops.s2_area(inter) > 0


def test_multipolygon_overlay():
    a = from_wkt("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
    b = from_wkt("POLYGON ((1 1, 6 1, 6 6, 1 6, 1 1))")
    pts = _grid_points(-1, 8, 60)
    in_a = _membership(a, pts)
    in_b = _membership(b, pts)
    inter = B.s2_intersection(a, b)
    union = B.s2_union(a, b)
    np.testing.assert_array_equal(_membership(inter, pts), in_a & in_b)
    np.testing.assert_array_equal(_membership(union, pts), in_a | in_b)


def test_symdifference_crossing():
    a = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = from_wkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    sd = B.s2_sym_difference(a, b)
    Ai = ops.s2_area(B.s2_intersection(a, b))
    assert ops.s2_area(sd) == pytest.approx(
        ops.s2_area(a) + ops.s2_area(b) - 2 * Ai, rel=1e-9)
