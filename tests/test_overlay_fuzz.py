"""Property fuzz for the general boundary-algebra overlay: random
integer-grid rectangles and triangles (integer coordinates force frequent
shared edges, partial edge overlaps, vertex-on-edge and corner contacts —
exactly the degenerate positions the round-1 tracer could not handle).

Identities checked on every pair:
  area(A ∩ B) + area(A − B) = area(A)
  area(A ∪ B) = area(A) + area(B) − area(A ∩ B)
plus containment spot checks of the outputs.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from s2geography_spark.core import build as B
from s2geography_spark.core import ops
from s2geography_spark.core.geog import Geog, from_wkt, to_wkt

# negative lngs and a high-latitude band join the mix: geodesic edge bulge
# is strongest near the poles, and sign handling differs west of Greenwich
COORD = st.integers(min_value=-4, max_value=6)
LAT0 = st.sampled_from([-62, -3, 0, 2, 58])


def rect(x0, y0, w, h) -> Geog:
    x1, y1 = x0 + w, y0 + h
    return from_wkt(f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                    f"{x0} {y1}, {x0} {y0}))")


def tri(x0, y0, w, h) -> Geog:
    return from_wkt(f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0} {y0 + h}, "
                    f"{x0} {y0}))")


def donut(x0, y0, w, h) -> Geog:
    """Rectangle with a centered rectangular hole (integer-grid hole corners
    when w/h are even — shared hole edges happen too)."""
    x1, y1 = x0 + w, y0 + h
    hx0, hy0 = x0 + w / 2 - w / 4, y0 + h / 2 - h / 4
    hx1, hy1 = x0 + w / 2 + w / 4, y0 + h / 2 + h / 4
    return from_wkt(
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}), "
        f"({hx0} {hy0}, {hx0} {hy1}, {hx1} {hy1}, {hx1} {hy0}, {hx0} {hy0}))")


shape_strategy = st.tuples(
    st.sampled_from(["rect", "tri", "donut"]), COORD, COORD,
    st.integers(min_value=1, max_value=4), st.integers(min_value=1, max_value=4),
    LAT0)


def mk(spec) -> Geog:
    kind, x0, y0, w, h, lat0 = spec
    y0 = y0 + lat0
    if kind == "donut":
        return donut(x0, y0, max(w, 2), max(h, 2))
    return rect(x0, y0, w, h) if kind == "rect" else tri(x0, y0, w, h)


def area(g) -> float:
    return 0.0 if g is None or g.is_empty() else ops.s2_area(g)


@settings(max_examples=1000, deadline=None)
@given(shape_strategy, shape_strategy)
def test_overlay_area_identities(sa, sb):
    a, b = mk(sa), mk(sb)
    A, Bb = area(a), area(b)
    inter = B.s2_intersection(a, b)
    diff = B.s2_difference(a, b)
    uni = B.s2_union(a, b)
    I, D, U = area(inter), area(diff), area(uni)
    scale = max(A, Bb, 1e-12)
    assert abs((I + D) - A) / scale < 1e-7, \
        (to_wkt(a, 5), to_wkt(b, 5), I, D, A)
    assert abs(U - (A + Bb - I)) / scale < 1e-7, \
        (to_wkt(a, 5), to_wkt(b, 5), U, A, Bb, I)


@settings(max_examples=150, deadline=None)
@given(shape_strategy, shape_strategy)
def test_overlay_membership(sa, sb):
    a, b = mk(sa), mk(sb)
    inter = B.s2_intersection(a, b)
    uni = B.s2_union(a, b)
    # interior probe grid: offset 0.123 keeps probes off every boundary the
    # shapes can produce (integer edges, and donut hole corners at .25/.5/
    # .75 offsets); 0.5 spacing still samples inside hole rings
    xs = np.arange(-4.377, 11.0, 0.5)
    ys = np.concatenate([xs + b for b in (-62.0, -3.0, 0.0, 2.0, 58.0)])
    pts = np.array([(x, y) for x in xs for y in np.unique(ys)])
    from s2geography_spark.core import sphere
    xyz = sphere.lnglat_to_xyz(pts)

    def inside(g):
        if g is None or g.is_empty():
            return np.zeros(len(pts), dtype=bool)
        ra, rb = g.ring_edges_xyz()
        if len(ra) == 0:
            return np.zeros(len(pts), dtype=bool)
        return sphere.contains_points(xyz, ra, rb, model="semi_open")

    in_a, in_b = inside(a), inside(b)
    assert (inside(inter) == (in_a & in_b)).all(), (to_wkt(a, 5), to_wkt(b, 5))
    assert (inside(uni) == (in_a | in_b)).all(), (to_wkt(a, 5), to_wkt(b, 5))
    assert (inside(B.s2_difference(a, b)) == (in_a & ~in_b)).all(), \
        (to_wkt(a, 5), to_wkt(b, 5))


@settings(max_examples=100, deadline=None)
@given(shape_strategy, shape_strategy)
def test_symdifference_identity(sa, sb):
    a, b = mk(sa), mk(sb)
    sd = B.s2_sym_difference(a, b)
    expect = area(a) + area(b) - 2.0 * area(B.s2_intersection(a, b))
    scale = max(area(a), area(b), 1e-12)
    assert abs(area(sd) - expect) / scale < 1e-7, (to_wkt(a, 5), to_wkt(b, 5))
