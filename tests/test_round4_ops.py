"""Round-4 kernel tests: OPEN-model touches semantics (reference
predicates.cc:61-73 — touches = intersects(CLOSED) && !intersects(OPEN)),
covering the boundary-collinear configurations the previous implementation
got wrong (identical polygons, collinear line overlap, T-junctions)."""

import numpy as np
import pytest

from s2geography_spark.core import ops
from s2geography_spark.core.geog import from_wkt as L
from s2geography_spark.sources.regions import densified_rect, region_corners


RECT = "POLYGON ((9 9, 11 9, 11 11, 9 11, 9 9))"


@pytest.mark.parametrize("name,wa,wb,want", [
    ("identical lines", "LINESTRING (0 0, 10 0)", "LINESTRING (0 0, 10 0)", False),
    ("collinear overlap", "LINESTRING (0 0, 10 0)", "LINESTRING (9 0, 20 0)", False),
    ("end-to-end", "LINESTRING (0 0, 10 0)", "LINESTRING (10 0, 20 0)", True),
    ("T at terminal", "LINESTRING (0 0, 5 0)", "LINESTRING (5 -5, 5 5)", True),
    ("X crossing", "LINESTRING (0 0, 10 0)", "LINESTRING (5 -5, 5 5)", False),
    ("cross at internal vertex",
     "LINESTRING (0 0, 5 0, 10 0)", "LINESTRING (5 -5, 5 5)", False),
    ("point on line interior", "POINT (5 0)", "LINESTRING (0 0, 10 0)", False),
    ("point at line terminal", "POINT (0 0)", "LINESTRING (0 0, 10 0)", True),
    ("same point", "POINT (3 3)", "POINT (3 3)", False),
    ("line along poly boundary", "LINESTRING (9 9, 11 9)", RECT, True),
    ("line through poly", "LINESTRING (8 10, 12 10)", RECT, False),
    ("line ending inside poly", "LINESTRING (9 10, 10 10)", RECT, False),
    ("point inside poly", "POINT (10 10)", RECT, False),
    ("point on poly meridian edge", "POINT (9 10)", RECT, True),
])
def test_touches_open_model(name, wa, wb, want):
    a, b = L(wa), L(wb)
    assert ops.s2_touches(a, b) is want, name
    assert ops.s2_touches(b, a) is want, name + " (swapped)"


def test_touches_polygon_configurations():
    l0, t0, l1, t1 = region_corners(np.arange(1))
    a = densified_rect(float(l0[0]), float(t0[0]), float(l1[0]), float(t1[0]))
    cases = [
        ("same", densified_rect(float(l0[0]), float(t0[0]),
                                float(l1[0]), float(t1[0])), False),
        ("inner", densified_rect(float(l0[0]) + 0.5, float(t0[0]) + 0.5,
                                 float(l1[0]) - 0.5, float(t1[0]) - 0.5), False),
        ("adjacent shared edge",
         densified_rect(float(l1[0]), float(t0[0]),
                        float(l1[0]) + 2, float(t1[0])), True),
        ("disjoint", densified_rect(float(l0[0]) + 10, float(t0[0]),
                                    float(l1[0]) + 10, float(t1[0])), False),
        ("overlap", densified_rect(float(l0[0]) + 2, float(t0[0]) + 1,
                                   float(l1[0]) + 2, float(t1[0]) + 1), False),
    ]
    for name, b, want in cases:
        assert ops.s2_touches(a, b) is want, name
        assert ops.s2_touches(b, a) is want, name + " (swapped)"
