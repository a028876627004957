"""Build ops: convex hull, point-on-surface, simplify, reduce-precision,
buffer, and the overlay (intersection/union/difference/symdifference)
subset the engine supports natively.

Scope notes vs the reference (/root/reference/src/s2geography/build.cc):
  * convex hull (accessors-geog.cc:339-455): gnomonic-projection Graham scan
    — exact for inputs within a hemisphere (the common case; the reference's
    S2ConvexHullQuery handles the full sphere).
  * simplify (build.cc:1198-1229): geodesic Douglas-Peucker + snap-function
    side effects (point merge, chain collapse); negative tol = abs.
  * reduce precision (build.cc:1165-1196): IntLatLngSnapFunction analog —
    exponent and grid-size forms; snapped points merge; Z/M pass through.
  * buffer (build.cc:1610-1718): full parameter string (endcap, side,
    quad_segs), polygon erosion for negative distances, exact spherical
    circles / small-circle offsets / tangent-aligned caps.
  * overlay (build.cc:1259-1516): the GENERAL boundary-algebra engine in
    core/overlay.py — every input combination including shared/collinear
    edges, vertex contacts, holes, multi-depth nesting, mixed collections;
    CLOSED model with closed-set line/point residue; reference-exact empty
    typing.  Invalid polygons repair through loop-parity unary union.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import sphere
from .geog import Geog
from .ops import (EPS_RAD, s2_contains, s2_distance_radians,
                  s2_find_validation_error)

EARTH_RADIUS_METERS = sphere.EARTH_RADIUS_METERS


# ---------------------------------------------------------------------------
# convex hull
# ---------------------------------------------------------------------------

def s2_convex_hull(g: Optional[Geog]) -> Optional[Geog]:
    """Convex hull of all vertices (holes excluded per the reference).
    Degenerate results: 1 vertex -> POINT, collinear -> LINESTRING."""
    if g is None:
        return None
    ll = _hull_vertices_lnglat(g)
    if len(ll) == 0:
        return Geog(typ=7)  # GEOMETRYCOLLECTION EMPTY (accessors-geog_test golden)
    ll = np.unique(ll, axis=0)
    if len(ll) == 1:
        return Geog(points=ll)
    v = sphere.lnglat_to_xyz(ll)
    c = v.sum(axis=0)
    nc = np.linalg.norm(c)
    if nc == 0:
        raise ValueError("convex hull spanning the full sphere unsupported")
    c = c / nc
    if (v @ c <= 1e-12).any():
        raise ValueError("convex hull input exceeds a hemisphere")
    # gnomonic projection onto tangent plane at c
    e1 = np.cross(c, [0.0, 0.0, 1.0])
    if np.linalg.norm(e1) < 1e-12:
        e1 = np.cross(c, [1.0, 0.0, 0.0])
    e1 = e1 / np.linalg.norm(e1)
    e2 = np.cross(c, e1)
    t = v / (v @ c)[:, None]  # project along ray to the tangent plane
    px = t @ e1
    py = t @ e2
    hull_idx = _graham(px, py)
    hv = ll[hull_idx]  # original input coordinates, no xyz roundtrip
    if len(hv) == 2:
        return Geog(lines=[hv])
    ring = np.vstack([hv, hv[:1]])
    if sphere.ring_signed_area(sphere.lnglat_to_xyz(ring)) < 0:
        ring = ring[::-1].copy()
    return Geog(polys=[[ring]])


def _hull_vertices_lnglat(g: Geog) -> np.ndarray:
    out = []
    if len(g.points):
        out.append(g.points)
    for l in g.lines:
        if len(l):
            out.append(l)
    for rings in g.polys:
        if rings:  # shell only; holes can't affect the hull
            out.append(rings[0][:-1])
    return np.vstack(out) if out else np.zeros((0, 2))


def _graham(x: np.ndarray, y: np.ndarray) -> List[int]:
    """Planar convex hull (Andrew monotone chain) -> CCW vertex indices."""
    order = np.lexsort((y, x))
    pts = np.stack([x, y], axis=-1)

    def cross(o, a, b):
        return ((pts[a][0] - pts[o][0]) * (pts[b][1] - pts[o][1])
                - (pts[a][1] - pts[o][1]) * (pts[b][0] - pts[o][0]))

    lower: List[int] = []
    for i in order:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(int(i))
    upper: List[int] = []
    for i in order[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(int(i))
    hull = lower[:-1] + upper[:-1]
    if len(hull) == 2 and hull[0] == hull[1]:
        hull = hull[:1]
    return hull


# ---------------------------------------------------------------------------
# point on surface (accessors-geog.cc:457-529)
# ---------------------------------------------------------------------------

def s2_point_on_surface(g: Optional[Geog]) -> Optional[Geog]:
    """dim 2: an interior point (centroid if inside, else center of the
    largest covering cell whose center is interior — the reference uses the
    biggest interior-covering cell center); dim 0/1: vertex closest to the
    centroid."""
    if g is None:
        return None
    if g.is_empty():
        return Geog(typ=1)
    from .ops import centroid_vector, s2_covering
    if g.dimension() == 2:
        ra, rb = g.ring_edges_xyz()
        cen = centroid_vector(g)
        cen = cen / np.linalg.norm(cen)
        if sphere.contains_points(cen.reshape(1, 3), ra, rb)[0]:
            return Geog(points=sphere.xyz_to_lnglat(cen).reshape(1, 2))
        # search covering cells (finer budget) for an interior center
        from . import cellid as C
        cov = np.array(s2_covering(g, max_cells=32), dtype=np.int64).view(np.uint64)
        levels = C.level(cov)
        order = np.argsort(levels)  # biggest cells first
        for idx in order:
            x, y, z = C.to_xyz(cov[idx:idx + 1])
            p = np.stack([x, y, z], axis=-1)
            if sphere.contains_points(p, ra, rb, model="open")[0]:
                return Geog(points=sphere.xyz_to_lnglat(p[0]).reshape(1, 2))
        # fall back: midpoint of a short chord inward from a vertex
        return Geog(points=sphere.xyz_to_lnglat(ra[0]).reshape(1, 2))
    ll = _hull_vertices_lnglat(g)  # original coordinates
    v = sphere.lnglat_to_xyz(ll)
    cen = centroid_vector(g)
    cen = cen / max(np.linalg.norm(cen), 1e-300)
    d = sphere.angle(v, cen.reshape(1, 3))
    # last index within tolerance of the minimum: matches the reference's
    # observed tie behavior (multipoint (0 0),(0 1) -> POINT (0 1))
    near = np.where(d <= d.min() + 1e-12)[0]
    k = int(near[-1])
    return Geog(points=ll[k].reshape(1, 2))


# ---------------------------------------------------------------------------
# simplify / reduce precision
# ---------------------------------------------------------------------------

def _dp_simplify(chain_xyz: np.ndarray, tol_rad: float) -> np.ndarray:
    """Geodesic Douglas-Peucker, keeps endpoints. chain (m, 3) -> mask."""
    m = len(chain_xyz)
    keep = np.zeros(m, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, m - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = chain_xyz[i + 1:j]
        d = sphere.point_arc_distance(seg, chain_xyz[i], chain_xyz[j])
        k = int(np.argmax(d))
        if d[k] > tol_rad:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def s2_simplify(g: Optional[Geog], tolerance_m: float) -> Optional[Geog]:
    """Douglas-Peucker with geodesic distances; negative tolerance treated
    as abs (PostGIS compat, build.cc:1214-1216).  Snap-function side
    effects reproduced per the reference goldens: points within tolerance
    of an earlier point merge; a chain whose vertices all merge collapses
    to EMPTY.  Z/M columns ride along unmodified."""
    if g is None:
        return None
    tol = abs(tolerance_m) / EARTH_RADIUS_METERS
    pts = None
    if len(g.points):
        keep_rows = []
        kept_xyz = []
        pxyz = g.points_xyz()
        for i in range(len(g.points)):
            if kept_xyz and float(sphere.angle(
                    np.array(kept_xyz), pxyz[i][None, :]).min()) <= tol:
                continue
            keep_rows.append(i)
            kept_xyz.append(pxyz[i])
        pts = g.points[keep_rows]
    lines = []
    for l in g.lines:
        if len(l) < 2:
            continue
        v = sphere.lnglat_to_xyz(l)
        rr = l[_dp_simplify(v, tol)]
        # endpoints merging under the snap tolerance collapse the chain
        if len(rr) == 2 and tol > 0 and float(sphere.angle(
                sphere.lnglat_to_xyz(rr[0, :2]),
                sphere.lnglat_to_xyz(rr[1, :2]))) <= tol:
            continue
        lines.append(rr)
    polys = []
    for rings in g.polys:
        new_rings = []
        for k, r in enumerate(rings):
            if len(r) < 4:
                continue
            v = sphere.lnglat_to_xyz(r)
            rr = r[_dp_simplify(v, tol)]
            if len(rr) >= 4:
                new_rings.append(rr)
            elif k == 0:
                new_rings = []
                break
        if new_rings:
            polys.append(new_rings)
    return Geog(points=pts, lines=lines, polys=polys, typ=g.typ, zm=g.zm)


def s2_rebuild(g: Optional[Geog]) -> Optional[Geog]:
    """Snap/validate round-trip (build.cc:259-319 s2_rebuild with the
    identity snap function): drop duplicate adjacent vertices, drop
    degenerate parts (sub-2-point lines, sub-4-point rings), re-normalize
    ring orientation (shell CCW / holes CW)."""
    if g is None:
        return None

    def clean(arr):
        a = np.asarray(arr, dtype=np.float64)
        if len(a) == 0:
            return a
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = np.abs(a[1:, :2] - a[:-1, :2]).max(axis=1) > 0
        return a[keep]

    pts = np.unique(g.points, axis=0) if len(g.points) else None
    lines = [c for c in (clean(l) for l in g.lines) if len(c) >= 2]
    polys = []
    for rings in g.polys:
        new_rings = []
        for k, r in enumerate(rings):
            c = clean(r)
            if len(c) and (c[0, :2] != c[-1, :2]).any():
                c = np.vstack([c, c[:1]])
            if len(c) >= 4:
                new_rings.append(c)
            elif k == 0:
                new_rings = []
                break
        if new_rings:
            from .geog import _normalize_rings
            polys.append(_normalize_rings(new_rings))
    return Geog(points=pts, lines=lines, polys=polys, typ=g.typ, zm=g.zm)


def s2_reduce_precision(g: Optional[Geog], grid_exponent: int) -> Optional[Geog]:
    """Snap lon/lat to 10^-e degrees (IntLatLngSnapFunction analog); drops
    parts that collapse; snapped-together points merge (reference golden
    multipoint_merge).  Z/M columns are carried through unrounded."""
    if g is None:
        return None

    def snap(c):
        c = np.asarray(c, dtype=np.float64).copy()
        c[:, :2] = np.round(c[:, :2], grid_exponent)
        return c

    pts = None
    if len(g.points):
        pts = np.unique(snap(g.points), axis=0)
    lines = []
    for l in g.lines:
        s = snap(l)
        # drop consecutive duplicates (XY identity)
        keep = np.ones(len(s), dtype=bool)
        keep[1:] = (np.abs(s[1:, :2] - s[:-1, :2]).max(axis=1) > 0)
        s = s[keep]
        if len(s) >= 2:
            lines.append(s)
    polys = []
    for rings in g.polys:
        new_rings = []
        for k, r in enumerate(rings):
            s = snap(r)
            keep = np.ones(len(s), dtype=bool)
            keep[1:] = (np.abs(s[1:, :2] - s[:-1, :2]).max(axis=1) > 0)
            s = s[keep]
            if len(s) and (s[0, :2] != s[-1, :2]).any():
                s = np.vstack([s, s[:1]])
            if len(s) >= 4:
                new_rings.append(s)
            elif k == 0:
                new_rings = []
                break
        if new_rings:
            polys.append(new_rings)
    return Geog(points=pts, lines=lines, polys=polys, typ=g.typ, zm=g.zm)


def s2_reduce_precision_grid(g: Optional[Geog],
                             grid_size: float) -> Optional[Geog]:
    """Grid-size form of the reference SQL kernel (build.cc:1165-1196):
    exponent = round(-log10(grid)) clamped to [0, 15]; non-positive grid
    leaves the input unchanged (reference 'no snapping with negative grid
    size' golden)."""
    if g is None:
        return None
    if grid_size is None or grid_size <= 0:
        return g
    e = int(np.clip(np.round(-np.log10(grid_size)), 0, 15))
    return s2_reduce_precision(g, e)


# ---------------------------------------------------------------------------
# buffer (points exactly; others unsupported natively in round 1)
# ---------------------------------------------------------------------------

def _point_circle_ring(c_xyz: np.ndarray, r: float, n: int) -> np.ndarray:
    """Closed CCW lnglat ring of the geodesic circle around c (radius r rad)."""
    e1 = np.cross(c_xyz, [0.0, 0.0, 1.0])
    if np.linalg.norm(e1) < 1e-12:
        e1 = np.cross(c_xyz, [1.0, 0.0, 0.0])
    e1 = e1 / np.linalg.norm(e1)
    e2 = np.cross(c_xyz, e1)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring_xyz = (np.cos(r) * c_xyz[None, :]
                + np.sin(r) * (np.cos(th)[:, None] * e1[None, :]
                               + np.sin(th)[:, None] * e2[None, :]))
    ring = sphere.xyz_to_lnglat(ring_xyz)
    ring = np.vstack([ring, ring[:1]])
    if sphere.ring_signed_area(sphere.lnglat_to_xyz(ring)) < 0:
        ring = ring[::-1].copy()
    return ring


def _cap_arc(center: np.ndarray, dir_from: np.ndarray, dir_to: np.ndarray,
             r: float, quad_segs: int) -> np.ndarray:
    """Open arc of the radius-r circle around `center` from tangent
    direction dir_from to dir_to, traversed the short CCW way, sampled at a
    GLOBALLY PHASE-CANONICAL angular grid (angles measured in the center's
    fixed east/north frame, grid step pi/(2*quad_segs)).

    The canonical phase is the engine's snap-function analog for buffers:
    caps of adjacent edge-capsules around the same vertex sample the same
    circle at identical points, so their shared runs are exact shared edges
    for the overlay (no ill-conditioned near-tangent chord crossings).
    Excludes both endpoint directions (callers append exact endpoints)."""
    e1 = np.cross(center, [0.0, 0.0, 1.0])
    if np.linalg.norm(e1) < 1e-12:
        e1 = np.cross(center, [1.0, 0.0, 0.0])
    e1 = e1 / np.linalg.norm(e1)
    e2 = np.cross(center, e1)

    def ang(d):
        return float(np.arctan2(np.dot(d, e2), np.dot(d, e1)))

    a0, a1 = ang(dir_from), ang(dir_to)
    while a1 <= a0 + 1e-15:  # CCW sweep
        a1 += 2 * np.pi
    step = np.pi / (2 * quad_segs)
    k0 = int(np.floor(a0 / step)) + 1
    k1 = int(np.ceil(a1 / step)) - 1
    th = np.arange(k0, k1 + 1) * step
    th = th[(th > a0 + 1e-9) & (th < a1 - 1e-9)]
    dirs = np.cos(th)[:, None] * e1[None, :] + np.sin(th)[:, None] * e2[None, :]
    return np.cos(r) * center[None, :] + np.sin(r) * dirs


def _edge_capsule_ring(a_xyz: np.ndarray, b_xyz: np.ndarray, r: float,
                       quad_segs: int) -> np.ndarray:
    """Closed CCW ring buffering one geodesic edge by r: two exact offset
    small-circle curves (pole = the edge's great-circle normal) + round caps
    sampled on the phase-canonical grid (see _cap_arc)."""
    n = np.cross(a_xyz, b_xyz)
    nn = np.linalg.norm(n)
    if nn == 0:
        return _point_circle_ring(a_xyz, r, 4 * quad_segs)
    n = n / nn
    theta = float(sphere.angle(a_xyz, b_xyz))
    m = max(int(np.ceil(theta / max(r, 1e-6) * 2)), 2)
    ts = np.linspace(0.0, 1.0, m + 1)
    path = np.array([sphere.arc_interpolate(a_xyz, b_xyz, t) for t in ts])
    left = np.cos(r) * path + np.sin(r) * n[None, :]     # offset small circle
    right = np.cos(r) * path - np.sin(r) * n[None, :]
    # round caps; exact endpoints come from the offset curves themselves.
    # Desired traversal bulges through the outward tangent: at b that is
    # +n -> forward -> -n, which is the REVERSE of the CCW sweep -n -> +n
    # (rotating n toward forward around b is clockwise: cross(n, fwd).b=-1)
    cap_b = _cap_arc(b_xyz, -n, n, r, quad_segs)[::-1]
    cap_a = _cap_arc(a_xyz, n, -n, r, quad_segs)[::-1]
    ring_xyz = np.vstack([left, cap_b, right[::-1], cap_a])
    ring = sphere.xyz_to_lnglat(ring_xyz)
    ring = np.vstack([ring, ring[:1]])
    if sphere.ring_signed_area(sphere.lnglat_to_xyz(ring)) < 0:
        ring = ring[::-1].copy()
    return ring


class BufferParams:
    """PostGIS-style buffer parameter string (BufferParams::Parse,
    build.cc:1570-1608): ``endcap=round|flat|butt side=both|left|right
    quad_segs=N`` (``quadrant_segments`` alias; ``join=round`` accepted,
    ``mitre_limit`` parsed-and-ignored with round joins).  ``side=left`` or
    ``right`` defaults the endcap to flat unless given explicitly."""

    __slots__ = ("end_cap", "side", "quad_segs")

    def __init__(self, end_cap="round", side="both", quad_segs=8):
        self.end_cap = end_cap
        self.side = side
        self.quad_segs = quad_segs

    @staticmethod
    def parse(params: str) -> "BufferParams":
        p = BufferParams()
        endcap_explicit = False
        for tok in (params or "").split():
            if "=" not in tok:
                raise ValueError(f"Invalid buffer parameter: {tok!r}")
            key, _, val = tok.partition("=")
            key = key.lower()
            val = val.lower()
            if key == "endcap":
                if val == "round":
                    p.end_cap = "round"
                elif val in ("flat", "butt"):
                    p.end_cap = "flat"
                else:
                    raise ValueError(f"Invalid endcap value: {val!r}")
                endcap_explicit = True
            elif key == "side":
                if val not in ("both", "left", "right"):
                    raise ValueError(f"Invalid side value: {val!r}")
                p.side = val
            elif key in ("quad_segs", "quadrant_segments"):
                try:
                    p.quad_segs = int(val)
                except ValueError:
                    raise ValueError(f"Invalid quad_segs value: {val!r}")
                if p.quad_segs <= 0:
                    raise ValueError("quadrant_segments must be >0 in ST_Buffer()")
            elif key == "join":
                if val != "round":
                    raise ValueError(
                        f"Invalid join value: {val!r} (only round joins)")
            elif key == "mitre_limit" or key == "miter_limit":
                try:
                    if float(val) <= 0:
                        raise ValueError
                except ValueError:
                    raise ValueError(f"Invalid mitre_limit value: {val!r}")
            else:
                raise ValueError(
                    f"Invalid buffer parameter: {key!r} (accept: 'endcap', "
                    "'quad_segs', 'quadrant_segments' and 'side')")
        if p.side in ("left", "right") and not endcap_explicit:
            p.end_cap = "flat"
        return p


def _tangent_arc(center_xyz, d_from, d_to, r, quad_segs, endpoints=False):
    """Arc of the radius-r circle around center from tangent direction
    d_from to d_to, sampled at exact steps of pi/(2*quad_segs) FROM d_from
    (tangent-aligned — matches the reference's end-cap vertex placement,
    build_test.cc side/endcap goldens).  Rotation takes the shorter way."""
    d_from = d_from / np.linalg.norm(d_from)
    d_to = d_to / np.linalg.norm(d_to)
    axis = np.cross(d_from, d_to)
    total = float(np.arctan2(np.linalg.norm(axis), float(np.dot(d_from, d_to))))
    if np.linalg.norm(axis) < 1e-15:
        axis = center_xyz  # degenerate (0 or pi): rotate around the center
        if float(np.dot(d_from, d_to)) < 0:
            total = np.pi
    axis = axis / np.linalg.norm(axis)
    perp = np.cross(axis, d_from)
    step = np.pi / (2 * quad_segs)
    n_steps = max(int(np.floor(total / step + 1e-9)), 0)
    ths = [k * step for k in range(1, n_steps + 1) if k * step < total - 1e-9]
    if endpoints:
        ths = [0.0] + ths + [total]
    dirs = [np.cos(t) * d_from + np.sin(t) * perp for t in ths]
    if not dirs:
        return np.zeros((0, 3))
    dirs = np.array(dirs)
    return np.cos(r) * center_xyz[None, :] + np.sin(r) * dirs


def _offset_samples(v0, v1, r, sign_n, max_seg_rad=0.25):
    """Points of the left (+1) / right (-1) offset small circle of edge
    (v0, v1), including both endpoints; interior samples only for long
    edges (the chord tracks the small circle within the snap tolerance for
    short ones — the reference emits corner-only quads for ~1 deg edges)."""
    n = np.cross(v0, v1)
    n = n / np.linalg.norm(n)
    theta = float(sphere.angle(v0, v1))
    m = max(int(np.ceil(theta / max_seg_rad)), 1)
    ts = np.linspace(0.0, 1.0, m + 1)
    path = np.array([sphere.arc_interpolate(v0, v1, t) for t in ts])
    return np.cos(r) * path + sign_n * np.sin(r) * n[None, :], n


def _edge_flat_quad(v0, v1, r) -> np.ndarray:
    """Closed CCW ring of the both-sides flat-capped edge buffer (the
    endcap=flat golden: POLYGON ((a_left, a_right, b_right, b_left)))."""
    left, _ = _offset_samples(v0, v1, r, +1.0)
    right, _ = _offset_samples(v0, v1, r, -1.0)
    ring_xyz = np.vstack([left[:1], right, left[::-1]])
    return _close_ccw(ring_xyz)


def _edge_side_piece(v0, v1, r, side: str, end_cap: str, quad_segs: int,
                     cap_start: bool, cap_end: bool) -> np.ndarray:
    """Closed CCW ring of a one-sided edge buffer: baseline + offset curve,
    with (optionally) quarter-circle round caps extending r beyond the
    endpoints (the side_left/side_right goldens), or flat ends."""
    sign = 1.0 if side == "left" else -1.0
    off, n = _offset_samples(v0, v1, r, sign)
    nd = sign * n
    fwd1 = np.cross(n, v1)
    fwd1 = fwd1 / np.linalg.norm(fwd1)
    back0 = -np.cross(n, v0)
    back0 = back0 / np.linalg.norm(back0)
    parts = [v0[None, :], v1[None, :]]
    if end_cap == "round" and cap_end:
        parts.append(_tangent_arc(v1, fwd1, nd, r, quad_segs, endpoints=True))
    parts.append(off[::-1])
    if end_cap == "round" and cap_start:
        parts.append(_tangent_arc(v0, nd, back0, r, quad_segs,
                                  endpoints=True)[1:])
    return _close_ccw(np.vstack(parts))


def _joint_wedge(v, d1, d2, r, quad_segs) -> Optional[np.ndarray]:
    """Round-join wedge at an interior vertex: circle sector between
    tangent directions d1 and d2 (shorter way)."""
    arc = _tangent_arc(v, d1, d2, r, quad_segs, endpoints=True)
    if len(arc) < 2:
        return None
    return _close_ccw(np.vstack([v[None, :], arc]))


def _close_ccw(ring_xyz: np.ndarray) -> np.ndarray:
    ring = sphere.xyz_to_lnglat(ring_xyz)
    # drop consecutive duplicates (piece seams share endpoints)
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.abs(ring[1:] - ring[:-1]).max(axis=1) > 1e-13
    if np.abs(ring[0] - ring[-1]).max() <= 1e-13 and keep[-1]:
        keep[-1] = False
    ring = ring[keep]
    ring = np.vstack([ring, ring[:1]])
    if sphere.ring_signed_area(sphere.lnglat_to_xyz(ring)) < 0:
        ring = ring[::-1].copy()
    return ring


def _union_fold(pieces: List[Geog]) -> Geog:
    acc = pieces[0]
    for p in pieces[1:]:
        acc = s2_union(acc, p)
    return acc


def s2_buffer(g: Optional[Geog], distance_m: float, quad_segs: int = 8,
              params: Optional[str] = None) -> Optional[Geog]:
    """Spherical buffer (S2BufferOperation analog, build.cc:1610-1718).

    Points -> geodesic circles (4*quad_segs vertices).  Lines -> union of
    per-edge pieces: round capsules, flat quads (endcap=flat), or one-sided
    strips (side=left|right) with round joint wedges at interior vertices
    and tangent-aligned quarter-circle end caps.  Polygons -> dilation
    (polygon ∪ buffered boundary) for positive distance, EROSION
    (polygon − buffered boundary) for negative.  Degenerate output ->
    POLYGON EMPTY (build.cc:1618-1623)."""
    if g is None:
        return None
    bp = BufferParams.parse(params) if params is not None else BufferParams()
    if quad_segs != 8 and params is None:
        bp.quad_segs = quad_segs
    if g.is_empty() or (g.dimension() < 2 and distance_m <= 0):
        return Geog(typ=3)
    if distance_m < 0:
        # polygon erosion: subtract the buffered boundary from the polygon
        rings = [Geog(lines=[rr.copy() for rings in g.polys
                             for rr in rings if len(rr) >= 4])]
        if not rings[0].lines:
            return Geog(typ=3)
        shell = s2_buffer(rings[0], -distance_m, quad_segs=bp.quad_segs)
        poly = Geog(polys=[[rr.copy() for rr in rings2] for rings2 in g.polys])
        res = s2_difference(poly, shell)
        return res if not res.is_empty() else Geog(typ=3)
    if distance_m == 0:
        return Geog(polys=[[rr.copy() for rr in rings] for rings in g.polys]) \
            if g.polys else Geog(typ=3)

    r = distance_m / EARTH_RADIUS_METERS
    qs = bp.quad_segs
    pieces: List[Geog] = []
    # point layer: circles for round caps; flat caps degenerate points to
    # nothing (GEOS-compatible)
    if bp.end_cap == "round" and bp.side == "both":
        for lng, lat in g.points:
            c = sphere.lnglat_to_xyz(np.array([lng, lat]))
            pieces.append(Geog(polys=[[_point_circle_ring(c, r, 4 * qs)]]))
    chains = [np.asarray(l) for l in g.lines if len(l) >= 2]
    ring_chains = [rr for rings in g.polys for rr in rings if len(rr) >= 4]
    for chain in chains:
        v = sphere.lnglat_to_xyz(chain)
        ne = len(v) - 1
        if bp.side == "both" and bp.end_cap == "round":
            for i in range(ne):
                pieces.append(Geog(polys=[[
                    _edge_capsule_ring(v[i], v[i + 1], r, qs)]]))
        elif bp.side == "both":  # flat end caps, round interior joints
            for i in range(ne):
                pieces.append(Geog(polys=[[_edge_flat_quad(v[i], v[i + 1], r)]]))
            for i in range(1, ne):
                c = sphere.lnglat_to_xyz(chain[i])
                pieces.append(Geog(polys=[[_point_circle_ring(c, r, 4 * qs)]]))
        else:  # one-sided strip
            for i in range(ne):
                pieces.append(Geog(polys=[[_edge_side_piece(
                    v[i], v[i + 1], r, bp.side, bp.end_cap, qs,
                    cap_start=(i == 0), cap_end=(i == ne - 1))]]))
            sign = 1.0 if bp.side == "left" else -1.0
            for i in range(1, ne):
                n1 = np.cross(v[i - 1], v[i])
                n2 = np.cross(v[i], v[i + 1])
                w = _joint_wedge(v[i], sign * n1 / np.linalg.norm(n1),
                                 sign * n2 / np.linalg.norm(n2), r, qs)
                if w is not None:
                    pieces.append(Geog(polys=[[w]]))
    # polygon boundary: always full round capsules (side/endcap apply to
    # open lines per the reference's parameter semantics)
    for rr in ring_chains:
        v = sphere.lnglat_to_xyz(rr)
        for i in range(len(v) - 1):
            pieces.append(Geog(polys=[[
                _edge_capsule_ring(v[i], v[i + 1], r, qs)]]))
    if g.polys:
        pieces.append(Geog(polys=[[rr.copy() for rr in rings]
                                  for rings in g.polys]))
    if not pieces:
        return Geog(typ=3)
    return _union_fold(pieces)


# ---------------------------------------------------------------------------
# overlay (general boundary algebra, core/overlay.py)
# ---------------------------------------------------------------------------

# re-exported for callers that want the closed-model primitives directly
from .overlay import (_clip_line_to_polygon, _points_in_polygon_mask,  # noqa: E402
                      _points_intersect_mask, overlay)

_TYP_BY_DIM = {0: 1, 1: 2, 2: 3}
_DIM_BY_TYP = {1: 0, 4: 0, 2: 1, 5: 1, 3: 2, 6: 2}


def _type_dim(g: Geog) -> int:
    """max_dimension per geoarrow-geography.cc:705-721: the content's max
    dimension, falling back to the declared type for EMPTY values."""
    d = g.dimension()
    if d >= 0:
        return d
    return _DIM_BY_TYP.get(g.typ or 7, -1)


def _typed_empty(dim: int) -> Geog:
    """EMPTY result typed by dimension (build.cc OutputEmptyGeometryType)."""
    return Geog(typ=_TYP_BY_DIM.get(dim, 7))


def s2_intersection(g1: Optional[Geog], g2: Optional[Geog]) -> Optional[Geog]:
    """Overlay intersection (build.cc:1329-1385 semantics): empty input ->
    GEOMETRYCOLLECTION EMPTY; disjoint / empty result -> EMPTY typed by
    min(max_dimension); else the general CLOSED-model overlay (shared edges
    -> LINESTRING residue, corner contacts -> POINT residue)."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty() or g2.is_empty():
        return Geog(typ=7)
    d = s2_distance_radians(g1, g2)
    empty_dim = min(_type_dim(g1), _type_dim(g2))
    if d is not None and d > EPS_RAD:
        return _typed_empty(empty_dim)
    res = overlay(g1, g2, "intersection")
    return _typed_empty(empty_dim) if res.is_empty() else res


def s2_union(g1: Optional[Geog], g2: Optional[Geog]) -> Optional[Geog]:
    """Union (build.cc:1259-1327): empty regurgitation, disjoint
    concatenation, else general overlay (adjacent polygons merge; lines and
    points absorbed by covering higher-dimension output)."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty() and g2.is_empty():
        return _typed_empty(max(_type_dim(g1), _type_dim(g2)))
    if g1.is_empty():
        return g2
    if g2.is_empty():
        return g1
    d = s2_distance_radians(g1, g2)
    if d is not None and d > EPS_RAD:
        return _concat(g1, g2)
    res = overlay(g1, g2, "union")
    return _typed_empty(max(_type_dim(g1), _type_dim(g2))) \
        if res.is_empty() else res


def s2_difference(g1: Optional[Geog], g2: Optional[Geog]) -> Optional[Geog]:
    """Difference (build.cc:1387-1446): empty a -> GEOMETRYCOLLECTION EMPTY,
    empty b -> a, disjoint -> a; empty result typed by a's max dimension."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty():
        return Geog(typ=7)
    if g2.is_empty():
        return g1
    d = s2_distance_radians(g1, g2)
    if d is not None and d > EPS_RAD:
        return g1
    res = overlay(g1, g2, "difference")
    return _typed_empty(_type_dim(g1)) if res.is_empty() else res


def s2_unary_union(g: Optional[Geog]) -> Optional[Geog]:
    """Union of all parts of one geography (build.cc:157-257).

    Valid polygon parts fold through the general union.  INVALID polygons
    (loops crossing each other) are repaired per the reference: every loop
    stands alone and folds into the accumulator in INPUT ORDER by
    nesting-depth parity — depth-even loops union in, depth-odd loops
    difference out (build.cc:200-215: 'use original nesting to suggest').
    The decode-time ring orientation encodes that parity (CCW=even,
    CW=odd); loops that CROSS another loop can't be anyone's hole, so they
    force union (the overlap dissolves)."""
    if g is None:
        return None
    invalid = bool(g.polys) and s2_find_validation_error(g) is not None
    acc: Optional[Geog] = None
    if invalid:
        flat = [np.asarray(r, dtype=np.float64)
                for rings in g.polys for r in rings if len(r) >= 4]
        xyz = [sphere.lnglat_to_xyz(r[:, :2]) for r in flat]
        crossed = [False] * len(flat)
        for i in range(len(flat)):
            for j in range(i + 1, len(flat)):
                if sphere.arcs_cross(
                        xyz[i][:-1, None, :], xyz[i][1:, None, :],
                        xyz[j][None, :-1, :], xyz[j][None, 1:, :]).any():
                    crossed[i] = crossed[j] = True
        acc = Geog(typ=3)
        for r, v, cr in zip(flat, xyz, crossed):
            area = sphere.ring_signed_area(v)
            even = cr or area >= 0
            shell = r if area >= 0 else r[::-1].copy()
            part = Geog(polys=[[shell]])
            acc = s2_union(acc, part) if even else s2_difference(acc, part)
    else:
        for rings in g.polys:
            part = Geog(polys=[[r.copy() for r in rings]])
            acc = part if acc is None else s2_union(acc, part)
    pts = np.unique(g.points, axis=0) if len(g.points) else None
    out = Geog(points=pts, lines=[l.copy() for l in g.lines],
               polys=acc.polys if acc is not None else [], typ=g.typ)
    return out


def _all_rings(g: Geog):
    """Every ring (shells CCW + holes CW) — the winding-based overlay
    consumes them directly."""
    return [r for rings in g.polys for r in rings]


def s2_sym_difference(g1: Optional[Geog], g2: Optional[Geog]) -> Optional[Geog]:
    """Symmetric difference via the two one-sided differences merged with a
    general union (build.cc:1448-1516 empty/disjoint semantics; the union
    pass normalizes the shared seam between the two crescents)."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty() and g2.is_empty():
        return _typed_empty(max(_type_dim(g1), _type_dim(g2)))
    if g1.is_empty():
        return g2
    if g2.is_empty():
        return g1
    d = s2_distance_radians(g1, g2)
    if d is not None and d > EPS_RAD:
        return _concat(g1, g2)
    a = s2_difference(g1, g2)
    b = s2_difference(g2, g1)
    if a.is_empty() and b.is_empty():
        return _typed_empty(max(_type_dim(g1), _type_dim(g2)))
    if a.is_empty():
        return b
    if b.is_empty():
        return a
    return s2_union(a, b)


def _concat(g1: Geog, g2: Geog) -> Geog:
    """Concatenate parts (the disjoint regurgitation fast path); mixed Z/M
    widths merge with NaN padding (the reference's output dimension
    negotiation, sedona_udf_internal.h:449-461)."""
    from .geog import _widen_coords
    zm = (g1.zm[0] or g2.zm[0], g1.zm[1] or g2.zm[1])

    def w(arr, src_zm):
        return _widen_coords(np.asarray(arr, dtype=np.float64), src_zm, zm)

    pts = [w(g.points, g.zm) for g in (g1, g2) if len(g.points)]
    return Geog(points=np.vstack(pts) if pts else None,
                lines=[w(l, g.zm) for g in (g1, g2) for l in g.lines],
                polys=[[w(r, g.zm) for r in rings]
                       for g in (g1, g2) for rings in g.polys],
                zm=zm)


def _has_lines(g: Geog) -> bool:
    return any(len(l) >= 2 for l in g.lines)


def _has_polys(g: Geog) -> bool:
    return any(rings for rings in g.polys)


def s2_build_point(g: Optional[Geog], strict: bool = True) -> Optional[Geog]:
    """Coerce to the point layer (build.cc:321-334): strict=True errors on
    higher-dimension shapes (the reference's behavior); strict=False is the
    layer-action INCLUDE extraction (build_test.cc:48-68)."""
    if g is None:
        return None
    if strict and (_has_lines(g) or _has_polys(g)):
        raise ValueError("s2_build_point: input contains non-point shapes")
    pts = np.unique(g.points, axis=0) if len(g.points) else None
    return Geog(points=pts, typ=1, zm=g.zm)


def s2_build_polyline(g: Optional[Geog], strict: bool = True) -> Optional[Geog]:
    """Coerce to the polyline layer (build.cc:336-349)."""
    if g is None:
        return None
    if strict and (len(g.points) or _has_polys(g)):
        raise ValueError("s2_build_polyline: input contains non-line shapes")
    return Geog(lines=[l.copy() for l in g.lines if len(l) >= 2], typ=2,
                zm=g.zm)


def s2_build_polygon(g: Optional[Geog], strict: bool = True) -> Optional[Geog]:
    """Coerce to the polygon layer (build.cc:351-364)."""
    if g is None:
        return None
    if strict and (len(g.points) or _has_lines(g)):
        raise ValueError("s2_build_polygon: input contains non-polygon shapes")
    return Geog(polys=[[r.copy() for r in rings] for rings in g.polys
                       if rings], typ=3, zm=g.zm)
