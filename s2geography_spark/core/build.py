"""Build ops: convex hull, point-on-surface, simplify, reduce-precision,
buffer, and the overlay (intersection/union/difference/symdifference)
subset the engine supports natively.

Scope notes vs the reference (/root/reference/src/s2geography/build.cc):
  * convex hull (accessors-geog.cc:339-455): gnomonic-projection Graham scan
    — exact for inputs within a hemisphere (the common case; the reference's
    S2ConvexHullQuery handles the full sphere).
  * simplify (build.cc:1198-1229): geodesic Douglas-Peucker with tolerance
    in meters — same contract (keeps chain endpoints), different snapper.
  * reduce precision (build.cc:1165-1196): IntLatLngSnapFunction analog —
    round lon/lat to 10^-e degrees, drop collapsed parts.
  * buffer (build.cc:1610-1718): exact spherical circles for points
    (quad_segs per quarter, PostGIS-style); line/polygon buffering routes
    through the buffered covering at join level (operators/spatial_join) and
    is otherwise not yet implemented natively.
  * overlay: empty/disjoint fast paths (build.cc:1259-1516 shortcuts),
    point-vs-polygon and line-vs-polygon exact clipping; polygon-vs-polygon
    general overlay is NOT implemented in round 1 (raises NotImplementedError
    unless disjoint/contained — the covering prefilter cases).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import sphere
from .geog import Geog
from .ops import EPS_RAD, s2_contains, s2_distance_radians

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
    as abs (PostGIS compat, build.cc:1214-1216)."""
    if g is None:
        return None
    tol = abs(tolerance_m) / EARTH_RADIUS_METERS
    lines = []
    for l in g.lines:
        if len(l) < 2:
            continue
        v = sphere.lnglat_to_xyz(l)
        lines.append(l[_dp_simplify(v, tol)])
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
    return Geog(points=g.points.copy() if len(g.points) else None,
                lines=lines, polys=polys, typ=g.typ)


def s2_reduce_precision(g: Optional[Geog], grid_exponent: int) -> Optional[Geog]:
    """Snap lon/lat to 10^-e degrees (IntLatLngSnapFunction analog); drops
    parts that collapse."""
    if g is None:
        return None

    def snap(c):
        return np.round(np.asarray(c, dtype=np.float64), grid_exponent)

    pts = snap(g.points) if len(g.points) else None
    lines = []
    for l in g.lines:
        s = snap(l)
        # drop consecutive duplicates
        keep = np.ones(len(s), dtype=bool)
        keep[1:] = (np.abs(s[1:] - s[:-1]).max(axis=1) > 0)
        s = s[keep]
        if len(s) >= 2:
            lines.append(s)
    polys = []
    for rings in g.polys:
        new_rings = []
        for k, r in enumerate(rings):
            s = snap(r)
            keep = np.ones(len(s), dtype=bool)
            keep[1:] = (np.abs(s[1:] - s[:-1]).max(axis=1) > 0)
            s = s[keep]
            if len(s) and (s[0] != s[-1]).any():
                s = np.vstack([s, s[:1]])
            if len(s) >= 4:
                new_rings.append(s)
            elif k == 0:
                new_rings = []
                break
        if new_rings:
            polys.append(new_rings)
    return Geog(points=pts, lines=lines, polys=polys, typ=g.typ)


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


def _edge_capsule_ring(a_xyz: np.ndarray, b_xyz: np.ndarray, r: float,
                       quad_segs: int) -> np.ndarray:
    """Closed CCW ring buffering one geodesic edge by r: two exact offset
    small-circle curves (pole = the edge's great-circle normal) + round caps."""
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
    # round caps: rotate from +n to -n through the outward tangent
    def cap(center, outward):
        t_hat = outward / np.linalg.norm(outward)
        th = np.linspace(0, np.pi, 2 * quad_segs + 1)[1:-1]
        dirs = np.cos(th)[:, None] * n[None, :] + np.sin(th)[:, None] * t_hat[None, :]
        return np.cos(r) * center[None, :] + np.sin(r) * dirs

    cap_b = cap(b_xyz, np.cross(n, b_xyz))          # +n -> -n via forward
    cap_a = cap(a_xyz, -np.cross(n, a_xyz))[::-1]   # -n -> +n via backward
    ring_xyz = np.vstack([left, cap_b, right[::-1], cap_a])
    ring = sphere.xyz_to_lnglat(ring_xyz)
    ring = np.vstack([ring, ring[:1]])
    if sphere.ring_signed_area(sphere.lnglat_to_xyz(ring)) < 0:
        ring = ring[::-1].copy()
    return ring


def s2_buffer(g: Optional[Geog], distance_m: float,
              quad_segs: int = 8) -> Optional[Geog]:
    """Spherical buffer for points, lines and polygons.

    Points -> exact geodesic circles (4*quad_segs vertices).  Lines ->
    union of per-edge capsules (exact small-circle offsets + round caps).
    Polygons -> polygon ∪ buffered boundary (positive distance).
    Degenerate distance -> POLYGON EMPTY (build.cc:1618-1623)."""
    if g is None:
        return None
    if distance_m <= 0 or g.is_empty():
        return Geog(typ=3)
    r = distance_m / EARTH_RADIUS_METERS
    n_circle = max(4 * quad_segs, 8)
    pieces: List[Geog] = []
    for lng, lat in g.points:
        c = sphere.lnglat_to_xyz(np.array([lng, lat]))
        pieces.append(Geog(polys=[[_point_circle_ring(c, r, n_circle)]]))
    chains = [l for l in g.lines if len(l) >= 2]
    for rings in g.polys:
        for rr in rings:
            if len(rr) >= 4:
                chains.append(rr)
    for chain in chains:
        v = sphere.lnglat_to_xyz(chain)
        for i in range(len(v) - 1):
            pieces.append(Geog(polys=[[
                _edge_capsule_ring(v[i], v[i + 1], r, quad_segs)]]))
    if g.polys:
        pieces.append(Geog(polys=[[rr.copy() for rr in rings]
                                  for rings in g.polys]))
    acc = pieces[0]
    for p in pieces[1:]:
        acc = s2_union(acc, p)
    return acc


# ---------------------------------------------------------------------------
# overlay subset
# ---------------------------------------------------------------------------

def _clip_line_to_polygon(line_lnglat: np.ndarray, poly: Geog, keep_inside: bool):
    """Split a polyline at polygon-boundary crossings; keep inside (or
    outside) pieces.  Returns list of (m, 2) lon/lat chains."""
    v = sphere.lnglat_to_xyz(line_lnglat)
    ra, rb = poly.ring_edges_xyz()
    out = []
    cur: List[np.ndarray] = []

    def flush():
        nonlocal cur
        if len(cur) >= 2:
            out.append(sphere.xyz_to_lnglat(np.array(cur)))
        cur = []

    for i in range(len(v) - 1):
        a, b = v[i], v[i + 1]
        # find crossings with all ring edges
        crossings = []
        cross_mask = sphere.arcs_cross(a, b, ra, rb)
        for j in np.where(cross_mask)[0]:
            n1 = np.cross(a, b)
            n2 = np.cross(ra[j], rb[j])
            p = np.cross(n1, n2)
            nn = np.linalg.norm(p)
            if nn == 0:
                continue
            p = p / nn
            if sphere.angle(a, p) + sphere.angle(p, b) > sphere.angle(a, b) + 1e-12:
                p = -p
            crossings.append((float(sphere.angle(a, p)), p))
        crossings.sort(key=lambda t: t[0])
        pieces = [a] + [p for _, p in crossings] + [b]
        for k in range(len(pieces) - 1):
            mid = sphere.normalize((pieces[k] + pieces[k + 1]) / 2.0)
            inside = bool(sphere.contains_points(
                mid.reshape(1, 3), ra, rb, model="closed")[0])
            want = inside if keep_inside else not inside
            if want:
                if not cur:
                    cur = [pieces[k]]
                elif np.linalg.norm(cur[-1] - pieces[k]) > 1e-15:
                    flush()
                    cur = [pieces[k]]
                cur.append(pieces[k + 1])
            else:
                flush()
    flush()
    return out


def _points_in_polygon_mask(pts_lnglat: np.ndarray, poly: Geog):
    ra, rb = poly.ring_edges_xyz()
    if len(ra) == 0 or len(pts_lnglat) == 0:
        return np.zeros(len(pts_lnglat), dtype=bool)
    return sphere.contains_points(sphere.lnglat_to_xyz(pts_lnglat), ra, rb,
                                  model="closed")


def _points_intersect_mask(pts_lnglat: np.ndarray, other: Geog):
    """Closed-model point-intersects-geography mask: inside polygons, on any
    edge, or coincident with a point of `other`."""
    n = len(pts_lnglat)
    if n == 0:
        return np.zeros(0, dtype=bool)
    xyz = sphere.lnglat_to_xyz(np.asarray(pts_lnglat, dtype=np.float64))
    out = _points_in_polygon_mask(pts_lnglat, other)
    ea, eb = other.all_edges_xyz()
    if len(ea):
        d = sphere.point_arc_distance(xyz[:, None, :], ea[None, :, :],
                                      eb[None, :, :]).min(axis=1)
        out |= d <= EPS_RAD
    if len(other.points):
        gp = other.points_xyz()
        d = sphere.angle(xyz[:, None, :], gp[None, :, :]).min(axis=1)
        out |= d <= EPS_RAD
    return out


def _line_line_crossings(g1: Geog, g2: Geog) -> np.ndarray:
    """Crossing points (lnglat) between the polylines of two geographies."""
    e1a, e1b = g1.line_edges_xyz()
    e2a, e2b = g2.line_edges_xyz()
    if len(e1a) == 0 or len(e2a) == 0:
        return np.zeros((0, 2))
    mask = sphere.arcs_cross(e1a[:, None, :], e1b[:, None, :],
                             e2a[None, :, :], e2b[None, :, :])
    pts = []
    for i, j in zip(*np.where(mask)):
        n1 = np.cross(e1a[i], e1b[i])
        n2 = np.cross(e2a[j], e2b[j])
        p = np.cross(n1, n2)
        nn = np.linalg.norm(p)
        if nn == 0:
            continue
        p = p / nn
        if sphere.angle(e1a[i], p) + sphere.angle(p, e1b[i]) > \
                sphere.angle(e1a[i], e1b[i]) + 1e-12:
            p = -p
        pts.append(sphere.xyz_to_lnglat(p))
    # shared endpoints also intersect (closed model)
    v1 = np.vstack([e1a, e1b])
    v2 = np.vstack([e2a, e2b])
    d = sphere.angle(v1[:, None, :], v2[None, :, :])
    for i in np.where((d <= EPS_RAD).any(axis=1))[0]:
        pts.append(sphere.xyz_to_lnglat(v1[i]))
    if not pts:
        return np.zeros((0, 2))
    return np.unique(np.round(np.array(pts), 12), axis=0)


def s2_intersection(g1: Optional[Geog], g2: Optional[Geog]) -> Optional[Geog]:
    """Overlay intersection for the supported cases: any-empty / disjoint
    fast paths (build.cc:1339-1359); (multi)point x any; line x polygon.
    polygon x polygon only when disjoint or one contains the other."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty() or g2.is_empty():
        return Geog(typ=min(g1.typ or 7, g2.typ or 7))
    d = s2_distance_radians(g1, g2)
    if d is not None and d > EPS_RAD:
        return Geog(typ=7)  # disjoint -> EMPTY
    # point side handling (either side)
    for a, b, in ((g1, g2), (g2, g1)):
        if a.dimension() == 0:
            if b.dimension() == 0:
                common = {tuple(p) for p in a.points} & {tuple(p) for p in b.points}
                return Geog(points=np.array(sorted(common)) if common else None, typ=1)
            keep = _points_intersect_mask(a.points, b)
            return Geog(points=a.points[keep], typ=1)
    if g1.dimension() == 1 and g2.dimension() == 2:
        lines = [c for l in g1.lines for c in _clip_line_to_polygon(l, g2, True)]
        return Geog(lines=lines, typ=2)
    if g2.dimension() == 1 and g1.dimension() == 2:
        lines = [c for l in g2.lines for c in _clip_line_to_polygon(l, g1, True)]
        return Geog(lines=lines, typ=2)
    if g1.dimension() == 1 and g2.dimension() == 1:
        # line x line: the crossing point set (collinear-overlap unsupported)
        pts = _line_line_crossings(g1, g2)
        return Geog(points=pts if len(pts) else None, typ=1)
    # polygon x polygon: containment fast paths, else boundary tracing
    if s2_contains(g1, g2):
        return Geog(polys=[[r.copy() for r in rings] for rings in g2.polys])
    if s2_contains(g2, g1):
        return Geog(polys=[[r.copy() for r in rings] for rings in g1.polys])
    if g1.dimension() == 2 and g2.dimension() == 2:
        from .overlay import overlay_shells
        res = overlay_shells(_all_rings(g1), _all_rings(g2), "intersection")
        if res is not None:
            return res
    raise NotImplementedError(
        "unsupported overlay combination (e.g. line x line) in round 1")


def s2_union(g1: Optional[Geog], g2: Optional[Geog]) -> Optional[Geog]:
    """Union: empty regurgitation + disjoint concatenation (build.cc:
    1271-1299); overlapping polygons only via containment fast paths."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty():
        return g2
    if g2.is_empty():
        return g1
    d = s2_distance_radians(g1, g2)
    if d is not None and d > EPS_RAD:
        return _concat(g1, g2)
    if s2_contains(g1, g2):
        return g1
    if s2_contains(g2, g1):
        return g2
    if g1.dimension() == 0 and g2.dimension() == 0:
        pts = np.unique(np.vstack([g1.points, g2.points]), axis=0)
        return Geog(points=pts, typ=1)
    if g1.dimension() == 2 and g2.dimension() == 2:
        from .overlay import overlay_shells
        res = overlay_shells(_all_rings(g1), _all_rings(g2), "union")
        if res is not None:
            return res
    raise NotImplementedError(
        "unsupported union combination in round 1")


def s2_difference(g1: Optional[Geog], g2: Optional[Geog]) -> Optional[Geog]:
    """Difference: empty a -> EMPTY, empty b -> a, disjoint -> a
    (build.cc:1395-1423); point/line minus polygon exact."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty():
        return Geog(typ=g1.typ or 7)
    if g2.is_empty():
        return g1
    d = s2_distance_radians(g1, g2)
    if d is not None and d > EPS_RAD:
        return g1
    if g1.dimension() == 0:
        keep = ~_points_in_polygon_mask(g1.points, g2)
        if g2.dimension() == 0:
            bset = {tuple(p) for p in g2.points}
            keep = np.array([tuple(p) not in bset for p in g1.points], dtype=bool)
        return Geog(points=g1.points[keep], typ=1)
    if g1.dimension() == 1 and g2.dimension() == 2:
        lines = [c for l in g1.lines for c in _clip_line_to_polygon(l, g2, False)]
        return Geog(lines=lines, typ=2)
    if g1.dimension() == 2 and g2.dimension() == 2:
        if s2_contains(g2, g1):
            return Geog(typ=3)  # fully erased
        from .overlay import overlay_shells
        if s2_contains(g1, g2):
            # B strictly interior to A, no boundary crossings: punch each
            # B shell into the A shell that contains it as a CW hole
            polys = [[r.copy() for r in rings] for rings in g1.polys]
            for rings2 in g2.polys:
                if not rings2:
                    continue
                hole = rings2[0][::-1].copy()  # shell CCW -> hole CW
                p0 = sphere.lnglat_to_xyz(rings2[0][:1])
                for rings in polys:
                    shell = Geog(polys=[[rings[0]]])
                    ra, rb = shell.ring_edges_xyz()
                    if sphere.contains_points(p0, ra, rb)[0]:
                        rings.append(hole)
                        break
            return Geog(polys=polys)
        res = overlay_shells(_all_rings(g1), _all_rings(g2), "difference")
        if res is not None:
            return res
    raise NotImplementedError(
        "unsupported difference combination in round 1")


def s2_unary_union(g: Optional[Geog]) -> Optional[Geog]:
    """Union of all parts of one geography (build.cc:157-257 analog for
    valid inputs): folds the general union over polygon parts; points and
    lines are deduplicated/concatenated."""
    if g is None:
        return None
    acc: Optional[Geog] = None
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
    """Symmetric difference via the two one-sided differences
    (build.cc:1448-1516 empty/disjoint semantics)."""
    if g1 is None or g2 is None:
        return None
    if g1.is_empty():
        return g2
    if g2.is_empty():
        return g1
    d = s2_distance_radians(g1, g2)
    if d is not None and d > EPS_RAD:
        return _concat(g1, g2)
    a = s2_difference(g1, g2)
    b = s2_difference(g2, g1)
    return _concat(a, b)


def _concat(g1: Geog, g2: Geog) -> Geog:
    pts = [p for p in (g1.points, g2.points) if len(p)]
    return Geog(points=np.vstack(pts) if pts else None,
                lines=[l.copy() for l in g1.lines + g2.lines],
                polys=[[r.copy() for r in rings]
                       for rings in g1.polys + g2.polys])
