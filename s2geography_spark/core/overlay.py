"""General spherical polygon overlay (intersection / union / difference)
for crossing polygons — Weiler-Atherton boundary tracing on the sphere.

This supplies what the reference delegates to S2BooleanOperation
(build.cc:1259-1516): an exact overlay of polygon boundaries made of
geodesic edges.  From-scratch implementation:

  1. find all crossing points between ring edges of A and B
     (great-circle plane intersections restricted to both arcs),
  2. split both rings into directed segments at the crossings (keeping the
     original vertex chains between crossings),
  3. keep segments by the operation's rule (inside/outside the other
     polygon, tested at the segment midpoint with winding numbers),
  4. stitch kept segments into closed rings at the shared crossings,
  5. classify output rings shell (CCW) / hole (CW) and nest holes.

Assumes generic position (no vertex exactly on the other boundary, no
collinear overlapping edges) — the usual float-level caveat of any
non-snap-rounding overlay; degenerate inputs should first go through
s2_reduce_precision.  Inputs here are hole-free shell sets; build.py
composes hole handling where supported.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import sphere
from .geog import Geog


def _ring_xyz(ring_lnglat: np.ndarray) -> np.ndarray:
    """Closed lnglat ring -> open xyz vertex cycle (closing vertex dropped)."""
    return sphere.lnglat_to_xyz(np.asarray(ring_lnglat, dtype=np.float64)[:-1])


def _ring_edges(verts_xyz: np.ndarray):
    n = len(verts_xyz)
    return verts_xyz, verts_xyz[(np.arange(n) + 1) % n]


def _all_edges(vlist):
    aa, bb = [], []
    for v in vlist:
        x, y = _ring_edges(v)
        aa.append(x)
        bb.append(y)
    return np.vstack(aa), np.vstack(bb)


def _crossings(av: np.ndarray, bv: np.ndarray):
    """Crossing points between two open vertex cycles:
    list of (a_edge, ta, b_edge, tb, point_xyz)."""
    na, nb = len(av), len(bv)
    a0, a1 = _ring_edges(av)
    b0, b1 = _ring_edges(bv)
    mask = sphere.arcs_cross(a0[:, None, :], a1[:, None, :],
                             b0[None, :, :], b1[None, :, :])
    out = []
    for ai, bi in zip(*np.where(mask)):
        n1 = np.cross(a0[ai], a1[ai])
        n2 = np.cross(b0[bi], b1[bi])
        p = np.cross(n1, n2)
        nn = np.linalg.norm(p)
        if nn == 0:
            continue
        p = p / nn
        if sphere.angle(a0[ai], p) + sphere.angle(p, a1[ai]) > \
                sphere.angle(a0[ai], a1[ai]) + 1e-12:
            p = -p
        ta = sphere.angle(a0[ai], p) / max(sphere.angle(a0[ai], a1[ai]), 1e-300)
        tb = sphere.angle(b0[bi], p) / max(sphere.angle(b0[bi], b1[bi]), 1e-300)
        out.append((int(ai), float(ta), int(bi), float(tb), p))
    return out


def _split_cycle(verts_xyz: np.ndarray, crossings):
    """Split one vertex cycle at crossing nodes.

    crossings: list of (edge_idx, t, global_id, point).
    Returns directed segments (start_gid, end_gid, chain_xyz) following the
    cycle's orientation; chain includes both crossing endpoints and all
    original vertices between them.  Empty when no crossings."""
    per_edge: dict = {}
    for (ei, t, gid, p) in crossings:
        per_edge.setdefault(ei, []).append((t, gid, p))
    nodes = []  # (xyz, gid-or-None)
    for i, v in enumerate(verts_xyz):
        nodes.append((v, None))
        for t, gid, p in sorted(per_edge.get(i, []), key=lambda x: x[0]):
            nodes.append((p, gid))
    n = len(nodes)
    cross_pos = [k for k, (_, g) in enumerate(nodes) if g is not None]
    segs = []
    for k, start in enumerate(cross_pos):
        end = cross_pos[(k + 1) % len(cross_pos)]
        chain = [nodes[start][0]]
        j = (start + 1) % n
        while j != end:
            chain.append(nodes[j][0])
            j = (j + 1) % n
        chain.append(nodes[end][0])
        segs.append((nodes[start][1], nodes[end][1], chain))
    return segs


def _seg_midpoint(chain) -> np.ndarray:
    """Midpoint of the segment's longest sub-arc (off crossings/vertices)."""
    best_d, best_p = -1.0, chain[0]
    for i in range(len(chain) - 1):
        d = float(sphere.angle(chain[i], chain[i + 1]))
        if d > best_d:
            best_d = d
            best_p = sphere.arc_interpolate(chain[i], chain[i + 1], 0.5)
    return best_p


def _inside(p: np.ndarray, edges) -> bool:
    ra, rb = edges
    return bool(sphere.winding_number(np.asarray(p).reshape(1, 3), ra, rb)[0] > 0)


def _stitch(segments) -> List[np.ndarray]:
    """Stitch directed segments into closed rings at shared crossing ids."""
    by_start: dict = {}
    for s in segments:
        by_start.setdefault(s[0], []).append(s)
    rings, used = [], set()
    for s in segments:
        if id(s) in used:
            continue
        chain = []
        cur = s
        ok = False
        for _ in range(len(segments) + 1):
            used.add(id(cur))
            chain.extend(cur[2][:-1])
            if cur[1] == s[0]:
                ok = True
                break
            nxts = [t for t in by_start.get(cur[1], []) if id(t) not in used]
            if not nxts:
                break
            cur = nxts[0]
        if ok and len(chain) >= 3:
            ring_xyz = np.array(chain + [chain[0]])
            rings.append(sphere.xyz_to_lnglat(ring_xyz))
    return rings


def _assemble(rings_lnglat: List[np.ndarray]) -> Geog:
    """Signed-area shell/hole classification + hole nesting."""
    if not rings_lnglat:
        return Geog(typ=7)
    shells, holes = [], []
    for r in rings_lnglat:
        area = sphere.ring_signed_area(sphere.lnglat_to_xyz(r))
        (shells if area >= 0 else holes).append(r)
    polys = [[s] for s in shells]
    for h in holes:
        p0 = sphere.lnglat_to_xyz(h[:1])[0]
        for poly in polys:
            if _inside(p0, _ring_edges(_ring_xyz(poly[0]))):
                poly.append(h)
                break
        else:
            if polys:
                polys[0].append(h)
    return Geog(polys=polys)


_DEGEN_EPS = 5e-12  # radians (~30 um): vertex-on-boundary detection


def _degenerate_contact(av_list, bv_list) -> bool:
    """True when a vertex of one side lies (within eps) on the other side's
    boundary — the positions Weiler-Atherton crossing parity cannot handle."""
    ea = _all_edges(av_list)
    eb = _all_edges(bv_list)
    va = np.vstack(av_list)
    vb = np.vstack(bv_list)
    da = sphere.point_arc_distance(vb[:, None, :], ea[0][None, :, :],
                                   ea[1][None, :, :]).min(axis=1)
    db = sphere.point_arc_distance(va[:, None, :], eb[0][None, :, :],
                                   eb[1][None, :, :]).min(axis=1)
    return bool((da < _DEGEN_EPS).any() or (db < _DEGEN_EPS).any())


def _perturb(rings: List[np.ndarray], k: int) -> List[np.ndarray]:
    """Deterministic micro-nudge (<= ~2e-9 deg, ~0.2 mm on Earth) used to
    resolve exact vertex-on-edge / shared-edge contact — the pragmatic
    alternative to full symbolic perturbation; boundary placement error is
    below any float-WKB use case and is documented."""
    d = 1.3e-9 * k
    out = []
    for r in rings:
        r2 = np.asarray(r, dtype=np.float64).copy()
        r2[:, 0] += d
        r2[:, 1] += 0.7e-9 * k
        out.append(r2)
    return out


def overlay_shells(a_rings: List[np.ndarray], b_rings: List[np.ndarray],
                   op: str) -> Optional[Geog]:
    """Overlay two ring sets (shells CCW, holes CW — the winding-number
    inside test consumes holes natively); op in {'intersection', 'union',
    'difference'}.  Returns None when the boundaries do not cross (caller
    handles containment/disjoint fast paths)."""
    av_list = [_ring_xyz(r) for r in a_rings if len(r) >= 4]
    bv_list = [_ring_xyz(r) for r in b_rings if len(r) >= 4]
    if not av_list or not bv_list:
        return None
    for k in (1, 3, 9, 27):
        if not _degenerate_contact(av_list, bv_list):
            break
        bv_list = [_ring_xyz(r) for r in _perturb(b_rings, k) if len(r) >= 4]
    return _overlay_shells_generic(av_list, bv_list, op)


def _overlay_shells_generic(av_list, bv_list, op: str) -> Optional[Geog]:

    # global crossing discovery.  Zero crossings is NOT an early-out: the
    # per-ring keep rules below correctly assemble every nesting case
    # (disjoint concat, containment, holes swallowed by the other side).
    per_a = [[] for _ in av_list]
    per_b = [[] for _ in bv_list]
    gid = 0
    for i, av in enumerate(av_list):
        for j, bv in enumerate(bv_list):
            for (ai, ta, bi, tb, p) in _crossings(av, bv):
                per_a[i].append((ai, ta, gid, p))
                per_b[j].append((bi, tb, gid, p))
                gid += 1

    ea = _all_edges(av_list)
    eb = _all_edges(bv_list)

    kept = []
    for i, av in enumerate(av_list):
        if not per_a[i]:
            # ring with no crossings: keep whole ring if its interior side
            # qualifies (inside B for intersection, outside for union/diff)
            mid = av[0]
            inside_b = _inside(mid, eb)
            keep = inside_b if op == "intersection" else not inside_b
            if keep:
                ring = sphere.xyz_to_lnglat(np.vstack([av, av[:1]]))
                kept.append(("whole", ring))
            continue
        for (s, e, chain) in _split_cycle(av, per_a[i]):
            inside_b = _inside(_seg_midpoint(chain), eb)
            if (inside_b if op == "intersection" else not inside_b):
                kept.append((s, e, chain))
    for j, bv in enumerate(bv_list):
        if not per_b[j]:
            mid = bv[0]
            inside_a = _inside(mid, ea)
            if op == "intersection" and inside_a:
                kept.append(("whole", sphere.xyz_to_lnglat(np.vstack([bv, bv[:1]]))))
            elif op == "union" and not inside_a:
                kept.append(("whole", sphere.xyz_to_lnglat(np.vstack([bv, bv[:1]]))))
            elif op == "difference" and inside_a:
                # hole punched into A
                kept.append(("whole", sphere.xyz_to_lnglat(
                    np.vstack([bv, bv[:1]]))[::-1].copy()))
            continue
        for (s, e, chain) in _split_cycle(bv, per_b[j]):
            inside_a = _inside(_seg_midpoint(chain), ea)
            if op == "intersection":
                if inside_a:
                    kept.append((s, e, chain))
            elif op == "union":
                if not inside_a:
                    kept.append((s, e, chain))
            else:  # difference A \ B: B-boundary inside A, reversed
                if inside_a:
                    kept.append((e, s, list(reversed(chain))))

    whole = [r for r in kept if r[0] == "whole"]
    segs = [r for r in kept if r[0] != "whole"]
    rings = _stitch(segs) + [r for (_w, r) in whole]
    return _assemble(rings)
