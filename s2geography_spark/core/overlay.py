"""General spherical overlay (intersection / union / difference) with exact
degenerate-input handling: shared/collinear edges, vertex-on-edge and
vertex-vertex contacts, holes, multipolygons, and mixed dimensions.

Replaces the round-1 Weiler-Atherton tracer (which assumed generic position
and micro-perturbed degenerate input).  From-scratch boundary algebra:

  1. EVENTS: find every contact between the two boundaries — proper edge
     crossings (great-circle plane intersections) and vertices lying in the
     interior of the other side's edges.  Collinear overlapping edges need
     no special case: their endpoints are vertex-on-edge events, so after
     splitting, shared portions become sub-edge pairs with identical nodes.
  2. ATOMIZE: split both boundaries at original vertices + events into
     atomic directed sub-edges over a shared node registry (positions
     within 1e-11 rad merge to one node).
  3. CLASSIFY each sub-edge by its midpoint against the other side:
     `in` / `out` (winding number — holes CW are handled natively) or
     `on` the other boundary, split into parallel / anti-parallel by
     comparing great-circle normals.  Every directed boundary edge has its
     solid on the LEFT (shells CCW, holes CW), which makes the keep rules
     below exact for any nesting:
        intersection: A(in | on-parallel) + B(in);  anti-parallel shared
                      edges are the measure-zero CLOSED-model residue
        union:        A(out | on-parallel) + B(out)
        difference:   A(out | on-anti) + reversed(B in)
  4. STITCH kept edges into rings (sibling pairs cancel; at multi-edge
     nodes take the most counterclockwise turn so pinched regions split
     into simple rings), then classify shells/holes by signed area.

Semantics follow the reference's S2BooleanOperation configuration
(/root/reference/src/s2geography/build.cc:1236-1516): polygon model CLOSED
with closed-set normalization into point/line/polygon layers — the
intersection of polygons sharing only an edge is that edge as a
LINESTRING; sharing only a corner, a POINT; lines and points covered by
higher-dimension output are suppressed (NormalizeClosedSet analog).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import List, Optional

import numpy as np

from . import sphere
from .geog import Geog

EPS = 1e-11  # radians (~60 um on Earth): on-boundary / node-merge tolerance


# ---------------------------------------------------------------------------
# node registry
# ---------------------------------------------------------------------------

class _NodeIndex:
    """Merge xyz positions within EPS to shared integer node ids (bucketed
    by 1e-9-rad cells; contacts from both sides land on one node).  Nodes
    that came from original input vertices remember their exact lnglat so
    output coordinates are bit-identical to the input (no xyz roundtrip)."""

    def __init__(self, eps: float = EPS):
        self.eps = eps
        self.buckets: dict = {}
        self.pos: List[np.ndarray] = []
        self._ll: dict = {}

    def key(self, p) -> int:
        p = np.asarray(p, dtype=np.float64)
        base = np.floor(p * 1e9).astype(np.int64)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                for dz in (0, -1, 1):
                    k = (int(base[0]) + dx, int(base[1]) + dy, int(base[2]) + dz)
                    for idx in self.buckets.get(k, ()):
                        if np.linalg.norm(self.pos[idx] - p) < self.eps:
                            return idx
        idx = len(self.pos)
        self.pos.append(p)
        self.buckets.setdefault((int(base[0]), int(base[1]), int(base[2])),
                                []).append(idx)
        return idx

    def set_ll(self, idx: int, ll) -> None:
        if idx not in self._ll:
            self._ll[idx] = np.asarray(ll, dtype=np.float64)

    def lnglat(self, idx: int) -> np.ndarray:
        ll = self._ll.get(idx)
        if ll is None:
            ll = sphere.xyz_to_lnglat(self.pos[idx])
        return ll


# ---------------------------------------------------------------------------
# events + atomization
# ---------------------------------------------------------------------------

def _gc_intersection(a0, a1, b0, b1):
    """Intersection point of the two great circles lying inside BOTH arcs.

    Near-parallel edges make cross(n1, n2) ill-conditioned — the raw point
    can land anywhere on the sphere (observed: the antipode).  Both sign
    candidates are validated against both arcs; garbage is rejected (None)
    rather than injected as a bogus node."""
    n1 = np.cross(a0, a1)
    n2 = np.cross(b0, b1)
    p = np.cross(n1, n2)
    nn = np.linalg.norm(p)
    # near-collinear arcs (same great circle): the 'crossing' arcs_cross
    # reported is sign noise on ~1e-17 determinants — there is no single
    # crossing point (shared runs are handled by vertex-on-edge events)
    if nn < 1e-9 * np.linalg.norm(n1) * np.linalg.norm(n2) or nn == 0:
        return None
    p = p / nn

    def arc_err(q):
        ea = float(sphere.angle(a0, q) + sphere.angle(q, a1)
                   - sphere.angle(a0, a1))
        eb = float(sphere.angle(b0, q) + sphere.angle(q, b1)
                   - sphere.angle(b0, b1))
        return max(ea, eb)

    e_pos, e_neg = arc_err(p), arc_err(-p)
    q, e = (p, e_pos) if e_pos <= e_neg else (-p, e_neg)
    return q if e < 1e-9 else None


def _chain_edges(cycles, closed):
    """Concatenate edges of all cycles/chains: (a0, a1) plus per-cycle
    global edge offsets."""
    aa, bb, offs = [], [], []
    off = 0
    for v in cycles:
        offs.append(off)
        if closed:
            aa.append(v)
            bb.append(v[(np.arange(len(v)) + 1) % len(v)])
            off += len(v)
        else:
            aa.append(v[:-1])
            bb.append(v[1:])
            off += len(v) - 1
    if aa:
        return np.vstack(aa), np.vstack(bb), offs
    return np.zeros((0, 3)), np.zeros((0, 3)), offs


def _vertex_events(ev, a0, a1, b_verts):
    """Add b vertices strictly interior to a edges into ev (symmetric by
    nature: the node IS b's own vertex, so b's atomization has it too)."""
    if len(b_verts) == 0 or len(a0) == 0:
        return
    d = sphere.point_arc_distance(b_verts[:, None, :],
                                  a0[None, :, :], a1[None, :, :])
    for vi, i in zip(*np.where(d < EPS)):
        v = b_verts[vi]
        la = float(sphere.angle(a0[i], v))
        lb = float(sphere.angle(v, a1[i]))
        lab = float(sphere.angle(a0[i], a1[i]))
        if la > EPS and lb > EPS and lab > 0:
            ev.setdefault(int(i), []).append((la / lab, v))


def _cross_events(ev_a, ev_b, a0, a1, b0, b1):
    """Register proper crossings into BOTH sides' event maps with the SAME
    point object — both atomizations then share the node, which the
    classifier's shared-ends gate depends on (a one-sided event would make
    a shared run look like a grazing crossing)."""
    if len(a0) == 0 or len(b0) == 0:
        return
    cr = sphere.arcs_cross(a0[:, None, :], a1[:, None, :],
                           b0[None, :, :], b1[None, :, :])
    crt = sphere.arcs_cross(b0[:, None, :], b1[:, None, :],
                            a0[None, :, :], a1[None, :, :])
    for i, j in zip(*np.where(cr | crt.T)):
        p = _gc_intersection(a0[i], a1[i], b0[j], b1[j])
        if p is None:
            continue
        lab = float(sphere.angle(a0[i], a1[i]))
        lcd = float(sphere.angle(b0[j], b1[j]))
        if lab > 0:
            ev_a.setdefault(int(i), []).append(
                (float(sphere.angle(a0[i], p)) / lab, p))
        if lcd > 0:
            ev_b.setdefault(int(j), []).append(
                (float(sphere.angle(b0[j], p)) / lcd, p))


def _events(a0, a1, b_verts, b0, b1):
    """events[global_a_edge] = [(t, xyz)] from proper crossings with b edges
    and b vertices strictly interior to a edges (one-sided form, used by
    paths that only atomize side a)."""
    ev: dict = {}
    if len(a0) == 0:
        return ev
    if len(b0):
        cr = sphere.arcs_cross(a0[:, None, :], a1[:, None, :],
                               b0[None, :, :], b1[None, :, :])
        for i, j in zip(*np.where(cr)):
            p = _gc_intersection(a0[i], a1[i], b0[j], b1[j])
            if p is None:
                continue
            la = float(sphere.angle(a0[i], p))
            lab = float(sphere.angle(a0[i], a1[i]))
            if lab > 0:
                ev.setdefault(int(i), []).append((la / lab, p))
    _vertex_events(ev, a0, a1, b_verts)
    return ev


def _atomize(cycles, events, offs, nodes: _NodeIndex, closed,
             cycles_ll=None):
    """Split cycles/chains at vertices + events -> atomic directed sub-edges
    [(u_node, v_node)], zero-length (merged-node) edges dropped.  When
    cycles_ll (original lnglat rows) is given, vertex nodes remember their
    exact input coordinates."""
    subs = []
    for ci, verts in enumerate(cycles):
        n = len(verts)
        ne = n if closed else n - 1
        seq = []  # (xyz, lnglat-or-None)
        for li in range(ne):
            ll = cycles_ll[ci][li] if cycles_ll is not None else None
            seq.append((verts[li], ll))
            for t, p in sorted(events.get(offs[ci] + li, []),
                               key=lambda x: x[0]):
                seq.append((p, None))
        if not closed:
            ll = cycles_ll[ci][-1] if cycles_ll is not None else None
            seq.append((verts[-1], ll))
        ids = []
        for p, ll in seq:
            idx = nodes.key(p)
            if ll is not None:
                nodes.set_ll(idx, ll)
            ids.append(idx)
        m = len(ids)
        rng = range(m) if closed else range(m - 1)
        for k in rng:
            u, v = ids[k], ids[(k + 1) % m]
            if u != v:
                subs.append((u, v))
    return subs


# ---------------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------------

_OUT, _IN, _ON_PAR, _ON_ANTI = 0, 1, 2, 3


def _classify(subs, nodes: _NodeIndex, ob0, ob1, other_node_ids=None):
    """Class of each sub-edge against the other boundary.

    A sub-edge is `on` the other boundary only when (a) its midpoint AND
    quarter-points lie within EPS of it, and (b) both endpoints are nodes
    the other side's atomization also uses.  True shared runs always
    satisfy (b) — both sides split at the union of vertices along the run —
    while near-tangent *crossings* (e.g. two offset circles grazing) do
    not, so they classify by winding instead of producing mismatched
    shared spans that would unbalance the stitch."""
    if not subs:
        return np.zeros(0, dtype=np.int8)
    p0 = np.array([nodes.pos[u] for u, _ in subs])
    p1 = np.array([nodes.pos[v] for _, v in subs])
    mid = sphere.normalize(p0 + p1)
    res = np.zeros(len(subs), dtype=np.int8)
    if len(ob0) == 0:
        return res
    dmat = sphere.point_arc_distance(mid[:, None, :],
                                     ob0[None, :, :], ob1[None, :, :])
    jmin = dmat.argmin(axis=1)
    dmin = dmat[np.arange(len(subs)), jmin]
    on = dmin < EPS
    if on.any() and other_node_ids is not None:
        shared_ends = np.array([u in other_node_ids and v in other_node_ids
                                for (u, v) in subs])
        on &= shared_ends
    if on.any():  # quarter-point confirmation for the survivors
        q1 = sphere.normalize(p0[on] + mid[on])
        q3 = sphere.normalize(mid[on] + p1[on])
        dq = np.maximum(
            sphere.point_arc_distance(q1[:, None, :], ob0[None], ob1[None])
            .min(axis=1),
            sphere.point_arc_distance(q3[:, None, :], ob0[None], ob1[None])
            .min(axis=1))
        on[np.where(on)[0][dq >= EPS]] = False
    off = ~on
    if off.any():
        w = sphere.winding_number(mid[off], ob0, ob1)
        res[off] = (w > 0).astype(np.int8)
    for k in np.where(on)[0]:
        j = jmin[k]
        na = np.cross(p0[k], p1[k])
        nb = np.cross(ob0[j], ob1[j])
        res[k] = _ON_PAR if float(np.dot(na, nb)) > 0 else _ON_ANTI
    return res


# ---------------------------------------------------------------------------
# stitching
# ---------------------------------------------------------------------------

def _tangent(p_from, p_at):
    w = p_from - np.dot(p_from, p_at) * p_at
    n = np.linalg.norm(w)
    return w / n if n > 0 else w


def _max_ccw(nodes: _NodeIndex, u, v, cands):
    """At node v arriving from u, pick the most counterclockwise outgoing
    edge — pinched regions separate into simple rings."""
    pv = nodes.pos[v]
    d_in = -_tangent(nodes.pos[u], pv)
    best, best_ang = cands[0], -10.0
    for c in cands:
        o = _tangent(nodes.pos[c[1]], pv)
        ang = float(np.arctan2(np.dot(np.cross(d_in, o), pv),
                               np.dot(d_in, o)))
        if ang > np.pi - 1e-12:  # exact U-turn: least preferred
            ang = -np.pi
        if ang > best_ang:
            best, best_ang = c, ang
    return best


def _stitch_area(subs, nodes: _NodeIndex) -> List[np.ndarray]:
    """Directed kept edges -> closed lnglat rings.  Sibling pairs (u,v)+(v,u)
    cancel (zero-width slivers, the reference's SiblingPairs::DISCARD);
    duplicate directed edges collapse to one."""
    cnt = Counter(subs)
    edges, done = [], set()
    for (u, v) in list(cnt):
        if (u, v) in done:
            continue
        done.add((u, v))
        done.add((v, u))
        f, r = cnt[(u, v)], cnt.get((v, u), 0)
        if f > r:
            edges.append((u, v))
        elif r > f:
            edges.append((v, u))
    adj = defaultdict(list)
    for e in edges:
        adj[e[0]].append(e)
    used, rings = set(), []
    for e0 in edges:
        if e0 in used:
            continue
        start = e0[0]
        path = [e0]
        used.add(e0)
        while path[-1][1] != start and len(path) <= len(edges):
            u, v = path[-1]
            cands = [c for c in adj[v] if c not in used]
            if not cands:
                break
            nxt = cands[0] if len(cands) == 1 else _max_ccw(nodes, u, v, cands)
            used.add(nxt)
            path.append(nxt)
        if path[-1][1] == start and len(path) >= 3:
            pts = [nodes.lnglat(u) for (u, _) in path] + [nodes.lnglat(start)]
            rings.append(np.array(pts))
    return rings


def _stitch_chains(subs, nodes: _NodeIndex) -> List[np.ndarray]:
    """Directed line sub-edges -> maximal polylines (duplicates collapse,
    opposite directions count as the same geometric segment)."""
    seen, edges = set(), []
    for (u, v) in subs:
        if (u, v) in seen or (v, u) in seen:
            continue
        seen.add((u, v))
        edges.append((u, v))
    out_adj = defaultdict(list)
    indeg: Counter = Counter()
    for (u, v) in edges:
        out_adj[u].append((u, v))
        indeg[v] += 1

    used = set()

    def walk(e):
        path = [e]
        used.add(e)
        while True:
            v = path[-1][1]
            nxt = [c for c in out_adj[v] if c not in used]
            if len(nxt) != 1 or indeg[v] > 1:
                break
            path.append(nxt[0])
            used.add(nxt[0])
        return path

    chains = []
    for e in edges:  # chain starts first
        if e not in used and (indeg[e[0]] == 0 or len(out_adj[e[0]]) > 1
                              or indeg[e[0]] > 1):
            chains.append(walk(e))
    for e in edges:  # leftover cycles
        if e not in used:
            chains.append(walk(e))
    out = []
    for path in chains:
        pts = [nodes.lnglat(path[0][0])] + [nodes.lnglat(v) for (_, v) in path]
        out.append(np.array(pts))
    return out


# ---------------------------------------------------------------------------
# ring assembly (shells CCW / holes CW, nesting)
# ---------------------------------------------------------------------------

def _ring_xyz(ring_lnglat: np.ndarray) -> np.ndarray:
    """Closed lnglat ring -> open xyz vertex cycle (closing vertex dropped)."""
    return sphere.lnglat_to_xyz(np.asarray(ring_lnglat, dtype=np.float64)[:-1])


def _ring_edges(verts_xyz: np.ndarray):
    n = len(verts_xyz)
    return verts_xyz, verts_xyz[(np.arange(n) + 1) % n]


def _inside(p: np.ndarray, edges) -> bool:
    ra, rb = edges
    return bool(sphere.winding_number(np.asarray(p).reshape(1, 3), ra, rb)[0] > 0)


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


# ---------------------------------------------------------------------------
# polygon x polygon algebra
# ---------------------------------------------------------------------------

def _poly_cycles(polys):
    """(xyz open cycles, matching original lnglat rows) of every ring."""
    rs = [np.asarray(r, dtype=np.float64)
          for rings in polys for r in rings if len(r) >= 4]
    return [_ring_xyz(r) for r in rs], [r[:-1] for r in rs]


def _poly_poly(a_polys, b_polys, op: str):
    """Overlay of two polygon sets (ring lists: shell CCW + holes CW).

    Returns (polys, residue_lines, contact_xyz): residue lines and contact
    points are the closed-model measure-zero intersection parts (populated
    for op='intersection' only)."""
    nodes = _NodeIndex()
    a_cycles, a_ll = _poly_cycles(a_polys)
    b_cycles, b_ll = _poly_cycles(b_polys)
    a0, a1, a_offs = _chain_edges(a_cycles, closed=True)
    b0, b1, b_offs = _chain_edges(b_cycles, closed=True)
    a_verts = np.vstack(a_cycles) if a_cycles else np.zeros((0, 3))
    b_verts = np.vstack(b_cycles) if b_cycles else np.zeros((0, 3))

    ev_a: dict = {}
    ev_b: dict = {}
    _cross_events(ev_a, ev_b, a0, a1, b0, b1)
    _vertex_events(ev_a, a0, a1, b_verts)
    _vertex_events(ev_b, b0, b1, a_verts)
    subs_a = _atomize(a_cycles, ev_a, a_offs, nodes, closed=True,
                      cycles_ll=a_ll)
    subs_b = _atomize(b_cycles, ev_b, b_offs, nodes, closed=True,
                      cycles_ll=b_ll)
    nodes_a = {u for u, _ in subs_a} | {v for _, v in subs_a}
    nodes_b = {u for u, _ in subs_b} | {v for _, v in subs_b}
    cls_a = _classify(subs_a, nodes, b0, b1, nodes_b)
    cls_b = _classify(subs_b, nodes, a0, a1, nodes_a)

    area, res_subs = [], []
    if op == "intersection":
        area += [s for s, c in zip(subs_a, cls_a) if c in (_IN, _ON_PAR)]
        area += [s for s, c in zip(subs_b, cls_b) if c == _IN]
        res_subs = [s for s, c in zip(subs_a, cls_a) if c == _ON_ANTI]
    elif op == "union":
        area += [s for s, c in zip(subs_a, cls_a) if c in (_OUT, _ON_PAR)]
        area += [s for s, c in zip(subs_b, cls_b) if c == _OUT]
    elif op == "difference":
        area += [s for s, c in zip(subs_a, cls_a) if c in (_OUT, _ON_ANTI)]
        area += [(v, u) for (u, v), c in zip(subs_b, cls_b) if c == _IN]
    else:
        raise ValueError(op)

    rings = _stitch_area(area, nodes)
    polys = _assemble(rings).polys if rings else []
    res_lines = _stitch_chains(res_subs, nodes) if res_subs else []

    contacts: List[np.ndarray] = []  # lnglat rows
    if op == "intersection":
        for evs in ev_a.values():
            contacts.extend(sphere.xyz_to_lnglat(p) for _, p in evs)
        for evs in ev_b.values():
            contacts.extend(sphere.xyz_to_lnglat(p) for _, p in evs)
        if len(a_verts) and len(b_verts):  # vertex-vertex contacts
            d = sphere.angle(a_verts[:, None, :], b_verts[None, :, :])
            for i in np.where((d < EPS).any(axis=1))[0]:
                # via the node registry: exact original input coordinates
                contacts.append(nodes.lnglat(nodes.key(a_verts[i])))
    return polys, res_lines, contacts


# ---------------------------------------------------------------------------
# line x line 1D algebra
# ---------------------------------------------------------------------------

def _line_line(a_chains_ll, b_chains_ll, op: str):
    """1D overlay of two polyline sets (lnglat chains).  Returns
    (chains, contact_xyz); contacts populated for op='intersection'."""
    nodes = _NodeIndex()
    a_cycles = [sphere.lnglat_to_xyz(l) for l in a_chains_ll]
    b_cycles = [sphere.lnglat_to_xyz(l) for l in b_chains_ll]
    a0, a1, a_offs = _chain_edges(a_cycles, closed=False)
    b0, b1, b_offs = _chain_edges(b_cycles, closed=False)
    a_verts = np.vstack(a_cycles) if a_cycles else np.zeros((0, 3))
    b_verts = np.vstack(b_cycles) if b_cycles else np.zeros((0, 3))

    ev_a: dict = {}
    ev_b: dict = {}
    _cross_events(ev_a, ev_b, a0, a1, b0, b1)
    _vertex_events(ev_a, a0, a1, b_verts)
    _vertex_events(ev_b, b0, b1, a_verts)
    subs_a = _atomize(a_cycles, ev_a, a_offs, nodes, closed=False,
                      cycles_ll=a_chains_ll)
    subs_b = _atomize(b_cycles, ev_b, b_offs, nodes, closed=False,
                      cycles_ll=b_chains_ll)
    nodes_a = {u for u, _ in subs_a} | {v for _, v in subs_a}
    nodes_b = {u for u, _ in subs_b} | {v for _, v in subs_b}
    cls_a = _classify(subs_a, nodes, b0, b1, nodes_b)
    on_a = [s for s, c in zip(subs_a, cls_a) if c in (_ON_PAR, _ON_ANTI)]
    off_a = [s for s, c in zip(subs_a, cls_a) if c in (_OUT, _IN)]

    if op == "intersection":
        contacts: List[np.ndarray] = []  # lnglat rows
        for evs in ev_a.values():
            contacts.extend(sphere.xyz_to_lnglat(p) for _, p in evs)
        if len(a_verts) and len(b0):  # endpoints touching the other line
            d = sphere.point_arc_distance(a_verts[:, None, :],
                                          b0[None, :, :], b1[None, :, :])
            for i in np.where((d.min(axis=1) < EPS))[0]:
                contacts.append(nodes.lnglat(nodes.key(a_verts[i])))
        if len(b_verts) and len(a0):
            d = sphere.point_arc_distance(b_verts[:, None, :],
                                          a0[None, :, :], a1[None, :, :])
            for i in np.where((d.min(axis=1) < EPS))[0]:
                contacts.append(nodes.lnglat(nodes.key(b_verts[i])))
        return _stitch_chains(on_a, nodes), contacts
    if op == "union":
        cls_b = _classify(subs_b, nodes, a0, a1, nodes_a)
        keep = list(subs_a) + [s for s, c in zip(subs_b, cls_b)
                               if c in (_OUT, _IN)]
        return _stitch_chains(keep, nodes), []
    if op == "difference":
        return _stitch_chains(off_a, nodes), []
    raise ValueError(op)


# ---------------------------------------------------------------------------
# line / point helpers (closed model)
# ---------------------------------------------------------------------------

def _clip_line_to_polygon(line_lnglat: np.ndarray, poly: Geog,
                          keep_inside: bool):
    """Split a polyline at polygon-boundary crossings; keep inside (or
    outside) pieces (closed model).  Returns list of (m, 2) lnglat chains."""
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
        crossings = []
        cross_mask = sphere.arcs_cross(a, b, ra, rb)
        for j in np.where(cross_mask)[0]:
            p = _gc_intersection(a, b, ra[j], rb[j])
            if p is not None:
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
        out |= d <= EPS
    if len(other.points):
        gp = other.points_xyz()
        d = sphere.angle(xyz[:, None, :], gp[None, :, :]).min(axis=1)
        out |= d <= EPS
    return out


def _covered_by(p_xyz: np.ndarray, polys: List, lines: List[np.ndarray]) -> bool:
    """Closed coverage of one point by output polygons or lines."""
    if polys:
        g = Geog(polys=polys)
        ra, rb = g.ring_edges_xyz()
        if len(ra):
            if sphere.contains_points(p_xyz.reshape(1, 3), ra, rb,
                                      model="closed")[0]:
                return True
            d = sphere.point_arc_distance(p_xyz[None, :], ra, rb).min()
            if d < EPS:
                return True
    for l in lines:
        v = sphere.lnglat_to_xyz(l)
        d = sphere.point_arc_distance(p_xyz[None, None, :],
                                      v[None, :-1, :], v[None, 1:, :]).min()
        if d < EPS:
            return True
    return False


def _line_covered_by_polys(line_lnglat: np.ndarray, polys: List) -> bool:
    """True when every segment midpoint + vertex of the chain is inside or
    on the polygons (closed) — the NormalizeClosedSet suppression test."""
    if not polys:
        return False
    g = Geog(polys=polys)
    ra, rb = g.ring_edges_xyz()
    if len(ra) == 0:
        return False
    v = sphere.lnglat_to_xyz(line_lnglat)
    mids = sphere.normalize(v[:-1] + v[1:])
    probe = np.vstack([v, mids])
    inside = sphere.contains_points(probe, ra, rb, model="closed")
    if inside.all():
        return True
    d = sphere.point_arc_distance(probe[~inside][:, None, :],
                                  ra[None, :, :], rb[None, :, :]).min(axis=1)
    return bool((d < EPS).all())


# ---------------------------------------------------------------------------
# general mixed-dimension overlay
# ---------------------------------------------------------------------------

def overlay(gA: Geog, gB: Geog, op: str) -> Geog:
    """Full overlay of two geographies (any dimensions / collections).
    Callers handle null/empty/disjoint fast paths and type empty results
    (build.py, mirroring build.cc's Exec shortcuts)."""
    apolys = [rings for rings in gA.polys if rings]
    bpolys = [rings for rings in gB.polys if rings]
    alines = [np.asarray(l, dtype=np.float64) for l in gA.lines if len(l) >= 2]
    blines = [np.asarray(l, dtype=np.float64) for l in gB.lines if len(l) >= 2]

    out_polys: List = []
    out_lines: List[np.ndarray] = []
    pts_rows: List[np.ndarray] = []
    contact_xyz: List[np.ndarray] = []

    if op == "intersection":
        if apolys and bpolys:
            polys, rl, cp = _poly_poly(apolys, bpolys, "intersection")
            out_polys += polys
            out_lines += rl
            contact_xyz += cp
        if alines and bpolys:
            bp = Geog(polys=bpolys)
            out_lines += [c for l in alines
                          for c in _clip_line_to_polygon(l, bp, True)]
        if blines and apolys:
            ap = Geog(polys=apolys)
            out_lines += [c for l in blines
                          for c in _clip_line_to_polygon(l, ap, True)]
        if alines and blines:
            ll, cp = _line_line(alines, blines, "intersection")
            out_lines += ll
            contact_xyz += cp
        if len(gA.points):
            keep = _points_intersect_mask(gA.points, gB)
            pts_rows += [p[:2] for p in gA.points[keep]]
        if len(gB.points):
            keep = _points_intersect_mask(gB.points, gA)
            pts_rows += [p[:2] for p in gB.points[keep]]

    elif op == "union":
        if apolys and bpolys:
            out_polys, _, _ = _poly_poly(apolys, bpolys, "union")
        elif apolys:
            out_polys = [[r.copy() for r in rings] for rings in apolys]
        elif bpolys:
            out_polys = [[r.copy() for r in rings] for rings in bpolys]
        if alines and blines:
            out_lines, _ = _line_line(alines, blines, "union")
        else:
            out_lines = [l.copy() for l in alines + blines]
        # computed overlay output is XY (build.cc:1283-1286)
        pts_rows = [p[:2] for p in gA.points] + [p[:2] for p in gB.points]

    elif op == "difference":
        if apolys:
            if bpolys:
                out_polys, _, _ = _poly_poly(apolys, bpolys, "difference")
            else:
                out_polys = [[r.copy() for r in rings] for rings in apolys]
        cur_lines = [l.copy() for l in alines]
        if bpolys and cur_lines:
            bp = Geog(polys=bpolys)
            cur_lines = [c for l in cur_lines
                         for c in _clip_line_to_polygon(l, bp, False)]
        if blines and cur_lines:
            cur_lines, _ = _line_line(cur_lines, blines, "difference")
        out_lines = cur_lines
        if len(gA.points):
            keep = ~_points_intersect_mask(gA.points, gB)
            pts_rows = [p[:2] for p in gA.points[keep]]
    else:
        raise ValueError(f"unknown overlay op {op!r}")

    # closed-set normalization (build.cc:1247,1265 NormalizeClosedSet): emit
    # only the line portions NOT covered by output polygons — a partially
    # covered line is clipped at the boundary, not kept or dropped whole.
    # Boundary-collinear runs test inside under the closed model and are
    # suppressed, matching the reference's closed-polygon coverage.
    if out_polys and out_lines:
        _poly_cover = Geog(polys=out_polys)
        clipped: List[np.ndarray] = []
        for l in out_lines:
            if _line_covered_by_polys(l, out_polys):
                continue  # fully covered: skip the crossing scan
            clipped += [c for c in _clip_line_to_polygon(l, _poly_cover, False)
                        if len(c) >= 2]
        out_lines = clipped
    final_pts: List[np.ndarray] = []
    seen = _NodeIndex()
    n_nodes = 0
    for p in pts_rows:
        x = sphere.lnglat_to_xyz(np.asarray(p, dtype=np.float64))
        k = seen.key(x)
        if k < n_nodes:
            continue
        n_nodes = len(seen.pos)
        if not _covered_by(x, out_polys, out_lines):
            final_pts.append(np.asarray(p, dtype=np.float64))
    if op == "intersection":
        for ll in contact_xyz:
            x = sphere.lnglat_to_xyz(np.asarray(ll, dtype=np.float64))
            k = seen.key(x)
            if k < n_nodes:
                continue
            n_nodes = len(seen.pos)
            if not _covered_by(x, out_polys, out_lines):
                final_pts.append(np.asarray(ll, dtype=np.float64))

    return Geog(points=np.array(final_pts) if final_pts else None,
                lines=out_lines, polys=out_polys)
