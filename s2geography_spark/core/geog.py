"""Geography value model + WKB/WKT serialization (from scratch, no GEOS).

Mirrors the reference's data model (geography_interface.h:24-62): a geography
is zero or more shapes of dimension 0/1/2; coordinates are lon/lat degrees
externally with geodesic (spherical) edge semantics; WKB is the interchange
format (wkb.h:9-31, wkt-reader.h:9-20).

Ring normalization: WKB input is treated as non-oriented (the reference's
default, geoarrow.h:40-51): each ring is normalized so the first ring of a
polygon is CCW (shell, interior on the left) and subsequent rings are CW
(holes) — together these make the winding-number PIP in sphere.py correct.

Z/M coordinates are RETAINED (geoarrow-geography.h:64-67 parity): coordinate
arrays widen to (n, 2 + has_z + has_m) with column order (lng, lat, z?, m?),
tracked by ``Geog.zm``; WKT/WKB round-trip them and the interpolating ops
(line-interpolate, closest-point, shortest/longest line) propagate them —
see distance.cc:585-618.  Overlay/build outputs are XY (the reference's
overlays also emit XY only, build.cc:1283-1286).
"""

from __future__ import annotations

import re
import struct
from typing import List, Optional

import numpy as np

from . import sphere

# WKB geometry type codes (ISO)
_POINT = 1
_LINESTRING = 2
_POLYGON = 3
_MULTIPOINT = 4
_MULTILINESTRING = 5
_MULTIPOLYGON = 6
_COLLECTION = 7

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class Geog:
    """Decoded geography: point set + polylines + polygons (lists of rings).

    points: (n, w) lon/lat degrees (+ z, m columns when zm flags set)
    lines:  list of (m, w) arrays
    polys:  list of list-of-rings; ring = (m, w) closed (first == last);
            ring 0 normalized CCW (shell), others CW (holes).
    typ:    original WKB top-level type code (for typed EMPTY round-trips)
    zm:     (has_z, has_m) — coordinate width is 2 + has_z + has_m
    """

    __slots__ = ("points", "lines", "polys", "typ", "zm", "_xyz_cache")

    def __init__(self, points=None, lines=None, polys=None, typ=None,
                 zm=(False, False)):
        self.zm = (bool(zm[0]), bool(zm[1]))
        w = 2 + self.zm[0] + self.zm[1]

        def fit(a):
            """Match declared width: wider input (slices of ZM arrays fed
            to XY constructors — ops' outputs are XY per the reference)
            truncates; narrower is an error, never a silent reshape."""
            a = np.asarray(a, dtype=np.float64)
            if a.ndim == 2:
                if a.shape[1] < w:
                    raise ValueError(
                        f"coordinate width {a.shape[1]} < declared {w}")
                return a[:, :w] if a.shape[1] > w else a
            return a.reshape(-1, w)

        self.points = np.zeros((0, w)) if points is None else fit(points)
        self.lines = [fit(l) for l in (lines or [])]
        self.polys = [[fit(r) for r in rings] for rings in (polys or [])]
        self.typ = typ
        self._xyz_cache = {}

    def coord_width(self) -> int:
        return 2 + self.zm[0] + self.zm[1]

    # -- basic accessors (reference accessors.cc semantics) ---------------

    def is_empty(self) -> bool:
        return (len(self.points) == 0 and not any(len(l) for l in self.lines)
                and not any(len(r) for rings in self.polys for r in rings))

    def dimension(self) -> int:
        """Max shape dimension; -1 when empty (accessors.cc:58-72)."""
        d = -1
        if len(self.points):
            d = 0
        if any(len(l) >= 2 for l in self.lines):
            d = max(d, 1)
        if any(len(r) >= 4 for rings in self.polys for r in rings):
            d = 2
        return d

    def num_points(self) -> int:
        """Vertex count per accessors.cc:74-90: points + line vertices +
        polygon ring vertices (closing vertex not double counted)."""
        n = len(self.points)
        for l in self.lines:
            n += len(l)
        for rings in self.polys:
            for r in rings:
                n += max(len(r) - 1, 0)
        return n

    def is_collection(self) -> bool:
        """accessors.cc:24-55: >1 point / >1 chain / >1 outer shell."""
        d = self.dimension()
        if d == -1:
            return False
        if d == 0:
            return len(self.points) > 1
        if d == 1:
            return sum(1 for l in self.lines if len(l) >= 2) > 1
        return len([rings for rings in self.polys if rings]) > 1

    # -- xyz caches --------------------------------------------------------

    def points_xyz(self):
        if "pts" not in self._xyz_cache:
            self._xyz_cache["pts"] = sphere.lnglat_to_xyz(self.points)
        return self._xyz_cache["pts"]

    def line_edges_xyz(self):
        """(a, b) stacked edges of all polylines."""
        if "lines" not in self._xyz_cache:
            a, b = [], []
            for l in self.lines:
                if len(l) >= 2:
                    v = sphere.lnglat_to_xyz(l)
                    a.append(v[:-1])
                    b.append(v[1:])
            if a:
                self._xyz_cache["lines"] = (np.vstack(a), np.vstack(b))
            else:
                self._xyz_cache["lines"] = (np.zeros((0, 3)), np.zeros((0, 3)))
        return self._xyz_cache["lines"]

    def ring_edges_xyz(self):
        """(a, b) stacked directed edges of all polygon rings (normalized)."""
        if "rings" not in self._xyz_cache:
            a, b = [], []
            for rings in self.polys:
                for r in rings:
                    if len(r) >= 4:
                        v = sphere.lnglat_to_xyz(r)
                        a.append(v[:-1])
                        b.append(v[1:])
            if a:
                self._xyz_cache["rings"] = (np.vstack(a), np.vstack(b))
            else:
                self._xyz_cache["rings"] = (np.zeros((0, 3)), np.zeros((0, 3)))
        return self._xyz_cache["rings"]

    def all_edges_xyz(self):
        la, lb = self.line_edges_xyz()
        ra, rb = self.ring_edges_xyz()
        return np.vstack([la, ra]), np.vstack([lb, rb])

    def all_vertices_xyz(self):
        out = [self.points_xyz()] if len(self.points) else []
        for l in self.lines:
            if len(l):
                out.append(sphere.lnglat_to_xyz(l))
        for rings in self.polys:
            for r in rings:
                if len(r) > 1:
                    out.append(sphere.lnglat_to_xyz(r[:-1]))
        return np.vstack(out) if out else np.zeros((0, 3))

    def num_edges(self) -> int:
        la, _ = self.line_edges_xyz()
        ra, _ = self.ring_edges_xyz()
        return len(la) + len(ra)


def _widen_coords(arr: np.ndarray, src_zm, dst_zm) -> np.ndarray:
    """Re-layout (n, 2+k) coordinates from src (z?, m?) to dst flags,
    padding missing columns with NaN (mixed-dimension collection inputs)."""
    if src_zm == dst_zm:
        return arr
    arr = np.asarray(arr, dtype=np.float64)
    n = len(arr)
    cols = [arr[:, 0], arr[:, 1]]
    zi = 2
    if dst_zm[0]:
        cols.append(arr[:, zi] if src_zm[0] else np.full(n, np.nan))
    if src_zm[0]:
        zi += 1
    if dst_zm[1]:
        cols.append(arr[:, zi] if src_zm[1] else np.full(n, np.nan))
    return np.stack(cols, axis=-1) if n else np.zeros((0, 2 + dst_zm[0] + dst_zm[1]))


def _upgrade_zm(g: Geog, has_z: bool, has_m: bool):
    """Ensure g's coordinate width accommodates (has_z, has_m); widens the
    already-parsed arrays when a collection mixes dimensions."""
    new = (g.zm[0] or has_z, g.zm[1] or has_m)
    if new == g.zm:
        return
    old = g.zm
    g.points = _widen_coords(g.points, old, new)
    g.lines = [_widen_coords(l, old, new) for l in g.lines]
    g.polys = [[_widen_coords(r, old, new) for r in rings] for rings in g.polys]
    g.zm = new


# ---------------------------------------------------------------------------
# ring orientation normalization
# ---------------------------------------------------------------------------

def _ring_contains_ring(container: np.ndarray, inner: np.ndarray) -> bool:
    """Ring-contains-ring by a representative inner vertex clearly off the
    container's boundary (rings of a valid polygon never cross, so one
    interior vertex decides; shared-boundary vertices are skipped)."""
    cv = sphere.lnglat_to_xyz(np.asarray(container, dtype=np.float64)[:, :2])
    ca, cb = cv[:-1], cv[1:]
    iv = sphere.lnglat_to_xyz(np.asarray(inner, dtype=np.float64)[:-1, :2])
    d = sphere.point_arc_distance(iv[:, None, :], ca[None, :, :],
                                  cb[None, :, :]).min(axis=1)
    off = np.where(d > 1e-11)[0]
    if len(off) == 0:
        return False  # every vertex on the boundary (identical rings)
    w = sphere.winding_number(iv[off[:1]], ca, cb)
    return bool(abs(int(w[0])) > 0)


def _normalize_rings(rings: List[np.ndarray]) -> List[np.ndarray]:
    """Orient rings by NESTING-DEPTH parity (S2Polygon InitNested
    semantics): depth-even rings CCW (area-adding), depth-odd CW (holes).
    For the common SF shapes this is first=CCW rest=CW, but multi-depth
    nesting (island inside a hole — valid in the reference's model) keeps
    correct winding so PIP and signed area stay exact."""
    rs = [np.asarray(r, dtype=np.float64) for r in rings]
    real = [k for k, r in enumerate(rs) if len(r) >= 4]
    depths = {k: 0 for k in real}
    if len(real) > 1:
        for i in real:
            for j in real:
                if i != j and _ring_contains_ring(rs[j], rs[i]):
                    depths[i] += 1
    out = []
    for k, r in enumerate(rs):
        if len(r) >= 4:
            area = sphere.ring_signed_area(sphere.lnglat_to_xyz(r[:, :2]))
            want_ccw = (depths.get(k, 0) % 2 == 0)
            if (area < 0) == want_ccw:
                r = r[::-1].copy()
        out.append(r)
    return out


# ---------------------------------------------------------------------------
# WKB reader
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = memoryview(buf)
        self.pos = 0

    def _hdr(self):
        bo = self.buf[self.pos]
        self.pos += 1
        fmt = "<" if bo == 1 else ">"
        (raw,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
        self.pos += 4
        has_z = bool(raw & _EWKB_Z)
        has_m = bool(raw & _EWKB_M)
        has_srid = bool(raw & _EWKB_SRID)
        code = raw & 0x0FFFFFFF
        if code >= 3000:
            has_z = has_m = True
            code -= 3000
        elif code >= 2000:
            has_m = True
            code -= 2000
        elif code >= 1000:
            has_z = True
            code -= 1000
        if has_srid:
            (srid,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            # the engine (like the reference, geoarrow.h:40-51) interprets
            # all coordinates as WGS84 lon/lat; accepting a foreign-SRID
            # EWKB would silently reinterpret projected coordinates as
            # degrees, so anything but 4326/0 is rejected loudly
            if srid not in (0, 4326):
                raise ValueError(
                    f"EWKB SRID {srid} is not supported: geographies are "
                    f"WGS84 lon/lat (SRID 4326); reproject before ingest")
        return fmt, code, has_z, has_m

    def _coords(self, fmt, n, has_z, has_m):
        dim = 2 + has_z + has_m
        arr = np.frombuffer(self.buf, dtype=fmt + "f8",
                            count=n * dim, offset=self.pos)
        self.pos += 8 * n * dim
        return arr.reshape(n, dim).astype(np.float64)

    def read(self, g: Geog, top=False, oriented=False, check=False):
        fmt, code, has_z, has_m = self._hdr()
        if top:
            g.typ = code
        _upgrade_zm(g, has_z, has_m)
        if code == _POINT:
            c = _widen_coords(self._coords(fmt, 1, has_z, has_m),
                              (has_z, has_m), g.zm)
            if not np.isnan(c[:, :2]).any():  # POINT EMPTY = NaN coords
                g.points = np.vstack([g.points, c])
        elif code == _LINESTRING:
            (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            if n:
                if check and n < 2:
                    raise ValueError(
                        "invalid linestring (check=True): needs >= 2 points")
                g.lines.append(_widen_coords(
                    self._coords(fmt, n, has_z, has_m), (has_z, has_m), g.zm))
        elif code == _POLYGON:
            (nr,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            rings = []
            for _ in range(nr):
                (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
                self.pos += 4
                rings.append(_widen_coords(
                    self._coords(fmt, n, has_z, has_m), (has_z, has_m), g.zm))
            if rings:
                if check:
                    for r in rings:
                        if len(r) < 4 or (r[0, :2] != r[-1, :2]).any():
                            raise ValueError(
                                "invalid polygon ring (check=True): must be "
                                "closed with >= 4 points")
                g.polys.append(rings if oriented else _normalize_rings(rings))
        elif code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
            (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            for _ in range(n):
                self.read(g, oriented=oriented, check=check)
        else:
            raise ValueError(f"unsupported WKB geometry type {code}")


# Oriented-WKB transport frame: plain WKB destroys intentional CW shells
# ('everything else' complement polygons) because the default decode
# renormalizes winding.  A geography holding an inverted polygon is
# therefore written as (kind=9, flags=FLAG_ORIENTED, 0, 0) + WKB — byte 9
# can never begin valid WKB (the byte-order mark is 0x00/0x01), so readers
# sniff the frame unambiguously and decode the body with oriented=True.
# Mirrors the reference carrying import options end-to-end through its
# tagged encoding (geoarrow.h:40-51, geography_interface.h:118-201).
ORIENTED_FRAME_KIND = 9
FLAG_ORIENTED = 2
_ORIENTED_FRAME = bytes([ORIENTED_FRAME_KIND, FLAG_ORIENTED, 0, 0])


def has_inverted_poly(g: Geog) -> bool:
    """True when any polygon's net signed ring area is negative — the
    oriented-import complement form that plain WKB cannot round-trip.

    Memoized on the instance (round-4 ADVICE: recomputing signed areas
    with fresh lnglat_to_xyz on every polygonal to_wkb call is a per-row
    cost on hot write paths; Geog ring data is immutable by convention
    after construction/decode)."""
    cached = g._xyz_cache.get("inverted")
    if cached is not None:
        return cached
    inv = False
    for rings in g.polys:
        tot = 0.0
        for r in rings:
            if len(r) >= 4:
                tot += sphere.ring_signed_area(sphere.lnglat_to_xyz(r[:, :2]))
        if tot < 0:
            inv = True
            break
    g._xyz_cache["inverted"] = inv
    return inv


def from_wkb(buf: Optional[bytes], oriented: bool = False,
             check: bool = False, planar: bool = False,
             tessellate_tolerance_m: float = 100.0) -> Optional[Geog]:
    """Decode WKB with the reference reader's import options
    (geoarrow.h:40-76):

    oriented: take ring winding as given (a CW shell means 'everything
      else'; the winding-number kernels consume signed windings natively)
      instead of normalizing first=CCW shell / rest=CW holes.
    check: raise on invalid structure (unclosed or short rings, short
      lines) instead of silently normalizing/ignoring.
    planar: input edges are straight lines in lng/lat space — each edge is
      tessellated (plate-carree densification) so the spherical geodesic
      chain stays within tessellate_tolerance_m of the planar segment.

    An oriented transport frame (see ORIENTED_FRAME_KIND) is unwrapped
    transparently: the body decodes with oriented=True regardless of the
    caller's flag, so complement polygons survive every inter-kernel hop.
    """
    if buf is None:
        return None
    buf = bytes(buf)
    if len(buf) >= 5 and buf[:4] == _ORIENTED_FRAME:
        buf = buf[4:]
        oriented = True
    g = Geog()
    _Reader(buf).read(g, top=True, oriented=oriented, check=check)
    if planar:
        g = tessellate_planar(g, tessellate_tolerance_m)
    return g


def tessellate_planar(g: Geog, tolerance_m: float = 100.0) -> Geog:
    """Reinterpret planar (straight-in-lnglat) edges as spherical: bisect
    each edge in lng/lat space until the geodesic midpoint is within the
    tolerance of the planar midpoint (the plate-carree projection import
    path, geoarrow.h:59-76 + projections.h:12-16)."""
    tol_rad = max(tolerance_m, 0.001) / sphere.EARTH_RADIUS_METERS

    def tess_chain(chain: np.ndarray) -> np.ndarray:
        out = [chain[0]]
        for i in range(len(chain) - 1):
            _subdivide(chain[i], chain[i + 1], out, depth=0)
        return np.array(out)

    def _subdivide(p0, p1, out, depth):
        mid = (np.asarray(p0) + np.asarray(p1)) / 2.0
        a = sphere.lnglat_to_xyz(np.asarray(p0)[:2])
        b = sphere.lnglat_to_xyz(np.asarray(p1)[:2])
        gm = sphere.arc_interpolate(a, b, 0.5)
        pm = sphere.lnglat_to_xyz(mid[:2])
        if depth >= 16 or float(sphere.angle(gm, pm)) <= tol_rad:
            out.append(np.asarray(p1))
            return
        _subdivide(p0, mid, out, depth + 1)
        _subdivide(mid, p1, out, depth + 1)

    return Geog(points=g.points.copy() if len(g.points) else None,
                lines=[tess_chain(l) for l in g.lines if len(l) >= 2],
                polys=[[tess_chain(r) for r in rings] for rings in g.polys],
                typ=g.typ, zm=g.zm)


# ---------------------------------------------------------------------------
# WKB writer (always little-endian ISO; Z/M via +1000/+2000 type offsets)
# ---------------------------------------------------------------------------

def _zm_code(base: int, zm) -> int:
    return base + (1000 if zm[0] else 0) + (2000 if zm[1] else 0)


def _w_point(c, zm=(False, False)) -> bytes:
    head = struct.pack("<bI", 1, _zm_code(_POINT, zm))
    return head + np.asarray(c, dtype="<f8").tobytes()


def _w_point_empty(zm=(False, False)) -> bytes:
    w = 2 + zm[0] + zm[1]
    return struct.pack("<bI", 1, _zm_code(_POINT, zm)) + \
        np.full(w, np.nan, dtype="<f8").tobytes()


def _w_line(l, zm=(False, False)) -> bytes:
    head = struct.pack("<bII", 1, _zm_code(_LINESTRING, zm), len(l))
    return head + np.asarray(l, dtype="<f8").tobytes()


def _w_poly(rings, zm=(False, False)) -> bytes:
    head = struct.pack("<bII", 1, _zm_code(_POLYGON, zm), len(rings))
    body = b""
    for r in rings:
        body += struct.pack("<I", len(r)) + np.asarray(r, dtype="<f8").tobytes()
    return head + body


def to_wkb(g: Optional[Geog]) -> Optional[bytes]:
    """Write SF-typed WKB choosing the narrowest type (build.cc:631-671
    heuristic: single part -> simple type; same-dim multi -> MULTI*;
    mixed -> GEOMETRYCOLLECTION).  Z/M columns round-trip via ISO type
    offsets.

    A geography holding an inverted (complement) polygon is prefixed with
    the 4-byte oriented frame so the winding survives re-decode; every
    other geography writes plain WKB byte-identically to before."""
    if g is None:
        return None
    if g.polys and has_inverted_poly(g):
        return _ORIENTED_FRAME + _to_wkb_body(g)
    return _to_wkb_body(g)


def to_wkb_standard(g: Optional[Geog]) -> Optional[bytes]:
    """Standards-compliant WKB egress (round-4 ADVICE): NEVER emits the
    engine's 4-byte oriented frame, so any external consumer (PostGIS,
    DuckDB spatial, GeoParquet readers) can parse every output byte
    stream.  For complement (inverted) polygons the rings are written
    verbatim — their winding carries the orientation, which a consumer
    doing oriented import recovers and a planar consumer reads as the
    ring footprint (plain WKB has no spherical-complement notion to
    preserve).  For every other geography the bytes are identical to
    to_wkb."""
    if g is None:
        return None
    return _to_wkb_body(g)


def _to_wkb_body(g: Geog) -> bytes:
    zm = g.zm
    parts = []
    for c in np.atleast_2d(g.points) if len(g.points) else []:
        parts.append(("pt", c))
    for l in g.lines:
        if len(l):
            parts.append(("ln", l))
    for rings in g.polys:
        if rings:
            parts.append(("pg", rings))

    if not parts:
        t = g.typ or _COLLECTION
        if t == _POINT:
            return _w_point_empty(zm)
        return struct.pack("<bII", 1, _zm_code(t, zm), 0)

    kinds = {k for k, _ in parts}
    if len(parts) == 1:
        k, v = parts[0]
        if k == "pt":
            return _w_point(v, zm)
        if k == "ln":
            return _w_line(v, zm)
        return _w_poly(v, zm)
    if kinds == {"pt"}:
        body = b"".join(_w_point(v, zm) for _, v in parts)
        return struct.pack("<bII", 1, _zm_code(_MULTIPOINT, zm), len(parts)) + body
    if kinds == {"ln"}:
        body = b"".join(_w_line(v, zm) for _, v in parts)
        return struct.pack("<bII", 1, _zm_code(_MULTILINESTRING, zm),
                           len(parts)) + body
    if kinds == {"pg"}:
        body = b"".join(_w_poly(v, zm) for _, v in parts)
        return struct.pack("<bII", 1, _zm_code(_MULTIPOLYGON, zm),
                           len(parts)) + body
    body = b""
    for k, v in parts:
        body += _w_point(v, zm) if k == "pt" else \
            _w_line(v, zm) if k == "ln" else _w_poly(v, zm)
    return struct.pack("<bII", 1, _zm_code(_COLLECTION, zm), len(parts)) + body


def point_wkb(lng: float, lat: float) -> bytes:
    """Fast path: single-point WKB (21 bytes, little-endian)."""
    return struct.pack("<bI2d", 1, _POINT, lng, lat)


# ---------------------------------------------------------------------------
# WKT reader / writer (wkt-reader.h:9-20, wkt-writer.h:11-21)
# ---------------------------------------------------------------------------

_WKT_TYPES = {
    "POINT": _POINT, "LINESTRING": _LINESTRING, "POLYGON": _POLYGON,
    "MULTIPOINT": _MULTIPOINT, "MULTILINESTRING": _MULTILINESTRING,
    "MULTIPOLYGON": _MULTIPOLYGON, "GEOMETRYCOLLECTION": _COLLECTION,
}
_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


class _WktParser:
    def __init__(self, text: str):
        self.toks = _TOKEN.findall(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"WKT parse error: expected {t} got {got}")

    def _dims(self):
        t = self.peek()
        if t and t.upper() in ("Z", "M", "ZM"):
            self.next()
            u = t.upper()
            return ("Z" in u, "M" in u)
        return (False, False)

    def coords(self, zm):
        out = [float(self.next()), float(self.next())]
        for _ in range(zm[0] + zm[1]):
            t = self.peek()
            if t in (",", ")"):
                break
            out.append(float(self.next()))
        while len(out) < 2 + zm[0] + zm[1]:
            out.append(float("nan"))
        return out

    def coord_seq(self, zm):
        self.expect("(")
        pts = [self.coords(zm)]
        while self.peek() == ",":
            self.next()
            pts.append(self.coords(zm))
        self.expect(")")
        return np.array(pts, dtype=np.float64)

    def parse(self, g: Geog, top=False):
        typ = self.next()
        if typ is None:
            raise ValueError("empty WKT")
        code = _WKT_TYPES.get(typ.upper())
        if code is None:
            raise ValueError(f"unknown WKT type {typ}")
        if top:
            g.typ = code
        zm = self._dims()
        _upgrade_zm(g, *zm)

        def widen(a):
            return _widen_coords(np.atleast_2d(np.asarray(a, dtype=np.float64)),
                                 zm, g.zm)

        if self.peek() and self.peek().upper() == "EMPTY":
            self.next()
            return
        if code == _POINT:
            self.expect("(")
            c = self.coords(zm)
            self.expect(")")
            g.points = np.vstack([g.points, widen([c])])
        elif code == _LINESTRING:
            g.lines.append(widen(self.coord_seq(zm)))
        elif code == _POLYGON:
            self.expect("(")
            rings = [self.coord_seq(zm)]
            while self.peek() == ",":
                self.next()
                rings.append(self.coord_seq(zm))
            self.expect(")")
            g.polys.append(_normalize_rings([widen(r) for r in rings]))
        elif code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON):
            self.expect("(")
            while True:
                if code == _MULTIPOINT and self.peek() != "(":
                    # MULTIPOINT (0 0, 1 1) bare form
                    g.points = np.vstack([g.points, widen([self.coords(zm)])])
                elif code == _MULTIPOINT:
                    self.expect("(")
                    g.points = np.vstack([g.points, widen([self.coords(zm)])])
                    self.expect(")")
                elif code == _MULTILINESTRING:
                    g.lines.append(widen(self.coord_seq(zm)))
                else:
                    self.expect("(")
                    rings = [self.coord_seq(zm)]
                    while self.peek() == ",":
                        self.next()
                        rings.append(self.coord_seq(zm))
                    self.expect(")")
                    g.polys.append(_normalize_rings([widen(r) for r in rings]))
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")
        else:  # GEOMETRYCOLLECTION
            self.expect("(")
            while True:
                self.parse(g)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")


def from_wkt(text: Optional[str]) -> Optional[Geog]:
    if text is None:
        return None
    g = Geog()
    _WktParser(text).parse(g, top=True)
    return g


def _fmt(x: float, precision: int) -> str:
    """Fixed decimals, trailing zeros trimmed (the reference WKTWriter's
    precision semantics: writer(6) prints 3.333333, wkt-writer_test.cc:8-20).
    At the default 16 the shortest round-trip repr wins when it is shorter
    (the engine stores lnglat exactly, so inputs echo back verbatim)."""
    s = f"{x:.{precision}f}".rstrip("0").rstrip(".")
    if precision >= 16:
        r = repr(float(x))
        if len(r) <= len(s) and "e" not in r and "E" not in r:
            s = r.rstrip("0").rstrip(".") if "." in r else r
    return "0" if s in ("", "-0") else s


def _fmt_seq(arr, precision):
    return ", ".join(" ".join(_fmt(x, precision) for x in c) for c in arr)


def _zm_suffix(zm) -> str:
    if zm[0] and zm[1]:
        return " ZM"
    if zm[0]:
        return " Z"
    if zm[1]:
        return " M"
    return ""


def to_wkt(g: Optional[Geog], precision: int = 16) -> Optional[str]:
    """WKT writer (default 16 significant digits, wkt-writer.h:11-21);
    Z/M columns emit the 'TYPE Z|M|ZM (...)' form."""
    if g is None:
        return None
    sfx = _zm_suffix(g.zm)
    parts = []
    for c in (np.atleast_2d(g.points) if len(g.points) else []):
        parts.append(("pt", c))
    for l in g.lines:
        if len(l):
            parts.append(("ln", l))
    for rings in g.polys:
        if rings:
            parts.append(("pg", rings))
    if not parts:
        name = {v: k for k, v in _WKT_TYPES.items()}.get(g.typ or _COLLECTION,
                                                         "GEOMETRYCOLLECTION")
        return f"{name}{sfx} EMPTY"

    def one(kind, v):
        if kind == "pt":
            return f"POINT{sfx} ({' '.join(_fmt(x, precision) for x in v)})"
        if kind == "ln":
            return f"LINESTRING{sfx} ({_fmt_seq(v, precision)})"
        rs = ", ".join(f"({_fmt_seq(r, precision)})" for r in v)
        return f"POLYGON{sfx} ({rs})"

    kinds = {k for k, _ in parts}
    if len(parts) == 1:
        return one(*parts[0])
    if kinds == {"pt"}:
        inner = ", ".join(
            "(" + " ".join(_fmt(x, precision) for x in v) + ")"
            for _, v in parts)
        return f"MULTIPOINT{sfx} ({inner})"
    if kinds == {"ln"}:
        inner = ", ".join(f"({_fmt_seq(v, precision)})" for _, v in parts)
        return f"MULTILINESTRING{sfx} ({inner})"
    if kinds == {"pg"}:
        inner = ", ".join(
            "(" + ", ".join(f"({_fmt_seq(r, precision)})" for r in v) + ")"
            for _, v in parts)
        return f"MULTIPOLYGON{sfx} ({inner})"
    inner = ", ".join(one(k, v) for k, v in parts)
    return f"GEOMETRYCOLLECTION{sfx} ({inner})"
