"""Geography value model + WKB/WKT serialization (from scratch, no GEOS).

Mirrors the reference's data model (geography_interface.h:24-62): a geography
is zero or more shapes of dimension 0/1/2; coordinates are lon/lat degrees
externally with geodesic (spherical) edge semantics; WKB is the interchange
format (wkb.h:9-31, wkt-reader.h:9-20).

Ring normalization: WKB input is treated as non-oriented (the reference's
default, geoarrow.h:40-51): each ring is normalized so the first ring of a
polygon is CCW (shell, interior on the left) and subsequent rings are CW
(holes) — together these make the winding-number PIP in sphere.py correct.

Z/M coordinates are parsed and dropped (engine scoped to XY; SURVEY.md §2.4
"Edge/ZM tracking ... optional").
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

    points: (n, 2) lon/lat degrees
    lines:  list of (m, 2) arrays
    polys:  list of list-of-rings; ring = (m, 2) closed (first == last);
            ring 0 normalized CCW (shell), others CW (holes).
    typ:    original WKB top-level type code (for typed EMPTY round-trips)
    """

    __slots__ = ("points", "lines", "polys", "typ", "_xyz_cache")

    def __init__(self, points=None, lines=None, polys=None, typ=None):
        self.points = (np.zeros((0, 2)) if points is None
                       else np.asarray(points, dtype=np.float64).reshape(-1, 2))
        self.lines = [np.asarray(l, dtype=np.float64) for l in (lines or [])]
        self.polys = [[np.asarray(r, dtype=np.float64) for r in rings]
                      for rings in (polys or [])]
        self.typ = typ
        self._xyz_cache = {}

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


# ---------------------------------------------------------------------------
# ring orientation normalization
# ---------------------------------------------------------------------------

def _normalize_rings(rings: List[np.ndarray]) -> List[np.ndarray]:
    out = []
    for k, r in enumerate(rings):
        r = np.asarray(r, dtype=np.float64)
        if len(r) >= 4:
            area = sphere.ring_signed_area(sphere.lnglat_to_xyz(r))
            want_ccw = (k == 0)
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
            self.pos += 4
        return fmt, code, has_z, has_m

    def _coords(self, fmt, n, has_z, has_m):
        dim = 2 + has_z + has_m
        arr = np.frombuffer(self.buf, dtype=fmt + "f8",
                            count=n * dim, offset=self.pos)
        self.pos += 8 * n * dim
        return arr.reshape(n, dim)[:, :2].astype(np.float64)

    def read(self, g: Geog, top=False):
        fmt, code, has_z, has_m = self._hdr()
        if top:
            g.typ = code
        if code == _POINT:
            c = self._coords(fmt, 1, has_z, has_m)
            if not np.isnan(c).any():  # POINT EMPTY = NaN coords
                g.points = np.vstack([g.points, c])
        elif code == _LINESTRING:
            (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            if n:
                g.lines.append(self._coords(fmt, n, has_z, has_m))
        elif code == _POLYGON:
            (nr,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            rings = []
            for _ in range(nr):
                (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
                self.pos += 4
                rings.append(self._coords(fmt, n, has_z, has_m))
            if rings:
                g.polys.append(_normalize_rings(rings))
        elif code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
            (n,) = struct.unpack_from(fmt + "I", self.buf, self.pos)
            self.pos += 4
            for _ in range(n):
                self.read(g)
        else:
            raise ValueError(f"unsupported WKB geometry type {code}")


def from_wkb(buf: Optional[bytes]) -> Optional[Geog]:
    if buf is None:
        return None
    g = Geog()
    _Reader(bytes(buf)).read(g, top=True)
    return g


# ---------------------------------------------------------------------------
# WKB writer (always little-endian ISO, XY only)
# ---------------------------------------------------------------------------

def _w_point(c) -> bytes:
    return struct.pack("<bI2d", 1, _POINT, float(c[0]), float(c[1]))


def _w_point_empty() -> bytes:
    return struct.pack("<bI2d", 1, _POINT, float("nan"), float("nan"))


def _w_line(l) -> bytes:
    head = struct.pack("<bII", 1, _LINESTRING, len(l))
    return head + np.asarray(l, dtype="<f8").tobytes()


def _w_poly(rings) -> bytes:
    head = struct.pack("<bII", 1, _POLYGON, len(rings))
    body = b""
    for r in rings:
        body += struct.pack("<I", len(r)) + np.asarray(r, dtype="<f8").tobytes()
    return head + body


def to_wkb(g: Optional[Geog]) -> Optional[bytes]:
    """Write SF-typed WKB choosing the narrowest type (build.cc:631-671
    heuristic: single part -> simple type; same-dim multi -> MULTI*;
    mixed -> GEOMETRYCOLLECTION)."""
    if g is None:
        return None
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
            return _w_point_empty()
        if t in (_LINESTRING, _POLYGON):
            return struct.pack("<bII", 1, t, 0)
        return struct.pack("<bII", 1, t, 0)

    kinds = {k for k, _ in parts}
    if len(parts) == 1:
        k, v = parts[0]
        if k == "pt":
            return _w_point(v)
        if k == "ln":
            return _w_line(v)
        return _w_poly(v)
    if kinds == {"pt"}:
        body = b"".join(_w_point(v) for _, v in parts)
        return struct.pack("<bII", 1, _MULTIPOINT, len(parts)) + body
    if kinds == {"ln"}:
        body = b"".join(_w_line(v) for _, v in parts)
        return struct.pack("<bII", 1, _MULTILINESTRING, len(parts)) + body
    if kinds == {"pg"}:
        body = b"".join(_w_poly(v) for _, v in parts)
        return struct.pack("<bII", 1, _MULTIPOLYGON, len(parts)) + body
    body = b""
    for k, v in parts:
        body += _w_point(v) if k == "pt" else _w_line(v) if k == "ln" else _w_poly(v)
    return struct.pack("<bII", 1, _COLLECTION, len(parts)) + body


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
        nz = 0
        if t and t.upper() in ("Z", "M", "ZM"):
            self.next()
            nz = len(t)
        return nz

    def coords(self, extra):
        out = [float(self.next()), float(self.next())]
        for _ in range(extra):
            t = self.peek()
            if t in (",", ")"):
                break
            self.next()
        return out

    def coord_seq(self, extra):
        self.expect("(")
        pts = [self.coords(extra)]
        while self.peek() == ",":
            self.next()
            pts.append(self.coords(extra))
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
        extra = self._dims()
        if self.peek() and self.peek().upper() == "EMPTY":
            self.next()
            return
        if code == _POINT:
            self.expect("(")
            c = self.coords(extra)
            self.expect(")")
            g.points = np.vstack([g.points, [c]])
        elif code == _LINESTRING:
            g.lines.append(self.coord_seq(extra))
        elif code == _POLYGON:
            self.expect("(")
            rings = [self.coord_seq(extra)]
            while self.peek() == ",":
                self.next()
                rings.append(self.coord_seq(extra))
            self.expect(")")
            g.polys.append(_normalize_rings(rings))
        elif code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON):
            self.expect("(")
            while True:
                if code == _MULTIPOINT and self.peek() != "(":
                    # MULTIPOINT (0 0, 1 1) bare form
                    g.points = np.vstack([g.points, [self.coords(extra)]])
                elif code == _MULTIPOINT:
                    self.expect("(")
                    g.points = np.vstack([g.points, [self.coords(extra)]])
                    self.expect(")")
                elif code == _MULTILINESTRING:
                    g.lines.append(self.coord_seq(extra))
                else:
                    self.expect("(")
                    rings = [self.coord_seq(extra)]
                    while self.peek() == ",":
                        self.next()
                        rings.append(self.coord_seq(extra))
                    self.expect(")")
                    g.polys.append(_normalize_rings(rings))
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
    s = f"{x:.{precision}g}"
    return s


def _fmt_seq(arr, precision):
    return ", ".join(f"{_fmt(c[0], precision)} {_fmt(c[1], precision)}" for c in arr)


def to_wkt(g: Optional[Geog], precision: int = 16) -> Optional[str]:
    """WKT writer (default 16 significant digits, wkt-writer.h:11-21)."""
    if g is None:
        return None
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
        return f"{name} EMPTY"

    def one(kind, v):
        if kind == "pt":
            return f"POINT ({_fmt(v[0], precision)} {_fmt(v[1], precision)})"
        if kind == "ln":
            return f"LINESTRING ({_fmt_seq(v, precision)})"
        rs = ", ".join(f"({_fmt_seq(r, precision)})" for r in v)
        return f"POLYGON ({rs})"

    kinds = {k for k, _ in parts}
    if len(parts) == 1:
        return one(*parts[0])
    if kinds == {"pt"}:
        inner = ", ".join(f"({_fmt(v[0], precision)} {_fmt(v[1], precision)})"
                          for _, v in parts)
        return f"MULTIPOINT ({inner})"
    if kinds == {"ln"}:
        inner = ", ".join(f"({_fmt_seq(v, precision)})" for _, v in parts)
        return f"MULTILINESTRING ({inner})"
    if kinds == {"pg"}:
        inner = ", ".join(
            "(" + ", ".join(f"({_fmt_seq(r, precision)})" for r in v) + ")"
            for _, v in parts)
        return f"MULTIPOLYGON ({inner})"
    inner = ", ".join(one(k, v) for k, v in parts)
    return f"GEOMETRYCOLLECTION ({inner})"
