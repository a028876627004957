"""Tagged binary encoding — the engine-internal storage format
(EncodeTagged/DecodeTagged, geography_interface.h:118-201,
geography.cc:199-260 parity).

Layout: a 4-byte inspectable prefix ``(kind u8, flags u8, covering_size u8,
reserved u8=0)`` followed by ``covering_size`` little-endian uint64 cell ids
(the normalized GetCellUnionBound when include_covering is set — readers can
check possible intersection without decoding the body), then the body.

Body encoding is engine-native WKB (the reference delegates to S2's internal
shape codecs; the contract reproduced here is the tag/covering/flags frame
and the CELL_CENTER compact form, not S2's byte stream).  CELL_CENTER
(kind 7): a single point exactly on a level >= 23 cell center stores ONLY
its cell id — the covering IS the representation (geography.cc:199-231),
12 bytes total.
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from . import cellid as C
from .geog import Geog, from_wkb, to_wkb

# GeographyKind (geography_interface.h:24-34)
KIND_POINT = 1
KIND_POLYLINE = 2
KIND_POLYGON = 3
KIND_COLLECTION = 4
KIND_SHAPE_INDEX = 5
KIND_ENCODED_SHAPE_INDEX = 6
KIND_CELL_CENTER = 7
KIND_GEOARROW = 8

FLAG_EMPTY = 1

_CELL_CENTER_MIN_LEVEL = 23  # ~1 m cells (geography.cc:214-218)


def _kind_of(g: Geog) -> int:
    d = g.dimension()
    has_p = len(g.points) > 0
    has_l = any(len(l) >= 2 for l in g.lines)
    has_g = any(len(r) >= 4 for rings in g.polys for r in rings)
    if sum((has_p, has_l, has_g)) > 1:
        return KIND_COLLECTION
    if d == 0:
        return KIND_POINT
    if d == 1:
        return KIND_POLYLINE
    if d == 2:
        return KIND_POLYGON
    # empty: derive from declared type
    return {1: KIND_POINT, 4: KIND_POINT, 2: KIND_POLYLINE, 5: KIND_POLYLINE,
            3: KIND_POLYGON, 6: KIND_POLYGON}.get(g.typ or 7, KIND_COLLECTION)


def _cell_center_id(g: Geog) -> Optional[int]:
    """Cell id when g is exactly one XY point on a level >= 23 cell center."""
    if len(g.points) != 1 or g.lines or g.polys or g.zm != (False, False):
        return None
    lng, lat = float(g.points[0, 0]), float(g.points[0, 1])
    leaf = C.from_lnglat(np.array([lng]), np.array([lat]))
    for lev in range(30, _CELL_CENTER_MIN_LEVEL - 1, -1):
        cell = C.parent(leaf, lev)
        cl = C.to_lnglat(cell)
        if float(cl[0][0]) == lng and float(cl[1][0]) == lat:
            return int(cell.view(np.int64)[0])
    return None


def encode_tagged(g: Optional[Geog], include_covering: bool = False,
                  hint: str = "fast") -> Optional[bytes]:
    """Encode with the 4-byte tag frame; hint='compact' enables the
    CELL_CENTER single-point form."""
    if g is None:
        return None
    if hint == "compact":
        cid = _cell_center_id(g)
        if cid is not None:
            tag = struct.pack("<BBBB", KIND_CELL_CENTER, 0, 1, 0)
            return tag + struct.pack("<q", int(cid))
    kind = _kind_of(g)
    flags = FLAG_EMPTY if g.is_empty() else 0
    covering: List[int] = []
    if include_covering and not g.is_empty():
        from .ops import s2_cell_union_bound
        covering = (s2_cell_union_bound(g) or [])[:255]
    tag = struct.pack("<BBBB", kind, flags, len(covering), 0)
    cov = b"".join(struct.pack("<q", int(c)) for c in covering)
    body = b"" if flags & FLAG_EMPTY else to_wkb(g)
    if flags & FLAG_EMPTY:
        # empties reconstruct from the kind byte alone (geography.cc:241-243)
        body = b""
    return tag + cov + body


def decode_tag(buf: bytes) -> dict:
    """Inspect the 4-byte prefix + embedded covering without decoding the
    body (the 'query directly on encoded bytes' entry point)."""
    if len(buf) < 4:
        raise ValueError("tagged buffer too short")
    kind, flags, n_cov, reserved = struct.unpack_from("<BBBB", buf, 0)
    if reserved != 0:
        raise ValueError("invalid tagged buffer (reserved byte != 0)")
    covering = [struct.unpack_from("<q", buf, 4 + 8 * i)[0]
                for i in range(n_cov)]
    return {"kind": kind, "flags": flags, "covering_size": n_cov,
            "covering": covering, "body_offset": 4 + 8 * n_cov}


def decode_tagged(buf: Optional[bytes]) -> Optional[Geog]:
    if buf is None:
        return None
    t = decode_tag(bytes(buf))
    kind = t["kind"]
    if kind == KIND_CELL_CENTER:
        cells = np.array(t["covering"], dtype=np.int64).view(np.uint64)
        lng, lat = C.to_lnglat(cells)
        return Geog(points=np.stack([lng, lat], axis=-1), typ=1)
    if t["flags"] & FLAG_EMPTY:
        typ = {KIND_POINT: 1, KIND_POLYLINE: 2, KIND_POLYGON: 3}.get(kind, 7)
        return Geog(typ=typ)
    body = bytes(buf)[t["body_offset"]:]
    return from_wkb(body)


def tagged_covering(buf: Optional[bytes]) -> Optional[List[int]]:
    """Embedded covering cells (empty list = none written, NOT empty geog)."""
    if buf is None:
        return None
    return decode_tag(bytes(buf))["covering"]
