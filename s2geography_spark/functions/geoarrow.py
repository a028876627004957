"""Native GeoArrow typed-array ingest / egress.

The reference's geoarrow::Reader / geoarrow::Writer accept TYPED GeoArrow
coordinate arrays — point / linestring / polygon nesting levels of
struct<x, y> — with import options (oriented, planar tessellation),
not just WKT/WKB serializations (/root/reference/src/s2geography/geoarrow.h:59-115,
options at :40-76).  This module is the Spark shape of that surface:

  * Spark column types mirror the GeoArrow nesting exactly:
      point           struct<x double, y double>
      linestring      array<struct<x double, y double>>
      polygon         array<array<struct<x double, y double>>>
  * ingest converts the typed column to the engine's WKB transport inside
    ONE Arrow-batched pandas UDF, honoring the same options as the WKB
    reader (`oriented` keeps ring winding as given, `planar` tessellates
    plate-carree edges to geodesics within a tolerance);
  * egress converts WKB back to the typed column (Writer analog), so
    GeoParquet/GeoArrow-native pipelines round-trip without WKT/WKB
    detours.

At 100 TB this is the preferred ingest path: the coordinate structs arrive
in columnar Arrow form and never materialize per-row Python objects beyond
the batch being converted; the scan is map-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..core.geog import (Geog, _normalize_rings, from_wkb, tessellate_planar,
                         to_wkb)

_XY = T.StructType([T.StructField("x", T.DoubleType()),
                    T.StructField("y", T.DoubleType())])
GEOARROW_POINT_TYPE = _XY
GEOARROW_LINESTRING_TYPE = T.ArrayType(_XY)
GEOARROW_POLYGON_TYPE = T.ArrayType(T.ArrayType(_XY))


def _coords_array(seq) -> np.ndarray:
    """list of {'x':..,'y':..} dicts (one Arrow struct list) -> (n,2) f64."""
    return np.array([[c["x"], c["y"]] for c in seq], dtype=np.float64)


def geoarrow_point_to_wkb():
    """struct<x,y> -> point WKB (geoarrow.h Reader, point geometry type).
    Null struct or null x/y -> null."""

    @pandas_udf(T.BinaryType())
    def udf(pt: pd.DataFrame) -> pd.Series:
        xs = pt["x"].to_numpy(dtype=np.float64, na_value=np.nan)
        ys = pt["y"].to_numpy(dtype=np.float64, na_value=np.nan)
        out = []
        for x, y in zip(xs, ys):
            if np.isnan(x) or np.isnan(y):
                out.append(None)
            else:
                out.append(to_wkb(Geog(points=np.array([[x, y]]))))
        return pd.Series(out, dtype=object)

    return udf


def geoarrow_linestring_to_wkb(planar: bool = False,
                               tessellate_tolerance_m: float = 100.0):
    """array<struct<x,y>> -> linestring WKB.  planar=True reinterprets the
    vertex chain as straight-in-lnglat and densifies each edge until the
    geodesic stays within the tolerance (geoarrow.h:59-76 projection
    import; same semantics as the WKB reader's planar option)."""

    @pandas_udf(T.BinaryType())
    def udf(chains: pd.Series) -> pd.Series:
        out = []
        for ch in chains:
            if ch is None:
                out.append(None)
                continue
            coords = _coords_array(ch)
            g = Geog(lines=[coords] if len(coords) >= 2 else [], typ=2)
            if planar:
                g = tessellate_planar(g, tessellate_tolerance_m)
            out.append(to_wkb(g))
        return pd.Series(out, dtype=object)

    return udf


def geoarrow_polygon_to_wkb(oriented: bool = False, planar: bool = False,
                            tessellate_tolerance_m: float = 100.0):
    """array<array<struct<x,y>>> -> polygon WKB with the reference import
    options (geoarrow.h:40-76): oriented keeps ring winding as given (a CW
    shell means 'everything else'); default normalizes first=CCW shell,
    rest=CW holes; planar tessellates plate-carree edges."""

    @pandas_udf(T.BinaryType())
    def udf(polys: pd.Series) -> pd.Series:
        out = []
        for rings in polys:
            if rings is None:
                out.append(None)
                continue
            arrs = [_coords_array(r) for r in rings]
            arrs = [r for r in arrs if len(r) >= 4]
            g = Geog(polys=[arrs if oriented else _normalize_rings(arrs)]
                     if arrs else [], typ=3)
            if planar:
                g = tessellate_planar(g, tessellate_tolerance_m)
            out.append(to_wkb(g))
        return pd.Series(out, dtype=object)

    return udf


def wkb_to_geoarrow_point():
    """Point WKB -> struct<x,y> (geoarrow Writer analog); non-point or
    empty input -> null struct."""

    @pandas_udf(GEOARROW_POINT_TYPE)
    def udf(wkb: pd.Series) -> pd.DataFrame:
        rows = []
        for b in wkb:
            g = from_wkb(bytes(b)) if b is not None else None
            if g is None or len(g.points) != 1:
                rows.append((None, None))
            else:
                rows.append((float(g.points[0][0]), float(g.points[0][1])))
        return pd.DataFrame(rows, columns=["x", "y"])

    return udf


def wkb_to_geoarrow_linestring():
    """Single-linestring WKB -> array<struct<x,y>>; other input -> null."""

    @pandas_udf(GEOARROW_LINESTRING_TYPE)
    def udf(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            g = from_wkb(bytes(b)) if b is not None else None
            if g is None or len(g.lines) != 1 or len(g.points) or any(g.polys):
                out.append(None)
            else:
                out.append([{"x": float(x), "y": float(y)}
                            for x, y in np.asarray(g.lines[0])[:, :2]])
        return pd.Series(out, dtype=object)

    return udf


def wkb_to_geoarrow_polygon():
    """Single-polygon WKB -> array<array<struct<x,y>>> (shell first, holes
    after, engine-normalized winding); other input -> null."""

    @pandas_udf(GEOARROW_POLYGON_TYPE)
    def udf(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            g = from_wkb(bytes(b)) if b is not None else None
            if g is None or len(g.polys) != 1 or len(g.points) or g.lines:
                out.append(None)
            else:
                out.append([[{"x": float(x), "y": float(y)}
                             for x, y in np.asarray(r)[:, :2]]
                            for r in g.polys[0]])
        return pd.Series(out, dtype=object)

    return udf
