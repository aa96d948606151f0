"""Geospatial search -- geodist() + {!geofilt}/{!bbox} qparsers.

The reference's configset declares the spatial fieldTypes
(default-base-config/managed-schema.xml:521-536 -- ``point`` =
solr.PointType dimension=2 with coordinate subfields, ``location`` =
solr.LatLonPointSpatialField) and the dynamic fields ``*_p``/``*_point``
that use them. We map a spatial field ``F`` onto the PointType subfield
convention: two numeric doc columns ``F_lat`` / ``F_lon`` (PointType
stores each dimension as its own subfield; LatLonPointSpatialField's
encoded "lat,lon" string carries the same two numbers).

Distance = Solr's geodist(): great-circle haversine over the mean earth
radius 6371.0087714 km (Lucene GeoUtils / Solr GeoDistValueSourceParser
both use this constant). Compiled to SQL trig (radians/sin/cos/asin/
sqrt) in both dialects -- whole-stage codegen on Spark, the same literal
expression for the DuckDB oracle; no Python in any hot path.

- ``geodist(F, lat, lon)`` -- a function-query extension
  (`functions/function_query.py` registers it): usable in sort=, bf=,
  frange, and json.facet stats like any ValueSource.
- ``fq={!geofilt sfield=F pt=lat,lon d=km}`` -- matches docs within d km
  (the circle filter).
- ``fq={!bbox sfield=F pt=lat,lon d=km}`` -- the bounding RECTANGLE
  enclosing that circle (Solr bbox semantics: cheaper, a superset of
  geofilt): lat within +-d/R degrees, lon within +-d/(R cos(lat))
  degrees.
"""

from __future__ import annotations

import math
import re

__all__ = ["EARTH_RADIUS_KM", "haversine_sql", "parse_geo_fq", "geo_fq_to_sql"]

EARTH_RADIUS_KM = 6371.0087714


def haversine_sql(lat_col: str, lon_col: str, lat: float, lon: float) -> str:
    """Great-circle distance (km) from (lat_col, lon_col) to a fixed point,
    as one SQL expression valid in both Spark SQL and DuckDB."""
    return (
        f"(2 * {EARTH_RADIUS_KM!r} * asin(sqrt("
        f"pow(sin(radians({lat_col} - ({lat!r})) / 2), 2) + "
        f"cos(radians({lat!r})) * cos(radians({lat_col})) * "
        f"pow(sin(radians({lon_col} - ({lon!r})) / 2), 2)"
        f")))"
    )


_GEO_RE = re.compile(r"^\{!(geofilt|bbox)\s+([^}]*)\}\s*$")


def parse_geo_fq(fq: str) -> tuple[str, str, float, float, float] | None:
    """Parse ``{!geofilt ...}`` / ``{!bbox ...}`` local params. Returns
    (kind, sfield, pt_lat, pt_lon, d_km) or None when the string is not a
    geo qparser. Unknown local params fail loud."""
    m = _GEO_RE.match(fq.strip())
    if m is None:
        return None
    kind, body = m.group(1), m.group(2)
    params: dict[str, str] = {}
    for part in body.split():
        k, eq, v = part.partition("=")
        if not eq or k not in ("sfield", "pt", "d"):
            raise ValueError(
                f"{{!{kind}}}: unsupported local param {part!r} "
                f"(use sfield/pt/d)"
            )
        params[k] = v
    missing = {"sfield", "pt", "d"} - set(params)
    if missing:
        raise ValueError(f"{{!{kind}}} needs {sorted(missing)}")
    try:
        lat_s, lon_s = params["pt"].split(",")
        lat, lon, d = float(lat_s), float(lon_s), float(params["d"])
    except ValueError:
        raise ValueError(
            f"{{!{kind}}}: pt must be 'lat,lon' and d numeric, got "
            f"pt={params['pt']!r} d={params['d']!r}"
        )
    if d <= 0:
        raise ValueError(f"{{!{kind}}}: d must be positive")
    return kind, params["sfield"], lat, lon, d


def geo_fq_to_sql(fq: str, types: dict[str, str]) -> str | None:
    """Compile a geo fq to a SQL boolean over the ``F_lat``/``F_lon``
    subfield columns, or None if the string is not a geo qparser. Valid
    in both dialects (plain trig + comparisons)."""
    parsed = parse_geo_fq(fq)
    if parsed is None:
        return None
    kind, sfield, lat, lon, d = parsed
    lat_col, lon_col = f"{sfield}_lat", f"{sfield}_lon"
    for c in (lat_col, lon_col):
        if c not in types:
            raise ValueError(
                f"spatial field {sfield!r}: column {c!r} not in the docs "
                f"schema (PointType subfield convention: <sfield>_lat/_lon)"
            )
    if kind == "geofilt":
        return f"({haversine_sql(lat_col, lon_col, lat, lon)} <= {d!r})"
    # bbox: the rectangle enclosing the d-km circle (Solr bbox semantics)
    dlat = math.degrees(d / EARTH_RADIUS_KM)
    coslat = math.cos(math.radians(lat))
    # at a pole the circle spans every longitude (cos -> 0)
    dlon = 180.0 if coslat <= 1e-12 else min(
        180.0, math.degrees(d / (EARTH_RADIUS_KM * coslat))
    )
    return (
        f"({lat_col} >= {lat - dlat!r} AND {lat_col} <= {lat + dlat!r} "
        f"AND {lon_col} >= {lon - dlon!r} AND {lon_col} <= {lon + dlon!r})"
    )
