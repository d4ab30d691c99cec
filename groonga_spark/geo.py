"""Geo points and geo functions (reference ``lib/geo.c``, ``lib/grn_geo.h``).

A geo point is stored as its canonical text form ``"<lat>x<lng>"`` with both
coordinates in integer milliseconds of arc (the reference packs the same two
int32s into an 8-byte value; select/dump render exactly this string, so a
string column keeps the Spark schema trivial and the output path copy-free).
``load`` accepts ``x`` or ``,`` separators and decimal-degree coordinates
(``"35.67x139.76"``) and canonicalizes (grn_obj_cast text→geo,
lib/db.c:5700-5760).

Distance approximations (lib/geo.c:2424-2570):

* ``rectangle`` (default) — the reference dispatches on a 16-way quadrant
  type plus a short/long longitude-distance type, but every *short* branch
  reduces to the same symmetric formula
  ``sqrt(Δlat² + (Δlng·cos((lat1+lat2)/2))²)·R`` (its point swaps only
  reorder arguments of a symmetric expression, and the degenerate equal-
  longitude / equal-latitude branches produce the same value), and every
  *long* branch (antimeridian crossing: strictly opposite longitude signs
  and >180° apart) is the same formula with ``Δlng → 2π−|Δlng|``.  We
  implement that reduction directly; ``tests/test_geo.py`` property-checks
  it against a literal transcription of the reference's branch structure.
* ``sphere`` — haversine on GRN_GEO_RADIUS.
* ``ellipsoid`` — meridian/prime-vertical radii with Bessel (Tokyo datum)
  or GRS80 (WGS84) constants per the point's domain.

All query-path math is Spark Column expressions (whole-stage codegen);
the pure-Python mirrors serve the conformance runner's row mirror and the
property tests.
"""
from __future__ import annotations

import math
import re

from pyspark.sql import Column, functions as F

# lib/grn_geo.h:43-57
RESOLUTION = 3600000
RADIUS = 6357303
BES_C1 = 6334834
BES_C2 = 6377397
BES_C3 = 0.006674
GRS_C1 = 6335439
GRS_C2 = 6378137
GRS_C3 = 0.006694
MAX_LATITUDE = 324000000
MAX_LONGITUDE = 648000000 - 1

_INT2RAD = math.pi / (RESOLUTION * 180)
_2PI = 2 * math.pi

_NUM = re.compile(r"-?\d+")


class GeoParseError(ValueError):
    """Text does not cast to a geo point (grn_obj_cast → INVALID_ARGUMENT)."""


def degree2msec(degree: float) -> int:
    """GRN_GEO_DEGREE2MSEC (include/groonga/groonga.h:1438)."""
    return int(degree * 3600 * 1000 + (0.5 if degree > 0 else -0.5))


def parse_geopoint(s: str) -> tuple[int, int]:
    """``"<lat>x<lng>"`` / ``"<lat>,<lng>"`` text → (lat, lng) msec ints.

    Each coordinate is an integer msec value, or decimal degrees when it
    contains ``.`` (lib/db.c:5700-5760).  The empty string is (0, 0).
    Out-of-range / malformed → :class:`GeoParseError`.
    """
    if s == "":
        return (0, 0)
    m = re.fullmatch(
        r"\s*(-?\d+(?:\.\d+)?)\s*[x,]\s*(-?\d+(?:\.\d+)?)\s*", s
    )
    if not m:
        raise GeoParseError(f"invalid geo point {s!r}")
    vals = []
    for part in m.groups():
        if "." in part:
            vals.append(degree2msec(float(part)))
        else:
            vals.append(int(part))
    lat, lng = vals
    if not (-MAX_LATITUDE <= lat <= MAX_LATITUDE):
        raise GeoParseError(f"latitude out of range in {s!r}")
    if not (-MAX_LONGITUDE <= lng <= MAX_LONGITUDE):
        raise GeoParseError(f"longitude out of range in {s!r}")
    return lat, lng


def canonical(s: str) -> str:
    """Canonical stored text form ``"<lat_msec>x<lng_msec>"``."""
    lat, lng = parse_geopoint(s)
    return f"{lat}x{lng}"


def lat_lng(col: Column) -> tuple[Column, Column]:
    """Canonical geo-string column → (lat, lng) long Columns."""
    parts = F.split(col, "x")
    return parts[0].cast("long"), parts[1].cast("long")


def _ellipsoid_consts(domain: str) -> tuple[int, int, float]:
    if domain == "tokyo":
        return BES_C1, BES_C2, BES_C3
    return GRS_C1, GRS_C2, GRS_C3


APPROX_NAMES = {
    # grn_geo_resolve_approximate_type (lib/geo.c:714-747)
    "rectangle": "rectangle", "rect": "rectangle",
    "sphere": "sphere", "sphr": "sphere",
    "ellipsoid": "ellipsoid", "ellip": "ellipsoid",
}


# ---------------------------------------------------------------- Column


def distance_col(
    lat1: Column,
    lng1: Column,
    point2: tuple[int, int],
    approx: str = "rectangle",
    domain: str = "wgs84",
) -> Column:
    """Distance in meters between a geo column (msec Columns) and a fixed
    point, per the reference approximation (lib/geo.c:2424-2570)."""
    lat2, lng2 = point2
    lat1r = lat1 * F.lit(_INT2RAD)
    lng1r = lng1 * F.lit(_INT2RAD)
    lat2r, lng2r = lat2 * _INT2RAD, lng2 * _INT2RAD
    if approx == "sphere":
        x = F.sin(F.abs(lng1r - F.lit(lng2r)) * 0.5)
        y = F.sin(F.abs(lat1r - F.lit(lat2r)) * 0.5)
        return (
            F.asin(F.sqrt(y * y + F.cos(lat1r) * math.cos(lat2r) * x * x))
            * F.lit(2.0 * RADIUS)
        )
    if approx == "ellipsoid":
        c1, c2, c3 = _ellipsoid_consts(domain)
        p = (lat1r + F.lit(lat2r)) * 0.5
        q = F.lit(1.0) - F.lit(c3) * F.sin(p) * F.sin(p)
        r = F.sqrt(q)
        mm = F.lit(float(c1)) / (q * r)
        nn = F.lit(float(c2)) / r
        x = nn * F.cos(p) * F.abs(lng1r - F.lit(lng2r))
        y = mm * F.abs(lat1r - F.lit(lat2r))
        return F.sqrt(x * x + y * y)
    # rectangle: symmetric short form + antimeridian wrap (module docstring)
    abs_diff = F.abs(lng1 - F.lit(lng2))
    opposite = (
        ((lng1 > 0) & F.lit(lng2 < 0)) | ((lng1 < 0) & F.lit(lng2 > 0))
    )
    is_long = opposite & (abs_diff > F.lit(180 * RESOLUTION))
    delta = F.when(
        is_long, F.lit(_2PI) - abs_diff * F.lit(_INT2RAD)
    ).otherwise(abs_diff * F.lit(_INT2RAD))
    x = delta * F.cos((lat1r + F.lit(lat2r)) * 0.5)
    y = lat1r - F.lit(lat2r)
    return F.sqrt(x * x + y * y) * F.lit(float(RADIUS))


def in_rectangle_col(
    lat: Column,
    lng: Column,
    top_left: tuple[int, int],
    bottom_right: tuple[int, int],
) -> Column:
    """grn_geo_in_rectangle_raw (lib/geo.c:2151-2178) as a boolean Column:
    latitude within [br, tl]; longitude wraps the antimeridian when
    tl.lng > 0 > br.lng (GRN_GEO_LONGITUDE_IS_WRAPPED, geo.c:34)."""
    (tl_lat, tl_lng), (br_lat, br_lng) = top_left, bottom_right
    ok_lat = (lat <= F.lit(tl_lat)) & (lat >= F.lit(br_lat))
    if tl_lng > 0 and br_lng < 0:
        ok_lng = (lng >= F.lit(tl_lng)) | (lng <= F.lit(br_lng))
    else:
        ok_lng = (lng >= F.lit(tl_lng)) & (lng <= F.lit(br_lng))
    return ok_lat & ok_lng


def in_circle_col(
    lat: Column,
    lng: Column,
    center: tuple[int, int],
    radius,
    approx: str = "rectangle",
    domain: str = "wgs84",
) -> Column:
    """grn_geo_in_circle (lib/geo.c:2083-2148): distance(point, center) ≤
    radius — a number in meters, or a geo point whose distance from the
    center is the radius."""
    d = distance_col(lat, lng, center, approx, domain)
    if isinstance(radius, tuple):
        radius = distance_py(radius, center, approx, domain)
    return d <= F.lit(float(radius))


# ---------------------------------------------------------------- Python

def distance_py(
    p1: tuple[int, int],
    p2: tuple[int, int],
    approx: str = "rectangle",
    domain: str = "wgs84",
) -> float:
    """Pure-Python mirror of :func:`distance_col` (same float ops)."""
    lat1, lng1 = p1
    lat2, lng2 = p2
    lat1r, lng1r = lat1 * _INT2RAD, lng1 * _INT2RAD
    lat2r, lng2r = lat2 * _INT2RAD, lng2 * _INT2RAD
    if approx == "sphere":
        x = math.sin(abs(lng1r - lng2r) * 0.5)
        y = math.sin(abs(lat1r - lat2r) * 0.5)
        return (
            math.asin(
                math.sqrt(y * y + math.cos(lat1r) * math.cos(lat2r) * x * x)
            ) * 2 * RADIUS
        )
    if approx == "ellipsoid":
        c1, c2, c3 = _ellipsoid_consts(domain)
        p = (lat1r + lat2r) * 0.5
        q = 1 - c3 * math.sin(p) * math.sin(p)
        r = math.sqrt(q)
        mm = c1 / (q * r)
        nn = c2 / r
        x = nn * math.cos(p) * abs(lng1r - lng2r)
        y = mm * abs(lat1r - lat2r)
        return math.sqrt(x * x + y * y)
    abs_diff = abs(lng1 - lng2)
    opposite = (lng1 > 0 and lng2 < 0) or (lng1 < 0 and lng2 > 0)
    is_long = opposite and abs_diff > 180 * RESOLUTION
    delta = (
        _2PI - abs_diff * _INT2RAD if is_long else abs_diff * _INT2RAD
    )
    x = delta * math.cos((lat1r + lat2r) * 0.5)
    y = lat1r - lat2r
    return math.sqrt(x * x + y * y) * RADIUS


def in_rectangle_py(
    p: tuple[int, int],
    top_left: tuple[int, int],
    bottom_right: tuple[int, int],
) -> bool:
    lat, lng = p
    (tl_lat, tl_lng), (br_lat, br_lng) = top_left, bottom_right
    if not (br_lat <= lat <= tl_lat):
        return False
    if tl_lng > 0 and br_lng < 0:
        return lng >= tl_lng or lng <= br_lng
    return tl_lng <= lng <= br_lng


def in_circle_py(
    p: tuple[int, int],
    center: tuple[int, int],
    radius,
    approx: str = "rectangle",
    domain: str = "wgs84",
) -> bool:
    if isinstance(radius, tuple):
        radius = distance_py(radius, center, approx, domain)
    return distance_py(p, center, approx, domain) <= radius


def wgs84_to_tokyo(lat_msec: int, lng_msec: int) -> tuple[int, int]:
    """Datum shift used when casting between the two geo types
    (lib/db.c:5781-5830, constants from the jalan.net conversion)."""
    wy = lat_msec / 3600.0 * 0.001
    wx = lng_msec / 3600.0 * 0.001
    jy = wy * 1.000106961 - wx * 0.000017467 - 0.004602017
    jx = wx * 1.000083049 + wy * 0.000046047 - 0.010041046
    return degree2msec(jy), degree2msec(jx)


def tokyo_to_wgs84(lat_msec: int, lng_msec: int) -> tuple[int, int]:
    jy = lat_msec / 3600.0 * 0.001
    jx = lng_msec / 3600.0 * 0.001
    wy = jy - jy * 0.00010695 + jx * 0.000017464 + 0.0046017
    wx = jx - jy * 0.000046038 - jx * 0.000083043 + 0.010040
    return degree2msec(wy), degree2msec(wx)
