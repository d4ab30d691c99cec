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


# ---------------------------------------------------------------------------
# geo-index mesh walk (grn_geo_select_in_circle emission order)
# ---------------------------------------------------------------------------
#
# The reference's geo index is a PAT trie keyed on the 64-bit Morton
# interleave of (lat, lng) (grn_gton, lib/grn.h:657-675).  in_circle over
# an index walks a covering set of Morton-prefix meshes
# (grn_geo_get_meshes_for_circle, lib/geo.c:346-525) in REVERSE build
# order, scans each mesh's key range through the trie in ascending key
# order, and inserts verified hits into the result hash as it goes
# (grn_geo_select_in_circle, lib/geo.c:843-990) — so a select without
# --sortby outputs records in that mesh-walk order, not id order.  The
# helpers below are driver-side pure Python (the conformance runner's
# fixtures are tiny); the scalable scan path stays in Column expressions.

_M64 = (1 << 64) - 1


def _spread32(v: int) -> int:
    v &= 0xFFFFFFFF
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def gton(lat_msec: int, lng_msec: int) -> int:
    """64-bit big-endian Morton key of a geo point (grn_gton,
    lib/grn.h:657-675): latitude bits ride one position above the
    longitude bits; int32 coordinates wrap through uint32."""
    return (_spread32(lat_msec) << 1) | _spread32(lng_msec)


def _diff_bit(key1: int, key2: int) -> int:
    """Index (from the MSB, 0-based) of the first differing bit of two
    Morton keys; 64 when equal (compute_diff_bit, lib/geo.c:63-82)."""
    x = key1 ^ key2
    return 64 if x == 0 else 64 - x.bit_length()


def _key_min_max(key: int, diff_bit: int) -> tuple[int, int]:
    """Smallest/largest Morton keys sharing the top ``diff_bit`` bits
    (compute_min_and_max_key, lib/geo.c:84-111)."""
    if diff_bit >= 64:
        return key, key
    low = (1 << (64 - diff_bit)) - 1
    return key & (_M64 ^ low), key | low


def _ntog(key: int) -> tuple[int, int]:
    """Inverse of :func:`gton` (grn_ntog, lib/grn.h:677-693); coordinates
    come back as SIGNED int32s."""
    def compact(v: int) -> int:
        v &= 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        v = (v | (v >> 16)) & 0x00000000FFFFFFFF
        return v

    lat, lng = compact(key >> 1), compact(key)
    if lat >= 1 << 31:
        lat -= 1 << 32
    if lng >= 1 << 31:
        lng -= 1 << 32
    return lat, lng


def _point_min_max(
    point: tuple[int, int], diff_bit: int
) -> tuple[tuple[int, int], tuple[int, int]]:
    """compute_min_and_max (lib/geo.c:113-132) on geo points."""
    kmin, kmax = _key_min_max(gton(*point), diff_bit)
    return _ntog(kmin), _ntog(kmax)


def meshes_for_circle(
    base_point: tuple[int, int],
    d_far: float,
    diff_bit: int,
    include_base_point_mesh: bool,
) -> list[tuple[tuple[int, int], int]]:
    """Covering meshes for a circle as (mesh_key_point, key_size_bits)
    in the reference's build order (grn_geo_get_meshes_for_circle,
    lib/geo.c:346-525): up to 4 base meshes at ``diff_bit`` plus up to 84
    sub-meshes at ``diff_bit + 2`` whose nearest point lies within
    ``d_far``."""
    blat, blng = base_point
    (min_lat, min_lng), (max_lat, max_lng) = _point_min_max(
        base_point, diff_bit - 2
    )
    lat_diff = (max_lat - min_lat + 1) // 2
    lng_diff = (max_lng - min_lng + 1) // 2
    base_lat = min_lat + lat_diff
    base_lng = min_lng + lng_diff
    if blat >= base_lat:
        position = "rt" if blng >= base_lng else "lt"
    else:
        position = "rb" if blng >= base_lng else "lb"

    meshes: list[tuple[tuple[int, int], int]] = []

    def add(lat_d: int, lng_d: int, key_size: int) -> None:
        meshes.append(((base_lat + lat_d, base_lng + lng_d), key_size))

    if include_base_point_mesh or position != "lt":
        add(0, -lng_diff, diff_bit)
    if include_base_point_mesh or position != "rt":
        add(0, 0, diff_bit)
    if include_base_point_mesh or position != "rb":
        add(-lat_diff, 0, diff_bit)
    if include_base_point_mesh or position != "lb":
        add(-lat_diff, -lng_diff, diff_bit)

    half_lat = (lat_diff + 1) // 2
    half_lng = (lng_diff + 1) // 2
    for i in range(-5, 5):
        lat_min = half_lat * i
        lat_max = half_lat * (i + 1) - 1
        for j in range(-5, 5):
            if -3 < i < 2 and -3 < j < 2:
                continue  # the 4 base meshes already cover this block
            lng_min = half_lng * j
            lng_max = half_lng * (j + 1) - 1
            if blat <= base_lat + lat_min:
                lat = base_lat + lat_min
            elif base_lat + lat_max < blat:
                lat = base_lat + lat_max
            else:
                lat = blat
            if blng <= base_lng + lng_min:
                lng = base_lng + lng_min
            elif base_lng + lng_max < blng:
                lng = base_lng + lng_max
            else:
                lng = blng
            d = distance_py((blat, blng), (lat, lng), "rectangle")
            if d < d_far:
                meshes.append(((lat, lng), diff_bit + 2))
    return meshes


def rad2int(rad: float) -> int:
    """GRN_GEO_RAD2INT (lib/grn_geo.h:52) — C cast truncates toward 0."""
    return int((RESOLUTION * 180 / math.pi) * rad)


def in_circle_select_order(
    points: list[tuple[int, tuple[int, int]]],
    center: tuple[int, int],
    radius,
    approx: str = "rectangle",
    domain: str = "wgs84",
) -> list[int]:
    """Record ids of ``points`` (``[(rid, (lat, lng)), …]``) inside the
    circle, in grn_geo_select_in_circle's emission order
    (lib/geo.c:843-990): covering meshes iterated in reverse build order,
    each mesh's members in ascending Morton-key (PAT cursor) order,
    verified against the true distance."""
    if isinstance(radius, tuple):
        on_circle = radius
        d = distance_py(center, on_circle, approx, domain)
    else:
        d = float(radius)
        on_circle = (center[0] + rad2int(d / RADIUS), center[1])
    d_far = distance_py(center, on_circle, "rectangle")
    diff_bit = _diff_bit(gton(*center), gton(*on_circle))
    if diff_bit % 2 == 1:
        diff_bit -= 1
    keyed = [(gton(*p), rid, p) for rid, p in points]
    out: list[int] = []
    seen: set[int] = set()
    for mesh_point, key_size in reversed(
        meshes_for_circle(center, d_far, diff_bit, True)
    ):
        kmin, kmax = _key_min_max(gton(*mesh_point), key_size)
        for _k, rid, p in sorted(kv for kv in keyed if kmin <= kv[0] <= kmax):
            if rid not in seen and distance_py(p, center, approx, domain) <= d:
                seen.add(rid)
                out.append(rid)
    return out


def validate_rectangle(
    top_left: tuple[int, int],
    bottom_right: tuple[int, int],
    process_name: str,
) -> None:
    """Corner bounds check of the index path (in_rectangle_data_validate,
    lib/geo.c:1085-1177): latitudes must lie strictly inside
    ±MAX_LATITUDE, longitudes strictly inside ±MAX_LONGITUDE.  Raises
    :class:`GeoParseError` with the reference's message shape."""
    for label, (lat, lng) in (
        ("top left", top_left),
        ("bottom right", bottom_right),
    ):
        if lat >= MAX_LATITUDE:
            raise GeoParseError(
                f"{process_name}: {label} point's latitude is too big: "
                f"<{MAX_LATITUDE}>(max:{lat})"
            )
        if lat <= -MAX_LATITUDE:
            raise GeoParseError(
                f"{process_name}: {label} point's latitude is too small: "
                f"<{-MAX_LATITUDE}>(min:{lat})"
            )
        if lng >= MAX_LONGITUDE:
            raise GeoParseError(
                f"{process_name}: {label} point's longitude is too big: "
                f"<{MAX_LONGITUDE}>(max:{lng})"
            )
        if lng <= -MAX_LONGITUDE:
            raise GeoParseError(
                f"{process_name}: {label} point's longitude is too small: "
                f"<{-MAX_LONGITUDE}>(min:{lng})"
            )
