"""Geo queries: ``geo_bounding_box`` and ``geo_distance`` — the two
ES geo primitives every location-filter dashboard issues (the
reference's ES dependency serves them through the same filter-context
path as range/term filters, ``pyCassElastic.py:366-397``'s query
composition).

Both operate on plain ``lat``/``lon`` double columns (ES geo_point
doc-values re-expressed as two columns — the storage ES itself uses
under the hood is an encoded (lat, lon) pair):

* ``geo_bounding_box`` is pure comparisons — all four bounds push
  into the columnar scan; antimeridian-crossing boxes (left > right)
  become one OR of two pushed ranges, exactly ES's dateline split.
* ``geo_distance`` is the haversine circle with a CONSERVATIVE
  bounding-box prefilter pushed into the scan first (the standard
  geo optimization: cheap pruning before trig; ES's BKD tree plays
  the same role), then the exact haversine on survivors only.

Determinism: the haversine is ONE identical expression tree in Spark
and the DuckDB oracle — squares via multiplication (pow's libm
rounding is not pinned cross-engine), degree->radian via the literal
pi/180 (no engine-pi dependence), earth radius fixed at 6 371 000 m
(ES GeoUtils uses the IUGG mean 6 371 008.77 m; the constant is an
API contract here, documented, not a hidden divergence). Distances
quantize to Q20 micrometers-scale fixed point for the value-hash.

Scale: both operators are single-scan, shuffle-free until the
optional top-k (TakeOrderedAndProject — per-partition heaps). At
100 TB the bounding-box prefilter is what matters: it reaches the
parquet row-group stats, so a city-sized circle over a
planet-sized corpus reads only the row groups whose min/max
lat/lon intersect the box.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q20 = 1 << 20
EARTH_RADIUS_M = 6_371_000.0
_DEG2RAD = 0.017453292519943295  # pi / 180, the literal both engines use


def _check_latlon(lat: float, lon: float) -> None:
    if not (-90.0 <= lat <= 90.0):
        raise ValueError(f"latitude {lat!r} outside [-90, 90]")
    if not (-180.0 <= lon <= 180.0):
        raise ValueError(f"longitude {lon!r} outside [-180, 180]")


def geo_bounding_box(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> DataFrame:
    """ES ``geo_bounding_box``: rows whose point falls inside the box
    (bounds inclusive, exactly ES). ``left > right`` is the
    antimeridian-crossing box and becomes an OR of the two pushed
    longitude ranges (ES's dateline split). NULL coordinates never
    match (a missing point is not inside any box). Returns ``df``
    filtered — four comparisons, all pushed to the scan."""
    _check_latlon(top, left)
    _check_latlon(bottom, right)
    if bottom > top:
        raise ValueError(
            f"geo_bounding_box bottom {bottom!r} above top {top!r}"
        )
    la, lo = F.col(lat_col), F.col(lon_col)
    lat_pred = (la >= F.lit(float(bottom))) & (la <= F.lit(float(top)))
    if left <= right:
        lon_pred = (lo >= F.lit(float(left))) & (lo <= F.lit(float(right)))
    else:
        lon_pred = (lo >= F.lit(float(left))) | (lo <= F.lit(float(right)))
    return df.filter(lat_pred & lon_pred)


def haversine_m(lat1, lon1, lat2, lon2):
    """Haversine distance in meters as ONE fixed expression tree —
    the exact shape the DuckDB oracles replay (squares via
    multiplication, radians via the pi/180 literal). Column or
    literal inputs."""
    dlat_h = (lat2 - lat1) * F.lit(_DEG2RAD) / F.lit(2.0)
    dlon_h = (lon2 - lon1) * F.lit(_DEG2RAD) / F.lit(2.0)
    s1 = F.sin(dlat_h)
    s2 = F.sin(dlon_h)
    a = (
        s1 * s1
        + F.cos(lat1 * F.lit(_DEG2RAD))
        * F.cos(lat2 * F.lit(_DEG2RAD))
        * s2 * s2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def geo_distance_ranges(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    edges_m: list[float],
) -> DataFrame:
    """ES ``geo_distance`` AGGREGATION: ring buckets around an origin
    — counts per distance band, ``from`` inclusive / ``to`` exclusive
    (the ES range-agg law), bucket keys in ES's ``*-100.0`` /
    ``100.0-300.0`` / ``300.0-*`` format, EMPTY rings kept at 0 (ES
    returns every requested range). ``edges_m`` are the ascending
    ring boundaries in meters; n+1 buckets come back for n edges.

    Determinism: ONE haversine per row (the same pinned expression
    tree as geo_distance), compared in Q20 integer space against
    Q20-floored edges. Plan: one scan, one row-local distance, one
    partial-aggregated conditional-sum reduction to n+1 cells — the
    filters-agg shape, never a shuffle per ring."""
    _check_latlon(center_lat, center_lon)
    edges = [float(e) for e in edges_m]
    if not edges or any(e <= 0 for e in edges) or sorted(edges) != edges:
        raise ValueError(
            f"geo_distance ranges need ascending positive edges, "
            f"got {edges_m!r}"
        )
    la, lo = F.col(lat_col), F.col(lon_col)
    d_q = F.floor(
        haversine_m(la, lo, F.lit(float(center_lat)),
                    F.lit(float(center_lon))) * F.lit(float(Q20))
    ).cast("long")
    bounds = [None, *[int(math.floor(e * Q20)) for e in edges], None]
    cells = []
    keys = []
    for i in range(len(edges) + 1):
        lo_q, hi_q = bounds[i], bounds[i + 1]
        cond = F.lit(True)
        if lo_q is not None:
            cond = cond & (d_q >= F.lit(lo_q))
        if hi_q is not None:
            cond = cond & (d_q < F.lit(hi_q))
        lo_key = "*" if lo_q is None else repr(edges[i - 1])
        hi_key = "*" if hi_q is None else repr(edges[i])
        key = f"{lo_key}-{hi_key}"
        keys.append(key)
        # coalesce: an empty frame sums to NULL, ES returns 0 rings
        cells.append(
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("long").alias(f"_c{i}")
        )
    one = df.filter(la.isNotNull() & lo.isNotNull()).agg(*cells)
    pairs = F.array(*[
        F.struct(F.lit(k).alias("bucket"), F.col(f"_c{i}").alias("n_docs"))
        for i, k in enumerate(keys)
    ])
    return (
        one.select(F.explode(pairs).alias("p"))
        .select(F.col("p.bucket").alias("bucket"),
                F.col("p.n_docs").alias("n_docs"))
    )


_PI = 3.141592653589793
_MERCATOR_LAT = 85.05112878  # Web-Mercator clamp, ES's GeoTileUtils


def geotile_cells(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    zoom: int,
    k: int = 10,
) -> DataFrame:
    """ES ``geotile_grid`` aggregation: bucket points into Web-Mercator
    map tiles at ``zoom`` (the "z/x/y" keys every slippy map consumes),
    count per tile, top-``k`` by (count desc, tile asc) — ES's bucket
    order with a deterministic key tiebreak. Latitudes clamp to the
    Mercator bound ±85.05112878 (ES GeoTileUtils does the same);
    NULL points never bucket.

    Determinism: the y tile uses ``ln((sin φ + 1) / cos φ)`` — the
    tan+sec identity rewritten onto the sin/cos/ln set the haversine
    already pins cross-engine — with pi as a literal; x is pure
    arithmetic. Both floor in double then clamp to [0, 2^z - 1].

    Plan shape: one scan, two row-local expressions, ONE
    partial-aggregated groupBy + TakeOrderedAndProject."""
    if not (0 <= int(zoom) <= 29):
        raise ValueError(f"geotile_grid precision {zoom!r} (0..29, ES law)")
    n = float(1 << int(zoom))
    la = F.least(
        F.greatest(F.col(lat_col), F.lit(-_MERCATOR_LAT)),
        F.lit(_MERCATOR_LAT),
    )
    lo = F.col(lon_col)
    xt = F.floor((lo + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    xt = F.least(F.greatest(xt, F.lit(0)), F.lit(int(n) - 1))
    phi = la * F.lit(_DEG2RAD)
    yraw = (
        (F.lit(1.0)
         - F.log((F.sin(phi) + F.lit(1.0)) / F.cos(phi)) / F.lit(_PI))
        / F.lit(2.0) * F.lit(n)
    )
    yt = F.least(F.greatest(F.floor(yraw), F.lit(0)), F.lit(int(n) - 1))
    return (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select(
            F.concat_ws(
                "/", F.lit(str(int(zoom))), xt.cast("long").cast("string"),
                yt.cast("long").cast("string"),
            ).alias("tile")
        )
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("tile").asc())
        .limit(int(k))
    )


def geo_distance(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    distance_m: float,
    id_col: str | None = None,
    k: int | None = None,
) -> DataFrame:
    """ES ``geo_distance``: rows within ``distance_m`` meters of the
    center (haversine, bound inclusive — ES's arc distance default).
    Adds ``dist_q20`` = floor(meters x 2^20). With ``k`` (requires
    ``id_col`` for the total-order tiebreak) the result is the
    nearest-k page — ES's ``sort: _geo_distance`` — via
    TakeOrderedAndProject.

    Plan: a CONSERVATIVE lat/lon box prefilter pushed into the scan
    (latitude band is exact — meridian arcs are great circles; the
    longitude band uses the widest parallel inside the band, widened
    1%, and drops entirely when the band touches a pole where
    parallels degenerate), then the exact haversine on survivors."""
    _check_latlon(center_lat, center_lon)
    if distance_m <= 0:
        raise ValueError(f"geo_distance distance {distance_m!r} (> 0 m)")
    if k is not None and id_col is None:
        raise ValueError("geo_distance k needs id_col for the tiebreak")
    r_ang = distance_m / EARTH_RADIUS_M
    ddeg = math.degrees(r_ang)
    la, lo = F.col(lat_col), F.col(lon_col)
    lat_lo, lat_hi = center_lat - ddeg, center_lat + ddeg
    pre = (la >= F.lit(lat_lo)) & (la <= F.lit(lat_hi))
    if abs(center_lat) + ddeg < 89.0:
        # exact maximum longitude half-width of a geodesic circle:
        # asin(sin r / cos φ_center) — the tangent-meridian law; the
        # naive ddeg / cos(φ) underestimates away from the equator
        # (round-14 review finding: at (60°, r=5°) the circle reaches
        # 10.04° of longitude, not 8.8°). The guard keeps the asin
        # argument < 1 (r < 90 - |φ|); 1% widening absorbs rounding.
        dlon = math.degrees(
            math.asin(math.sin(r_ang) / math.cos(math.radians(center_lat)))
        ) * 1.01
        lon_lo, lon_hi = center_lon - dlon, center_lon + dlon
        if lon_lo >= -180.0 and lon_hi <= 180.0:
            pre = pre & (lo >= F.lit(lon_lo)) & (lo <= F.lit(lon_hi))
        # a box spilling over the antimeridian keeps only the exact
        # latitude band — correctness never depends on the prefilter
    out = (
        df.filter(la.isNotNull() & lo.isNotNull())
        .filter(pre)
        .withColumn(
            "dist_q20",
            F.floor(
                haversine_m(la, lo, F.lit(float(center_lat)),
                            F.lit(float(center_lon))) * F.lit(float(Q20))
            ).cast("long"),
        )
        .filter(
            F.col("dist_q20")
            <= F.lit(int(math.floor(float(distance_m) * Q20)))
        )
    )
    if k is not None:
        out = out.orderBy(
            F.col("dist_q20").asc(), F.col(id_col).asc()
        ).limit(int(k))
    return out


_GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_quant(precision: int):
    """(total_bits, lon_bits, lat_bits) for a geohash precision —
    bits alternate lon-first, so lon gets the extra bit when 5p is
    odd."""
    if not (1 <= int(precision) <= 12):
        raise ValueError(
            f"geohash_grid precision {precision!r} (1..12, ES law)"
        )
    bits = 5 * int(precision)
    nlon = (bits + 1) // 2
    return bits, nlon, bits - nlon


def geohash_py(lat: float, lon: float, precision: int) -> str:
    """Driver-side geohash twin of the Column construction below —
    quantize each axis to its bit budget, interleave lon-first,
    base32-encode. Kept in lockstep with geohash_cells (tests pin
    both against the classic interval-halving construction)."""
    bits, nlon, nlat = _geohash_quant(precision)
    x = max(min(int((lon + 180.0) / 360.0 * (1 << nlon)),
                (1 << nlon) - 1), 0)
    y = max(min(int((lat + 90.0) / 180.0 * (1 << nlat)),
                (1 << nlat) - 1), 0)
    v = 0
    for j in range(bits):
        if j % 2 == 0:
            bit = (x >> (nlon - 1 - j // 2)) & 1
        else:
            bit = (y >> (nlat - 1 - (j - 1) // 2)) & 1
        v = (v << 1) | bit
    return "".join(
        _GEOHASH_BASE32[(v >> (5 * (precision - 1 - i))) & 31]
        for i in range(precision)
    )


def geohash_cells(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int,
    k: int = 10,
) -> DataFrame:
    """ES ``geohash_grid`` aggregation: bucket points into base32
    geohash cells at ``precision`` (1..12 chars), count per cell,
    top-``k`` by (count desc, cell asc) — ES's bucket order with a
    deterministic key tiebreak; NULL points never bucket.

    Determinism: geohash is INTEGER arithmetic end-to-end — each
    axis quantizes once (floor of a double division whose operands
    stay far below 2^53, so the division is exact-rounded the same
    everywhere), then the bit interleave and base32 chunks are
    exact integer terms. No transcendentals at all — strictly
    easier than geotile's Mercator y.

    Plan shape: one scan, one generated row-local expression tree
    (~5·precision integer terms inside whole-stage codegen), ONE
    partial-aggregated groupBy + TakeOrderedAndProject."""
    bits, nlon, nlat = _geohash_quant(precision)
    la, lo = F.col(lat_col), F.col(lon_col)
    xq = F.greatest(
        F.least(
            F.floor((lo + F.lit(180.0)) / F.lit(360.0)
                    * F.lit(float(1 << nlon))).cast("long"),
            F.lit((1 << nlon) - 1),
        ),
        F.lit(0),
    )
    yq = F.greatest(
        F.least(
            F.floor((la + F.lit(90.0)) / F.lit(180.0)
                    * F.lit(float(1 << nlat))).cast("long"),
            F.lit((1 << nlat) - 1),
        ),
        F.lit(0),
    )
    v = None
    for j in range(bits):
        if j % 2 == 0:
            src, sh = xq, nlon - 1 - j // 2
        else:
            src, sh = yq, nlat - 1 - (j - 1) // 2
        bit = F.floor(
            src.cast("double") / F.lit(float(1 << sh))
        ).cast("long") % 2
        term = bit * F.lit(1 << (bits - 1 - j))
        v = term if v is None else v + term
    # chunk extraction must stay in INTEGER space: v reaches 2^60-1
    # at precision 12 and a double cast would shear the low bits
    # (round-14 review finding) — shiftright/AND are exact at any
    # precision
    chars = [
        F.substring(
            F.lit(_GEOHASH_BASE32),
            F.shiftright(v, 5 * (precision - 1 - i))
             .bitwiseAND(F.lit(31)).cast("int") + F.lit(1),
            1,
        )
        for i in range(precision)
    ]
    return (
        df.filter(la.isNotNull() & lo.isNotNull())
        .select(F.concat(*chars).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("cell").asc())
        .limit(int(k))
    )
