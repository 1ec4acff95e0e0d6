"""Geo operators: bounding box (incl. the antimeridian split) and
haversine distance — hand-computed fixtures pin the distance law and
the prefilter's conservativeness near poles."""

from __future__ import annotations

import math

import pytest

from pycasselastic_spark.operators.geo import (
    EARTH_RADIUS_M,
    Q20,
    geo_bounding_box,
    geo_distance,
    geotile_cells,
)


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "pid long, lat double, lon double"
    )


def test_bounding_box_inclusive_and_null_safe(spark):
    df = _pts(spark, [
        (1, 10.0, 5.0),    # exactly on the bottom bound -> in
        (2, 20.0, 5.0),    # exactly on the top bound -> in
        (3, 15.0, 5.0),    # inside
        (4, 25.0, 5.0),    # above
        (5, None, 5.0),    # NULL never matches
        (6, 15.0, 40.0),   # east of the box
    ])
    got = {r["pid"] for r in geo_bounding_box(
        df, "lat", "lon", top=20.0, left=0.0, bottom=10.0, right=10.0
    ).collect()}
    assert got == {1, 2, 3}


def test_bounding_box_antimeridian_split(spark):
    df = _pts(spark, [
        (1, 0.0, 175.0),    # west side of the dateline box
        (2, 0.0, -175.0),   # east side
        (3, 0.0, 0.0),      # opposite hemisphere
    ])
    got = {r["pid"] for r in geo_bounding_box(
        df, "lat", "lon", top=10.0, left=170.0, bottom=-10.0, right=-170.0
    ).collect()}
    assert got == {1, 2}
    with pytest.raises(ValueError, match="outside"):
        geo_bounding_box(df, "lat", "lon", 95.0, 0.0, 0.0, 10.0)
    with pytest.raises(ValueError, match="above top"):
        geo_bounding_box(df, "lat", "lon", 0.0, 0.0, 10.0, 10.0)


def test_geo_distance_matches_hand_haversine(spark):
    # one degree of latitude from the origin is exactly R * pi/180
    # meters under the fixed-radius haversine
    df = _pts(spark, [
        (1, 1.0, 0.0),
        (2, 0.0, 2.0),
        (3, 80.0, 80.0),   # far away
        (4, None, 0.0),
    ])
    one_deg = EARTH_RADIUS_M * math.pi / 180.0
    got = {r["pid"]: r["dist_q20"] for r in geo_distance(
        df, "lat", "lon", 0.0, 0.0, distance_m=250_000.0
    ).collect()}
    assert set(got) == {1, 2}
    assert got[1] == math.floor(
        2.0 * EARTH_RADIUS_M
        * math.asin(math.sqrt(math.sin(math.radians(-1.0) / 2.0) ** 2))
        * Q20
    )
    assert abs(got[1] / Q20 - one_deg) < 1.0
    assert abs(got[2] / Q20 - 2 * one_deg) < 1.0


def test_geo_distance_topk_page_and_pole_prefilter(spark):
    df = _pts(spark, [
        (1, 0.1, 0.0), (2, 0.2, 0.0), (3, 0.3, 0.0), (4, 50.0, 50.0),
    ])
    page = geo_distance(
        df, "lat", "lon", 0.0, 0.0, distance_m=10_000_000.0,
        id_col="pid", k=2,
    ).collect()
    assert [r["pid"] for r in page] == [1, 2]
    # near the pole the longitude prefilter must drop (parallels
    # degenerate): a point 179 degrees of longitude away at lat 89.9
    # is only ~22 km from the pole-side center and MUST survive
    polar = _pts(spark, [(1, 89.9, 179.0)])
    got = geo_distance(
        polar, "lat", "lon", 89.9, 0.0, distance_m=50_000.0
    ).collect()
    assert [r["pid"] for r in got] == [1]
    with pytest.raises(ValueError, match="needs id_col"):
        geo_distance(df, "lat", "lon", 0.0, 0.0, 1000.0, k=5)
    with pytest.raises(ValueError, match="> 0 m"):
        geo_distance(df, "lat", "lon", 0.0, 0.0, 0.0)


def test_geotile_cells_known_tiles_and_clamp(spark):
    # z=1 hand tiles: (0,0) -> x=1 (east half), y=1 (south half of
    # the mercator square starts at the equator line: y index 1);
    # (45,-90) -> x=0, y=0; lat 89.9 clamps to the mercator bound
    df = _pts(spark, [
        (1, 0.0, 0.0),
        (2, 45.0, -90.0),
        (3, 89.9, -90.0),   # clamped -> y=0
        (4, None, 0.0),     # never buckets
        (5, 0.0, 180.0),    # x would be 2^z -> clamps to 1
    ])
    got = {r["tile"]: r["n_docs"]
           for r in geotile_cells(df, "lat", "lon", zoom=1, k=10).collect()}
    assert got == {"1/1/1": 2, "1/0/0": 2}
    with pytest.raises(ValueError, match="precision"):
        geotile_cells(df, "lat", "lon", zoom=30)


def test_geo_distance_ranges_ring_buckets(spark):
    from pycasselastic_spark.operators.geo import geo_distance_ranges

    one_deg = EARTH_RADIUS_M * math.pi / 180.0  # ~111.2 km
    df = _pts(spark, [
        (1, 0.5, 0.0),   # ~55.6 km  -> first ring
        (2, 2.0, 0.0),   # ~222 km   -> second ring
        (3, 0.0, 4.0),   # ~445 km   -> last (open) ring
        (4, None, 0.0),  # never buckets
    ])
    got = {r["bucket"]: r["n_docs"] for r in geo_distance_ranges(
        df, "lat", "lon", 0.0, 0.0,
        edges_m=[one_deg, 3 * one_deg],
    ).collect()}
    assert list(got.values()) == [1, 1, 1] or got == {
        f"*-{one_deg!r}": 1,
        f"{one_deg!r}-{3 * one_deg!r}": 1,
        f"{3 * one_deg!r}-*": 1,
    }
    # empty rings stay at 0 (ES returns every requested range)
    empty = {r["bucket"]: r["n_docs"] for r in geo_distance_ranges(
        df.limit(0), "lat", "lon", 0.0, 0.0, edges_m=[1000.0],
    ).collect()}
    assert empty == {"*-1000.0": 0, "1000.0-*": 0}
    with pytest.raises(ValueError, match="ascending positive"):
        geo_distance_ranges(df, "lat", "lon", 0.0, 0.0,
                            edges_m=[2000.0, 1000.0])


def test_geo_distance_prefilter_never_drops_a_true_hit(spark):
    """Property: the pushed lat/lon box prefilter is CONSERVATIVE —
    for seeded random points and centers (including near-pole and
    near-antimeridian centers), geo_distance returns exactly the
    brute-force haversine filter with no prefilter at all."""
    import random

    rng = random.Random(20260816)
    pts = [(i, rng.uniform(-90, 90), rng.uniform(-180, 180))
           for i in range(400)]
    df = _pts(spark, pts)

    def hav(lat1, lon1, lat2, lon2):
        import math as m
        c = 0.017453292519943295
        s1 = m.sin((lat2 - lat1) * c / 2.0)
        s2 = m.sin((lon2 - lon1) * c / 2.0)
        a = s1 * s1 + m.cos(lat1 * c) * m.cos(lat2 * c) * s2 * s2
        return 2.0 * EARTH_RADIUS_M * m.asin(m.sqrt(a))

    # mid-latitude centers included deliberately: the naive
    # ddeg/cos(lat) lon band UNDERestimates there (review finding —
    # the tangent-meridian width asin(sin r / cos lat) is the truth)
    centers = [(0.0, 0.0), (89.5, 10.0), (-88.0, -170.0),
               (45.0, 179.5), (-30.0, -179.9), (60.0, 0.0),
               (55.0, 20.0), (-45.0, 100.0), (70.0, -60.0)]
    for clat, clon in centers:
        r_m = rng.uniform(100_000, 4_000_000)
        got = {r["pid"] for r in geo_distance(
            df, "lat", "lon", clat, clon, distance_m=r_m
        ).collect()}
        want = {
            pid for pid, la, lo in pts
            if math.floor(hav(la, lo, clat, clon) * Q20)
            <= math.floor(r_m * Q20)
        }
        assert got == want, (clat, clon, r_m)


def test_geo_distance_prefilter_mid_latitude_regression(spark):
    """The exact regression from the round-14 review: center (60, 0),
    r = 5 degrees of arc — the circle reaches 10.04 degrees of
    longitude; the old ddeg/cos(band) band stopped at 8.8 and dropped
    the point (60.1, 10.02) which is INSIDE the circle."""
    r_m = 555_975.0  # ~5 degrees of arc
    df = _pts(spark, [(1, 60.1, 10.02)])
    got = geo_distance(df, "lat", "lon", 60.0, 0.0,
                       distance_m=r_m).collect()
    assert [r["pid"] for r in got] == [1]


def _geohash_halving(lat, lon, precision):
    """The classic interval-halving geohash construction — an
    INDEPENDENT reference for the quantize+interleave build."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(alphabet[ch])
            bit, ch = 0, 0
    return "".join(out)


def test_geohash_py_matches_interval_halving():
    from pycasselastic_spark.operators.geo import geohash_py

    cases = [
        (42.605, -5.603, 5),       # the canonical 'ezs42'
        (57.64911, 10.40744, 11),  # 'u4pruydqqvj'
        (57.64911, 10.40744, 12),
        (42.605, -5.603, 12),
        (0.0, 0.0, 6),
        (-89.9, -179.9, 7),
        (89.9, 179.9, 7),
        (-33.86, 151.21, 8),
    ]
    assert geohash_py(42.605, -5.603, 5) == "ezs42"
    assert geohash_py(57.64911, 10.40744, 11) == "u4pruydqqvj"
    for lat, lon, p in cases:
        assert geohash_py(lat, lon, p) == _geohash_halving(lat, lon, p), \
            (lat, lon, p)


def test_geohash_cells_counts_and_order(spark):
    from pycasselastic_spark.operators.geo import (
        geohash_cells,
        geohash_py,
    )

    pts = [
        (42.605, -5.603),
        (42.606, -5.604),   # same precision-5 cell as above
        (57.64911, 10.40744),
        (None, 10.0),       # NULL never buckets
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = geohash_cells(df, "lat", "lon", precision=5, k=10).collect()
    got = {r["cell"]: r["n_docs"] for r in out}
    assert got == {
        geohash_py(42.605, -5.603, 5): 2,
        geohash_py(57.64911, 10.40744, 5): 1,
    }
    # count-desc, cell-asc order law
    assert [r["cell"] for r in out] == sorted(
        got, key=lambda c: (-got[c], c)
    )


def test_geohash_precision_bounds():
    import pytest as _pytest

    from pycasselastic_spark.operators.geo import geohash_py

    with _pytest.raises(ValueError, match="precision"):
        geohash_py(0.0, 0.0, 0)
    with _pytest.raises(ValueError, match="precision"):
        geohash_py(0.0, 0.0, 13)


def test_geohash_cells_full_precision_no_bit_shear(spark):
    # precision 12: the interleaved value reaches 2^60-1 — chunk
    # extraction must be exact integer shift/mask (a double divide
    # shears the low bits; round-14 review finding)
    from pycasselastic_spark.operators.geo import (
        geohash_cells,
        geohash_py,
    )

    pts = [(57.64911, 10.40744), (42.605, -5.603), (-33.8688, 151.2093)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = geohash_cells(df, "lat", "lon", precision=12, k=10).collect()
    assert {r["cell"] for r in out} == {
        geohash_py(lat, lon, 12) for lat, lon in pts
    }


def test_geohash_property_vs_interval_halving():
    # driver-side twin vs the independent halving construction over
    # random coordinates and every precision — pure Python, cheap.
    # Coordinates are drawn at 6-decimal (~0.1 m) granularity: within
    # ~1 ulp of 180 BELOW a cell boundary (~3 nm), (lon+180)/360
    # absorbs the offset while halving keeps it — a representation-
    # dependent window far below any physical coordinate precision
    # (hypothesis found it at lon=-1.4e-45).
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pycasselastic_spark.operators.geo import geohash_py

    @settings(max_examples=300, deadline=None)
    @given(
        lat_u=st.integers(-90_000_000, 90_000_000),
        lon_u=st.integers(-180_000_000, 180_000_000),
        p=st.integers(1, 12),
    )
    def check(lat_u, lon_u, p):
        lat, lon = lat_u / 1e6, lon_u / 1e6
        assert geohash_py(lat, lon, p) == _geohash_halving(lat, lon, p)

    check()
