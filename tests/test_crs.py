"""CRS transforms: round-trip identity, known anchor points, per-row
branch behavior, loud failure for unsupported CRSs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.functions import crs, geo


@pytest.fixture(scope="module")
def lonlat(spark):
    return spark.range(0, 200, 1, 4).select(
        F.col("id"),
        ((F.col("id") % 20).cast("double") * 15.0 - 150.0).alias("lon"),
        ((F.col("id") / 20).cast("long").cast("double") * 7.0 - 34.0).alias("lat"),
    )


def test_roundtrip_identity(lonlat):
    merc = crs.reproject_pixels(lonlat, 4326, 3857)
    back = crs.reproject_pixels(merc, 3857, 4326)
    rows = back.join(
        lonlat.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).collect()
    for r in rows:
        assert abs(r.lon - r.lon0) < 1e-9
        assert abs(r.lat - r.lat0) < 1e-9


def test_known_anchor(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0), (1, 180.0, 0.0)], "id long, lon double, lat double")
    rows = {r.id: r for r in crs.reproject_pixels(df, 4326, 3857).collect()}
    assert rows[0].lon == 0.0 and abs(rows[0].lat) < 1e-6
    assert abs(rows[1].lon - math.pi * crs.WEB_MERCATOR_RADIUS) < 1e-6


def test_identity_when_same_epsg(lonlat):
    assert crs.reproject_pixels(lonlat, 4326, 4326) is lonlat


def test_unsupported_pair_raises(lonlat):
    # Belgian Lambert 72 (31370) — a real CRS not in the registry
    with pytest.raises(NotImplementedError):
        crs.reproject_pixels(lonlat, 31370, 4326)


def test_standardize_mixed_crs(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, 20.0, 4326),
            (2, 1113194.9079327357, 2273030.926987689, 3857),  # (10°, 20°)
        ],
        "id long, lon double, lat double, src_epsg int",
    )
    rows = {r.id: r for r in crs.standardize_crs(df).collect()}
    assert rows[1].lon == 10.0
    assert abs(rows[2].lon - 10.0) < 1e-9
    assert abs(rows[2].lat - 20.0) < 1e-9
    assert rows[2].src_epsg == 4326


def test_utm_known_vector(spark):
    """Published UTM 32N sample (Freiburg): E≈414278.17 N≈5316285.60 —
    agrees with GDAL/proj to well under a metre (series truncation)."""
    df = spark.createDataFrame(
        [(0, 7.8509671, 47.9941214)], "id long, lon double, lat double"
    )
    e, n = crs.lonlat_to_utm(F.col("lon"), F.col("lat"), zone=32)
    row = df.select(e.alias("e"), n.alias("n")).collect()[0]
    assert abs(row.e - 414278.17) < 1.0
    assert abs(row.n - 5316285.60) < 1.0


def test_utm_central_meridian_invariants(spark):
    """On the central meridian: easting is exactly the false easting and
    the equator maps to northing 0 (north) / 10⁷ (south)."""
    df = spark.createDataFrame([(0, 15.0, 0.0)], "id long, lon double, lat double")
    e, n = crs.lonlat_to_utm(F.col("lon"), F.col("lat"), zone=33)
    row = df.select(e.alias("e"), n.alias("n")).collect()[0]
    assert row.e == crs.UTM_FALSE_EASTING
    assert abs(row.n) < 1e-9
    es, ns = crs.lonlat_to_utm(F.col("lon"), F.col("lat"), zone=33, south=True)
    row = df.select(es.alias("e"), ns.alias("n")).collect()[0]
    assert abs(row.n - crs.UTM_FALSE_NORTHING_SOUTH) < 1e-9


def test_utm_roundtrip_in_zone(spark):
    """Forward→inverse closes to <1e-8 deg (~1 mm) anywhere inside the
    zone's 6° band, both hemispheres (via reproject_pixels dispatch)."""
    pts = spark.range(0, 200, 1, 4).select(
        F.col("id"),
        (F.lit(12.05) + (F.col("id") % 20).cast("double") * 0.31).alias("lon"),
        ((F.col("id") / 20).cast("long").cast("double") * 15.0 - 70.0).alias("lat"),
    )
    for epsg in (32633, 32733):
        utm = crs.reproject_pixels(pts, 4326, epsg)
        back = crs.reproject_pixels(utm, epsg, 4326)
        rows = back.join(
            pts.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
        ).collect()
        for r in rows:
            assert abs(r.lon - r.lon0) < 1e-8
            assert abs(r.lat - r.lat0) < 1e-8


def test_utm_params_validation():
    assert crs.utm_params(32633) == (33, False)
    assert crs.utm_params(32733) == (33, True)
    assert crs.utm_epsg(33) == 32633
    assert crs.utm_epsg(33, south=True) == 32733
    for bad in (32600, 32661, 32700, 32761, 4326, 27700):
        with pytest.raises(ValueError):
            crs.utm_params(bad)


def test_promote_to_multi():
    poly = geo.polygon_wkb([[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]])
    multi = geo.promote_to_multi(poly)
    # already-multi passes through byte-identical
    assert geo.promote_to_multi(multi) == multi
    # parsed content identical to the source polygon
    import numpy as np

    a, b = geo.parse_wkb(poly), geo.parse_wkb(multi)
    assert len(a) == len(b) == 1
    assert np.array_equal(a[0][0], b[0][0])


def test_standardize_unsupported_epsg_raises(spark):
    """The unsupported-CRS guard lives inside the lon/lat expressions, so
    it fires even under aggressive column pruning (a standalone assertion
    column would be optimized away and never raise)."""
    df = spark.createDataFrame(
        [(1, 10.0, 20.0, 5514)], "id long, lon double, lat double, src_epsg int"
    )
    with pytest.raises(Exception, match="unsupported src EPSG"):
        crs.standardize_crs(df).select("lon").collect()


def test_standardize_mixed_utm_zones(spark):
    """One expression converts rows from different UTM zones (N and S)
    plus Web Mercator plus already-4326 — the per-row EPSG branch."""
    # forward-compute UTM coords for known lon/lat via the scalar path
    src = spark.createDataFrame(
        [(1, 13.5, 46.0), (2, 14.2, -33.0)], "id long, lon double, lat double"
    )
    e33, n33 = crs.lonlat_to_utm(F.col("lon"), F.col("lat"), zone=33)
    e33s, n33s = crs.lonlat_to_utm(F.col("lon"), F.col("lat"), zone=33, south=True)
    utm_n = src.filter("id = 1").select(e33.alias("e"), n33.alias("n")).collect()[0]
    utm_s = src.filter("id = 2").select(e33s.alias("e"), n33s.alias("n")).collect()[0]

    mixed = spark.createDataFrame(
        [
            (1, utm_n.e, utm_n.n, 32633),
            (2, utm_s.e, utm_s.n, 32733),
            (3, 1113194.9079327357, 2273030.926987689, 3857),  # (10°, 20°)
            (4, 10.0, 20.0, 4326),
        ],
        "id long, lon double, lat double, src_epsg int",
    )
    rows = {r.id: r for r in crs.standardize_crs(mixed).collect()}
    assert abs(rows[1].lon - 13.5) < 1e-8 and abs(rows[1].lat - 46.0) < 1e-8
    assert abs(rows[2].lon - 14.2) < 1e-8 and abs(rows[2].lat - (-33.0)) < 1e-8
    assert abs(rows[3].lon - 10.0) < 1e-9 and abs(rows[3].lat - 20.0) < 1e-9
    assert rows[4].lon == 10.0 and rows[4].lat == 20.0
    assert all(r.src_epsg == 4326 for r in rows.values())


def test_utm_roundtrip_all_zones_one_job(spark):
    """Dense sweep: every UTM zone 1..60, lats −79..83, offsets across
    the 6° band — forward∘inverse closes to <1e-8° everywhere, evaluated
    as ONE Spark job (column math is zone-parameterized per row via
    standardize_crs, so all 60 zones ride one expression)."""
    pts = spark.range(0, 60 * 9 * 5, 1, 8).selectExpr(
        "id",
        "CAST(id % 60 + 1 AS INT) AS zone",
        "CAST((id div 60) % 9 AS DOUBLE) * 18.0 - 72.0 AS lat",
        "(CAST(id % 60 + 1 AS INT) * 6 - 183) + (CAST(id div 540 AS DOUBLE) - 2.0) * 1.4 AS lon",
    )
    fwd = pts.select(
        "id", "lat", "lon",
        (F.lit(32600) + F.col("zone")).alias("src_epsg"),
        *crs.lonlat_to_utm_cols(F.col("lon"), F.col("lat"), F.col("zone")),
    )
    back = crs.standardize_crs(
        fwd.select(
            "id", "lat", "lon", "src_epsg",
            F.col("easting").alias("lon2"), F.col("northing").alias("lat2"),
        ).withColumnsRenamed({"lon": "lon0", "lat": "lat0", "lon2": "lon", "lat2": "lat"}),
    )
    worst = back.selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-8 and worst.dlat < 1e-8


def test_lcc_lambert93_known_vector(spark):
    """Paris in RGF93/Lambert-93 (EPSG:2154): published ≈(652469, 6862035)."""
    df = spark.createDataFrame(
        [(1, 2.3522, 48.8566)], "id long, lon double, lat double"
    )
    row = crs.reproject_pixels(df, 4326, 2154).collect()[0]
    assert abs(row.lon - 652469.02) < 1.0
    assert abs(row.lat - 6862035.26) < 1.0


def test_lcc_roundtrip_france_bounds(spark):
    pts = spark.range(0, 200, 1, 4).select(
        F.col("id"),
        (F.lit(-4.0) + (F.col("id") % 20).cast("double") * 0.6).alias("lon"),
        ((F.col("id") / 20).cast("long").cast("double") * 0.85 + 42.0).alias("lat"),
    )
    xy = crs.reproject_pixels(pts, 4326, 2154)
    back = crs.reproject_pixels(xy, 2154, 4326)
    worst = back.join(
        pts.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-9 and worst.dlat < 1e-9


def test_haversine_known_distances(spark):
    """Paris→London ≈ 343.5 km; equator degree ≈ 111.19 km; zero for
    identical points."""
    from pyspark.sql import functions as F

    from sids_data_pipeline_spark.functions.crs import haversine_meters

    df = spark.createDataFrame(
        [
            (48.8566, 2.3522, 51.5074, -0.1278),   # Paris -> London
            (0.0, 0.0, 0.0, 1.0),                  # 1 deg on equator
            (10.0, 20.0, 10.0, 20.0),              # same point
        ],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = [
        r.d
        for r in df.select(
            haversine_meters(
                F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
            ).alias("d")
        ).collect()
    ]
    assert abs(got[0] - 343_500) < 1_500
    assert abs(got[1] - 111_195) < 100
    assert got[2] == 0.0


def test_nearest_site_assign_join_free(spark):
    from sids_data_pipeline_spark.functions.crs import nearest_site

    pts = spark.createDataFrame(
        [(1, 0.1, 0.1), (2, 49.0, 2.0)], "pid int, lat double, lon double"
    )
    sites = [(10, 0.0, 0.0), (20, 48.8566, 2.3522)]
    out = nearest_site(pts, sites)
    got = {r.pid: r.site_id for r in out.collect()}
    assert got == {1: 10, 2: 20}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


# --- Albers equal-area (EPSG:5070) + sinusoidal (round-8 additions) ----------


def test_albers_snyder_worked_example(spark):
    """Snyder 1987 p. 292 Albers numerical example: Clarke 1866,
    CONUS parallels (23/29.5/45.5, lon0 -96), phi=35N lambda=75W →
    x=1,885,472.7  y=1,535,925.0 (and n/C/rho0 as published). An
    INDEPENDENT published oracle, not our own inverse."""
    P = crs.AlbersEqualArea(
        a=6378206.4, f=1 / 294.9786982, lat0=23.0, lat1=29.5, lat2=45.5,
        lon0=-96.0, false_easting=0.0, false_northing=0.0,
    )
    assert abs(P.n - 0.6029035) < 1e-7
    assert abs(P.C - 1.3491594) < 1e-7
    assert abs(P.rho0 - 9929079.6) < 0.1
    df = spark.createDataFrame([(1, -75.0, 35.0)], "id long, lon double, lat double")
    x, y = P.forward(F.col("lon"), F.col("lat"))
    row = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(row.x - 1885472.7) < 0.1
    assert abs(row.y - 1535925.0) < 0.1


def test_albers_5070_roundtrip_conus(spark):
    pts = spark.range(0, 400, 1, 4).select(
        F.col("id"),
        (F.lit(-124.0) + (F.col("id") % 20).cast("double") * 3.0).alias("lon"),
        ((F.col("id") / 20).cast("long").cast("double") * 1.2 + 25.0).alias("lat"),
    )
    xy = crs.reproject_pixels(pts, 4326, 5070)
    back = crs.reproject_pixels(xy, 5070, 4326)
    worst = back.join(
        pts.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-6 and worst.dlat < 1e-6


def test_albers_preserves_area(spark):
    """The defining property, checked numerically: the planar area of a
    projected 0.01-degree quad equals the ellipsoidal patch area
    a^2 (1-e^2) cos(phi) dlam dphi / (1-e^2 sin^2 phi)^2 to 1e-6
    relative — independent of any inverse-formula transcription."""
    import math as m

    P = crs.CONUS_ALBERS
    d = 0.01
    for lon0, lat0 in ((-100.0, 30.0), (-80.0, 45.0), (-120.0, 38.0)):
        quad = [
            (lon0, lat0), (lon0 + d, lat0),
            (lon0 + d, lat0 + d), (lon0, lat0 + d),
        ]
        df = spark.createDataFrame(
            [(i, lo, la) for i, (lo, la) in enumerate(quad)],
            "i long, lon double, lat double",
        )
        x, y = P.forward(F.col("lon"), F.col("lat"))
        rows = {r.i: (r.x, r.y) for r in df.select("i", x.alias("x"), y.alias("y")).collect()}
        pts = [rows[i] for i in range(4)]
        shoelace = 0.5 * abs(sum(
            pts[i][0] * pts[(i + 1) % 4][1] - pts[(i + 1) % 4][0] * pts[i][1]
            for i in range(4)
        ))
        phi = m.radians(lat0 + d / 2.0)
        patch = (
            P.a ** 2 * (1.0 - P.e2) * m.cos(phi)
            / (1.0 - P.e2 * m.sin(phi) ** 2) ** 2
            * m.radians(d) ** 2
        )
        assert abs(shoelace - patch) / patch < 1e-6, (lon0, lat0)


def test_sinusoidal_modis_roundtrip_and_closed_form(spark):
    df = spark.createDataFrame(
        [(1, 11.5, 42.3), (2, -150.0, -60.0), (3, 0.0, 0.0)],
        "id long, lon double, lat double",
    )
    # MODIS carries no true EPSG: 6974 (the de-facto SR-ORG tag) must be
    # an explicit opt-in, never an engine default (pop first: another
    # test may have run the catalog query that registers it)
    crs.PROJECTION_REGISTRY.pop(6974, None)
    with pytest.raises(NotImplementedError):
        crs.reproject_pixels(df, 4326, 6974)
    crs.register_projection(6974, crs.MODIS_SINUSOIDAL)
    crs.register_projection(6974, crs.MODIS_SINUSOIDAL)  # idempotent
    with pytest.raises(ValueError):
        crs.register_projection(6974, crs.WORLD_SINUSOIDAL)  # rebind
    xy = crs.reproject_pixels(df, 4326, 6974)
    back = crs.reproject_pixels(xy, 6974, 4326)
    worst = back.join(
        df.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-9 and worst.dlat < 1e-9
    # closed form spot check: y = R*radians(lat), x = R*radians(lon)*cos
    import math as m

    R = 6371007.181
    row = {r.id: r for r in xy.collect()}[1]
    assert abs(row.lat - R * m.radians(42.3)) < 1e-6
    assert abs(row.lon - R * m.radians(11.5) * m.cos(m.radians(42.3))) < 1e-6


def test_registry_dispatch_and_unsupported_raise(spark):
    df = spark.createDataFrame([(1, -96.0, 23.0)], "id long, lon double, lat double")
    # lon0/lat0 of 5070 map to (0, 0)
    row = crs.reproject_pixels(df, 4326, 5070).collect()[0]
    assert abs(row.lon) < 1e-6 and abs(row.lat) < 1e-6
    with pytest.raises(NotImplementedError):
        crs.reproject_pixels(df, 4326, 31370)  # Belgian L72 is not registered


# --- Polar stereographic (EPSG:3413/3976/3031, round-8 addition) --------------


def test_polar_stereographic_epsg_worked_example(spark):
    """EPSG Guidance 7-2 Polar Stereographic Variant B worked example:
    WGS84, standard parallel 71S, lon0 70E, FE=FN=6000000; the point
    (120E, 75S) maps to E 7255380.79, N 7053389.56 — an INDEPENDENT
    published oracle. Inverse recovers the point to 1e-7 degrees."""
    P = crs.PolarStereographic(
        a=crs.WGS84_A, f=crs.WGS84_F, lat_ts=-71.0, lon0=70.0,
        false_easting=6_000_000.0, false_northing=6_000_000.0,
    )
    df = spark.createDataFrame([(1, 120.0, -75.0)], "id long, lon double, lat double")
    x, y = P.forward(F.col("lon"), F.col("lat"))
    row = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(row.x - 7255380.79) < 0.01
    assert abs(row.y - 7053389.56) < 0.01
    lon, lat = P.inverse(F.lit(7255380.79), F.lit(7053389.56))
    row = df.select(lon.alias("lon"), lat.alias("lat")).collect()[0]
    assert abs(row.lon - 120.0) < 1e-7
    assert abs(row.lat - (-75.0)) < 1e-7


def test_polar_3413_roundtrip_arctic(spark):
    """NSIDC North (3413) through the reproject_pixels dispatch: a polar
    grid (lat 55..88, all longitudes incl. antimeridian) round-trips to
    1e-6 degrees — includes points whose inverse longitude needs the
    [-180, 180) wrap."""
    pts = spark.range(0, 400, 1, 4).select(
        F.col("id"),
        (F.lit(-180.0) + (F.col("id") % 20).cast("double") * 18.0).alias("lon"),
        ((F.col("id") / 20).cast("long").cast("double") * 1.7 + 55.0).alias("lat"),
    )
    xy = crs.reproject_pixels(pts, 4326, 3413)
    back = crs.reproject_pixels(xy, 3413, 4326)
    worst = back.join(
        pts.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-6 and worst.dlat < 1e-6


def test_polar_south_aspects_roundtrip_and_wrap(spark):
    """3976/3031 (south aspect): round-trip plus an explicit wrap case —
    lon0=-100-style configurations used to return -210 for 150E."""
    P = crs.PolarStereographic(
        a=crs.WGS84_A, f=crs.WGS84_F, lat_ts=-71.0, lon0=-100.0
    )
    df = spark.createDataFrame([(1, 150.0, -75.0)], "id long, lon double, lat double")
    x, y = P.forward(F.col("lon"), F.col("lat"))
    xy = df.select("id", x.alias("x"), y.alias("y"))
    lon, lat = P.inverse(F.col("x"), F.col("y"))
    row = xy.select(lon.alias("lon"), lat.alias("lat")).collect()[0]
    assert abs(row.lon - 150.0) < 1e-7 and abs(row.lat - (-75.0)) < 1e-7
    for code in (3976, 3031):
        pts = spark.range(0, 100, 1, 4).select(
            F.col("id"),
            (F.lit(-180.0) + (F.col("id") % 10).cast("double") * 36.0).alias("lon"),
            (F.lit(-88.0) + (F.col("id") / 10).cast("long").cast("double") * 2.1).alias("lat"),
        )
        back = crs.reproject_pixels(crs.reproject_pixels(pts, 4326, code), code, 4326)
        worst = back.join(
            pts.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
        ).selectExpr(
            "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
        ).collect()[0]
        assert worst.dlon < 1e-6 and worst.dlat < 1e-6, code


def test_polar_stereographic_rejects_equatorial(spark):
    with pytest.raises(ValueError, match="lat_ts"):
        crs.PolarStereographic(a=crs.WGS84_A, f=crs.WGS84_F, lat_ts=0.0, lon0=0.0)


def test_dwithin_join_matches_bruteforce(spark):
    """Grid-bucketed within-radius join vs the brute-force haversine
    oracle — seeded random points incl. high latitudes (lon shrink) and
    cross-bucket pairs; no duplicate pairs; guards fire."""
    import random

    rng = random.Random(17)
    a_rows = [
        (i, rng.uniform(-55.0, 55.0), rng.uniform(-179.0, 179.0))
        for i in range(120)
    ]
    b_rows = [
        (j, rng.uniform(-55.0, 55.0), rng.uniform(-179.0, 179.0))
        for j in range(120)
    ]
    # plant guaranteed matches near a few left points, incl. at 54°N
    for k, (i, la, lo) in enumerate(a_rows[:5]):
        b_rows.append((500 + k, la + 0.05, lo + 0.05))
    # plant ANTIMERIDIAN pairs: ±180 must meet in wrapped buckets (the
    # haversine brute force below is inherently wrap-correct)
    a_rows.append((400, 53.0, 179.95))
    b_rows.append((600, 53.2, -179.9))
    a_rows.append((401, -31.0, -179.99))
    b_rows.append((601, -31.1, 179.8))
    a = spark.createDataFrame(a_rows, "id long, lat double, lon double")
    b = spark.createDataFrame(b_rows, "id long, lat double, lon double")
    radius = 50_000.0

    got = {
        (r.id, r.id_r): r.dist_m
        for r in crs.dwithin_join(a, b, radius_m=radius).collect()
    }

    def hav(la1, lo1, la2, lo2):
        R = 6371008.8
        p1, p2 = math.radians(la1), math.radians(la2)
        dphi = math.radians(la2 - la1)
        dl = math.radians(lo2 - lo1)
        x = (
            math.sin(dphi / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 2 * R * math.asin(math.sqrt(x))

    want = {}
    for i, la1, lo1 in a_rows:
        for j, la2, lo2 in b_rows:
            d = hav(la1, lo1, la2, lo2)
            if d <= radius:
                want[(i, j)] = d
    assert set(got) == set(want)
    assert len(want) >= 5  # planted matches actually exercised
    assert (400, 600) in got and (401, 601) in got  # antimeridian pairs
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6

    import pytest

    with pytest.raises(ValueError, match="radius_m"):
        crs.dwithin_join(a, b, radius_m=0.0)
    # right side whose longitude rides a different name: loud ValueError
    # up front, not an unresolved-column AnalysisException mid-plan
    b_badlon = b.withColumnRenamed("lon", "longitude")
    with pytest.raises(ValueError, match="missing coordinate column"):
        crs.dwithin_join(a, b_badlon, radius_m=1000.0)
    polar = spark.createDataFrame(
        [(1, 75.0, 0.0)], "id long, lat double, lon double"
    )
    with pytest.raises(Exception, match="max_abs_lat"):
        crs.dwithin_join(polar, b, radius_m=radius).collect()


def test_tm_osgb_os_worked_example(spark):
    """OS 'A guide to coordinate systems in Great Britain' worked
    example (projection-only, OSGB36 geodetic in): 52°39'27.2531"N,
    1°43'4.5177"E → E 651409.903, N 313177.270 — an INDEPENDENT
    published oracle for the generalized TM series on Airy 1830."""
    P = crs.OSGB_NATIONAL_GRID
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
    x, y = P.project(F.col("lon"), F.col("lat"))
    row = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(row.x - 651409.903) < 0.005
    assert abs(row.y - 313177.270) < 0.005
    # unproject recovers the OSGB36 geodetic point (5e-8° ≈ 5 mm: the
    # forward and inverse series truncate differently 3.7° off the CM,
    # so the round trip carries the mm-level Redfearn residual)
    lon2, lat2 = P.unproject(F.lit(651409.903), F.lit(313177.270))
    row = df.select(lon2.alias("lon"), lat2.alias("lat")).collect()[0]
    assert abs(row.lon - lon) < 5e-8
    assert abs(row.lat - lat) < 5e-8


def test_tm_osgb_epsg_worked_example(spark):
    """EPSG Guidance 7-2 Transverse Mercator worked example (the same
    OSGB parameter set): 50°30'N, 0°30'E → E 577274.99, N 69740.50."""
    P = crs.OSGB_NATIONAL_GRID
    df = spark.createDataFrame([(0.5, 50.5)], "lon double, lat double")
    x, y = P.project(F.col("lon"), F.col("lat"))
    row = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(row.x - 577274.99) < 0.02
    assert abs(row.y - 69740.50) < 0.02


def test_tm_osgb_helmert_full_transform(spark):
    """Full EPSG:27700 through the registry dispatch (Helmert datum
    shift + TM): WGS-84 Edinburgh/London land on their true grid refs
    (±3 m vs OSTN15 truth — the published accuracy of the 7-parameter
    shift), and the round trip closes to the near-inverse's 1e-7°."""
    pts = spark.createDataFrame(
        [(1, -3.1883, 55.9533), (2, 0.1276, 51.5072)],
        "id long, lon double, lat double",
    )
    xy = crs.reproject_pixels(pts, 4326, 27700)
    rows = {r.id: r for r in xy.collect()}
    # Edinburgh city centre ≈ NT 2590 7400; London ≈ TQ 4775 8085
    assert abs(rows[1].lon - 325897.0) < 10.0
    assert abs(rows[1].lat - 674001.0) < 10.0
    back = crs.reproject_pixels(xy, 27700, 4326)
    worst = back.join(
        pts.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-7 and worst.dlat < 1e-7


def test_tm_nztm_invariants_and_roundtrip(spark):
    """NZTM (EPSG:2193): on the central meridian easting == FE exactly
    and northing == FN + k0·M(φ) (numpy meridian-arc twin); a NZ-wide
    grid round-trips through the registry dispatch to 1e-7°."""
    P = crs.NZTM2000
    df = spark.createDataFrame(
        [(173.0, -41.0), (173.0, -36.0)], "lon double, lat double"
    )
    x, y = P.forward(F.col("lon"), F.col("lat"))
    rows = df.select("lat", x.alias("x"), y.alias("y")).collect()
    for r in rows:
        assert abs(r.x - 1_600_000.0) < 1e-6
        want_n = 10_000_000.0 + 0.9996 * P._meridian_arc_py(
            math.radians(r.lat)
        )
        assert abs(r.y - want_n) < 1e-6
    # Wellington sanity: the real NZTM grid puts it near (1 748 800, 5 427 600)
    wgtn = spark.createDataFrame([(174.7772, -41.2889)], "lon double, lat double")
    wx, wy = P.forward(F.col("lon"), F.col("lat"))
    w = wgtn.select(wx.alias("x"), wy.alias("y")).collect()[0]
    assert abs(w.x - 1_748_800) < 5000 and abs(w.y - 5_427_600) < 5000
    grid = spark.range(0, 200, 1, 4).select(
        F.col("id"),
        (F.lit(166.0) + (F.col("id") % 20).cast("double") * 0.65).alias("lon"),
        (F.lit(-47.0) + (F.col("id") / 20).cast("long").cast("double") * 1.4).alias(
            "lat"
        ),
    )
    xy = crs.reproject_pixels(grid, 4326, 2193)
    back = crs.reproject_pixels(xy, 2193, 4326)
    worst = back.join(
        grid.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    # NZTM spans ±7° of its CM — at the 166°E edge the low-order
    # Redfearn truncation leaves ~2e-6° (~15 cm) of fwd/inv mismatch
    # (LINZ's own spec uses higher-order Krüger); well under a pixel.
    assert worst.dlon < 5e-6 and worst.dlat < 5e-6


def test_tm_helmert_matches_numpy_twin(spark):
    """The column-math Helmert chain (geodetic→geocentric→7-param→
    Bowring) against an independent numpy transcription of the OS
    formulas — pins the transcription, not just self-consistency."""
    import numpy as np

    tx, ty, tz, rxs, rys, rzs, ds = -446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421, 20.4894
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rxs, rys, rzs))
    s = 1.0 + ds * 1e-6
    aw, fw = crs.WGS84_A, crs.WGS84_F
    ew2 = fw * (2.0 - fw)
    at, ft = crs.AIRY_A, crs.AIRY_F
    et2 = ft * (2.0 - ft)

    def numpy_shift(lon_d, lat_d):
        phi, lam = math.radians(lat_d), math.radians(lon_d)
        nu = aw / math.sqrt(1.0 - ew2 * math.sin(phi) ** 2)
        X = nu * math.cos(phi) * math.cos(lam)
        Y = nu * math.cos(phi) * math.sin(lam)
        Z = nu * (1.0 - ew2) * math.sin(phi)
        Xp = tx + s * (X - rz * Y + ry * Z)
        Yp = ty + s * (rz * X + Y - rx * Z)
        Zp = tz + s * (-ry * X + rx * Y + Z)
        p = math.hypot(Xp, Yp)
        bt = at * math.sqrt(1.0 - et2)
        ept2 = et2 / (1.0 - et2)
        theta = math.atan2(Zp * at, p * bt)
        phi2 = math.atan2(
            Zp + ept2 * bt * math.sin(theta) ** 3,
            p - et2 * at * math.cos(theta) ** 3,
        )
        return math.degrees(math.atan2(Yp, Xp)), math.degrees(phi2)

    pts = [(-5.5, 50.1), (-3.1883, 55.9533), (1.75, 52.48), (-7.9, 58.2)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    P = crs.OSGB_NATIONAL_GRID
    lon_c, lat_c = P._datum_to(F.col("lon"), F.col("lat"))
    got = df.select("lon", "lat", lon_c.alias("lon2"), lat_c.alias("lat2")).collect()
    for r in got:
        wl, wp = numpy_shift(r.lon, r.lat)
        assert abs(r.lon2 - wl) < 1e-12
        assert abs(r.lat2 - wp) < 1e-12


def test_tm_unregistered_national_grid_still_raises(spark):
    """A TM grid NOT in the registry (e.g. EPSG:32030 state plane or 31370 Belgian Lambert)
    keeps failing loudly — the generalization adds codes explicitly,
    it does not guess parameters."""
    df = spark.createDataFrame([(1, 0.0, 50.0)], "id long, lon double, lat double")
    with pytest.raises(NotImplementedError, match="32030"):
        crs.reproject_pixels(df, 4326, 32030)


def test_standardize_mixed_registry_grids(spark):
    """One standardize_crs expression converts a union mixing UTM,
    Web Mercator, polar stereographic (3413), NZTM (2193), and OSGB
    (27700, incl. the Helmert datum leg) rows — the full mixed-raster-
    estate story, verified against each family's reproject_pixels leg."""
    src = spark.createDataFrame(
        [
            (1, 13.5, 46.0, 32633),
            (2, 10.0, 20.0, 3857),
            (3, -45.0, 75.0, 3413),
            (4, 173.5, -41.0, 2193),
            (6, 10.0, 20.0, 4326),
        ],
        "id long, lon double, lat double, src_epsg int",
    )
    # forward-project each row into its declared CRS via the scalar path
    parts = []
    for epsg in (32633, 3857, 3413, 2193):
        sub = src.filter(F.col("src_epsg") == epsg)
        parts.append(crs.reproject_pixels(sub, 4326, epsg))
    parts.append(src.filter("src_epsg = 4326"))
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.unionByName(p)

    rows = {r.id: r for r in crs.standardize_crs(mixed).collect()}
    want = {r.id: r for r in src.collect()}
    for i, w in want.items():
        got = rows[i]
        assert abs(got.lon - w.lon) < 1e-8, (i, got.lon, w.lon)
        assert abs(got.lat - w.lat) < 1e-8, (i, got.lat, w.lat)
        assert got.src_epsg == 4326
    # datum-shifted grids are per-file territory (reproject_pixels):
    # the per-row branch refuses them loudly rather than ballooning the
    # plan (see standardize_crs registry comment)
    osgb = spark.createDataFrame(
        [(8, 431_000.0, 221_000.0, 27700)],
        "id long, lon double, lat double, src_epsg int",
    )
    with pytest.raises(Exception, match="unsupported src EPSG"):
        crs.standardize_crs(osgb).collect()
    # an unregistered code still fails loudly through the same expression
    bad = spark.createDataFrame(
        [(9, 1.0, 2.0, 31370)], "id long, lon double, lat double, src_epsg int"
    )
    with pytest.raises(Exception, match="unsupported src EPSG"):
        crs.standardize_crs(bad).collect()


def test_irish_grid_invariants_and_roundtrip(spark):
    """EPSG:29902 (TM65 / Irish Grid, Airy Modified + inverted EPSG-1641
    Helmert): on the 8°W central meridian (TM65 geodetic) easting is FE
    exactly and northing is FN + k0·(M(φ)−M(φ0)) via the numpy
    meridian-arc twin; an Ireland-wide WGS-84 grid round-trips through
    the registry dispatch (datum leg both ways) to the near-inverse's
    1e-7°."""
    P = crs.IRISH_GRID
    df = spark.createDataFrame(
        [(-8.0, 52.0), (-8.0, 55.0)], "lon double, lat double"
    )
    x, y = P.project(F.col("lon"), F.col("lat"))  # projection-only legs
    for r in df.select("lat", x.alias("x"), y.alias("y")).collect():
        assert abs(r.x - 200_000.0) < 1e-6
        want_n = 250_000.0 + 1.000035 * (
            P._meridian_arc_py(math.radians(r.lat)) - P.m0_arc
        )
        assert abs(r.y - want_n) < 1e-6
    # createDataFrame (not spark.range+arithmetic): fusing the range
    # lineage into the double TM+Helmert chain plus the max() agg in one
    # codegen stage trips a Spark generated-nested-class access bug
    grid = spark.createDataFrame(
        [
            (i, -10.2 + (i % 10) * 0.5, 51.6 + (i // 10) * 0.4)
            for i in range(100)
        ],
        "id long, lon double, lat double",
    )
    xy = crs.reproject_pixels(grid, 4326, 29902)
    back = crs.reproject_pixels(xy, 29902, 4326)
    worst = back.join(
        grid.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-7 and worst.dlat < 1e-7


def test_standardize_crs_datum_mixed_estate(spark):
    """standardize_crs_datum: one call standardizes an estate mixing
    datum-shifted rows (OSGB 27700 AND Irish 29902 — two codes through
    the single Arrow kernel, masked per code) with datum-free rows
    (NZTM via the JVM CASE) and passthrough 4326 — every row lands back
    on its source coordinates and is restamped."""
    src = spark.createDataFrame(
        [
            (1, -3.1883, 55.9533, 27700),   # Edinburgh
            (2, 0.1276, 51.5072, 27700),    # London
            (3, -6.2603, 53.3498, 29902),   # Dublin
            (4, -9.05, 53.27, 29902),       # Galway
            (5, 173.5, -41.0, 2193),        # NZ (datum-free JVM path)
            (6, 10.0, 20.0, 4326),          # passthrough
        ],
        "id long, lon double, lat double, src_epsg int",
    )
    parts = [src.filter("src_epsg = 4326")]
    for epsg in (27700, 29902, 2193):
        parts.append(
            crs.reproject_pixels(src.filter(F.col("src_epsg") == epsg), 4326, epsg)
        )
    # the repartition is a codegen barrier for the FIXTURE's pathology
    # (forward Helmert+TM chains as in-plan expressions fused with the
    # standardize CASE overflow one Janino method); a real estate scans
    # coordinates from storage and needs no barrier
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.unionByName(p)
    rows = {r.id: r for r in crs.standardize_crs_datum(mixed.repartition(4)).collect()}
    for w in src.collect():
        got = rows[w.id]
        assert abs(got.lon - w.lon) < 1e-6, (w.id, got.lon, w.lon)
        assert abs(got.lat - w.lat) < 1e-6, (w.id, got.lat, w.lat)
        assert got.src_epsg == 4326
    # unknown codes still die loudly (datum-free path's raise_error)
    bad = spark.createDataFrame(
        [(9, 1.0, 2.0, 31370)], "id long, lon double, lat double, src_epsg int"
    )
    with pytest.raises(Exception, match="unsupported src EPSG"):
        crs.standardize_crs_datum(bad).collect()
    with pytest.raises(ValueError, match="4326 only"):
        crs.standardize_crs_datum(src, dst_epsg=3857)


def test_standardize_crs_datum_kernel_matches_jvm_chain(spark):
    """The Arrow kernel's numpy math is a term-for-term twin of the JVM
    column chain: for identical OSGB easting/northing rows, kernel output
    equals reproject_pixels(27700→4326) to float64 round-off."""
    xy = spark.createDataFrame(
        [(1, 325897.0, 674001.0, 27700), (2, 531000.0, 180000.0, 27700)],
        "id long, lon double, lat double, src_epsg int",
    )
    via_kernel = {r.id: r for r in crs.standardize_crs_datum(xy).collect()}
    via_jvm = {
        r.id: r
        for r in crs.reproject_pixels(xy.drop("src_epsg"), 27700, 4326).collect()
    }
    for i in (1, 2):
        assert abs(via_kernel[i].lon - via_jvm[i].lon) < 1e-12
        assert abs(via_kernel[i].lat - via_jvm[i].lat) < 1e-12


# --- Krovak (EPSG:5514, round-10 addition) ------------------------------------


def test_krovak_epsg_worked_example(spark):
    """EPSG Guidance Note 7-2 Krovak worked example (S-JTSK geodetic
    in, projection-only): 50°12'32.4416"N 16°50'59.1790"E →
    southing X = 1050538.63, westing Y = 568991.00 (East-North
    orientation: E = −Y, N = −X). Matches to ~1.5 cm (the published
    example rounds its intermediate terms)."""
    P = crs.SJTSK_KROVAK
    df = spark.createDataFrame(
        [(16 + 50 / 60 + 59.1790 / 3600, 50 + 12 / 60 + 32.4416 / 3600)],
        "lon double, lat double",
    )
    x, y = P.project(F.col("lon"), F.col("lat"))
    row = df.select(x.alias("e"), y.alias("n")).collect()[0]
    assert abs(row.e - (-568991.00)) < 0.05
    assert abs(row.n - (-1050538.63)) < 0.05


def test_krovak_full_transform_and_roundtrip(spark):
    """Full EPSG:5514 through the registry dispatch (Helmert datum leg
    both ways): Prague city centre lands on its known grid ref (±3 m,
    the 3-translation transformation's accuracy class), and a
    CZ/SK-wide grid round-trips to the near-inverse's 1e-7°."""
    pts = spark.createDataFrame(
        [(1, 14.4187, 50.0874)], "id long, lon double, lat double"
    )
    xy = crs.reproject_pixels(pts, 4326, 5514)
    row = xy.collect()[0]
    assert abs(row.lon - (-743000.0)) < 15.0
    assert abs(row.lat - (-1043000.0)) < 15.0
    grid = spark.createDataFrame(
        [
            (i, 13.1 + (i % 10) * 0.55, 48.65 + (i // 10) * 0.24)
            for i in range(100)
        ],
        "id long, lon double, lat double",
    )
    fwd = crs.reproject_pixels(grid, 4326, 5514)
    back = crs.reproject_pixels(fwd, 5514, 4326)
    worst = back.join(
        grid.withColumnsRenamed({"lon": "lon0", "lat": "lat0"}), "id"
    ).selectExpr(
        "max(abs(lon - lon0)) AS dlon", "max(abs(lat - lat0)) AS dlat"
    ).collect()[0]
    assert worst.dlon < 1e-7 and worst.dlat < 1e-7


def test_standardize_datum_null_epsg_raises(spark):
    """NULL src_epsg must die loudly (ADVICE r10): isin() is NULL for
    NULL input, so without explicit routing the row would vanish between
    the two complementary filters. The NULL row now reaches the
    datum-free branch's raise_error OTHERWISE, with a non-NULL message
    (coalesce keeps the concat legible)."""
    df = spark.createDataFrame(
        [(1, -3.1883, 55.9533, 27700), (2, 1.0, 2.0, None)],
        "id long, lon double, lat double, src_epsg int",
    )
    with pytest.raises(Exception, match="unsupported src EPSG: NULL"):
        crs.standardize_crs_datum(df).collect()


def test_standardize_crs_datum_three_codes_one_kernel(spark):
    """OSGB + Irish + Krovak rows in ONE standardize_crs_datum call —
    three datum-shifted codes through the single Arrow kernel,
    including the non-TM family via its inverse_np twin."""
    src = spark.createDataFrame(
        [
            (1, -3.1883, 55.9533, 27700),
            (2, -6.2603, 53.3498, 29902),
            (3, 14.4187, 50.0874, 5514),
            (4, 10.0, 20.0, 4326),
        ],
        "id long, lon double, lat double, src_epsg int",
    )
    parts = [src.filter("src_epsg = 4326")]
    for epsg in (27700, 29902, 5514):
        parts.append(
            crs.reproject_pixels(src.filter(F.col("src_epsg") == epsg), 4326, epsg)
        )
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.unionByName(p)
    rows = {r.id: r for r in crs.standardize_crs_datum(mixed.repartition(4)).collect()}
    for w in src.collect():
        got = rows[w.id]
        assert abs(got.lon - w.lon) < 1e-6, (w.id, got.lon, w.lon)
        assert abs(got.lat - w.lat) < 1e-6, (w.id, got.lat, w.lat)
        assert got.src_epsg == 4326
