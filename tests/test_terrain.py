"""Terrain operators (gdaladdo/gdaldem parity): numpy oracles for
overview pyramids and Horn derivatives, analytic anchors for slope/
aspect/hillshade, nodata and edge contracts, input guards."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sids_data_pipeline_spark.operators.terrain import (
    build_overviews,
    hillshade,
    horn_derivatives,
    slope_aspect,
)
from sids_data_pipeline_spark.sources.raster import (
    GRID_N,
    numpy_pixels,
    synthetic_raster,
)


def _grid(raster_id: str) -> np.ndarray:
    px = numpy_pixels(raster_id)
    g = np.full((GRID_N, GRID_N), np.nan)
    g[px["y"].to_numpy(), px["x"].to_numpy()] = px["val"].to_numpy()
    return g


@pytest.mark.parametrize("raster_id", ["rast_gradient", "rast_nodata"])
def test_overviews_match_numpy(spark, raster_id):
    got = {
        (r.level, r.x, r.y): (r.val, r.n_px)
        for r in build_overviews(synthetic_raster(spark, raster_id), levels=3).collect()
    }
    g = _grid(raster_id)
    want = {}
    for level in (1, 2, 3):
        k = 1 << level
        for by in range(GRID_N // k):
            for bx in range(GRID_N // k):
                block = g[by * k : (by + 1) * k, bx * k : (bx + 1) * k]
                vals = block[~np.isnan(block)]
                if len(vals):
                    want[(level, bx, by)] = (float(vals.mean()), len(vals))
    assert set(got) == set(want)
    for key, (v, n) in want.items():
        assert got[key][1] == n
        assert got[key][0] == pytest.approx(v, abs=1e-9)


def test_overviews_edge_blocks(spark):
    """A 63×63 clip leaves partial edge blocks: n_px reports the true
    contributor count and the mean covers only existing pixels."""
    px = synthetic_raster(spark, "rast_gradient").filter(
        (F.col("x") < 63) & (F.col("y") < 63)
    )
    rows = {(r.x, r.y): r for r in build_overviews(px, levels=1).collect()}
    assert rows[(31, 31)].n_px == 1  # lone corner pixel
    assert rows[(31, 0)].n_px == 2
    assert rows[(0, 0)].n_px == 4
    assert rows[(31, 31)].val == float(62 + 64 * 62)


def test_overviews_guard(spark):
    with pytest.raises(ValueError, match="levels"):
        build_overviews(synthetic_raster(spark, "rast_gradient"), levels=0)


def _numpy_horn(g: np.ndarray, cellsize: float):
    out = {}
    n = g.shape[0]
    for cy in range(1, n - 1):
        for cx in range(1, n - 1):
            win = g[cy - 1 : cy + 2, cx - 1 : cx + 2]
            if np.isnan(win).any():
                continue
            # +y = north: win[2] is the northern row (y = cy + 1)
            a, b, c = win[2, 0], win[2, 1], win[2, 2]
            d, _, f = win[1, 0], win[1, 1], win[1, 2]
            gg, h, i = win[0, 0], win[0, 1], win[0, 2]
            dzdx = ((c + 2 * f + i) - (a + 2 * d + gg)) / (8 * cellsize)
            dzdy = ((a + 2 * b + c) - (gg + 2 * h + i)) / (8 * cellsize)
            out[(cx, cy)] = (dzdx, dzdy)
    return out


@pytest.fixture(scope="module")
def quad(spark):
    """Quadratic surface: val = (x² + 2y² + xy) / 16 — non-constant
    derivatives everywhere."""
    n = GRID_N
    return spark.range(0, n * n, 1, 8).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    ).withColumn(
        "val",
        (F.col("x") * F.col("x") + 2 * F.col("y") * F.col("y")
         + F.col("x") * F.col("y")).cast("double") / 16.0,
    )


def _numpy_quad() -> np.ndarray:
    y, x = np.mgrid[0:GRID_N, 0:GRID_N]
    return (x * x + 2.0 * y * y + x * y) / 16.0


def test_horn_matches_numpy(spark, quad):
    got = {
        (r.x, r.y): (r.dzdx, r.dzdy)
        for r in horn_derivatives(quad, cellsize=30.0).collect()
    }
    want = _numpy_horn(_numpy_quad(), 30.0)
    assert set(got) == set(want)
    for k, (px, py) in want.items():
        assert got[k][0] == pytest.approx(px, abs=1e-12)
        assert got[k][1] == pytest.approx(py, abs=1e-12)


def test_horn_nodata_windows_omitted(spark):
    """Any window touching a NULL pixel (or the edge) emits nothing —
    gdaldem's default nodata contract."""
    got = horn_derivatives(
        synthetic_raster(spark, "rast_nodata"), cellsize=30.0
    ).collect()
    g = _grid("rast_nodata")
    want = _numpy_horn(g, 30.0)
    assert {(r.x, r.y) for r in got} == set(want)


def test_flat_surface_slope_zero_aspect_null(spark):
    n = 8
    flat = spark.range(0, n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
        F.lit(5.0).alias("val"),
    )
    rows = slope_aspect(flat, cellsize=30.0).collect()
    assert len(rows) == (n - 2) * (n - 2)
    for r in rows:
        assert r.slope_deg == 0.0
        assert r.aspect_deg is None
    hs = hillshade(flat, cellsize=30.0, altitude_deg=45.0).collect()
    for r in hs:
        assert r.hillshade == pytest.approx(255.0 * math.cos(math.radians(45.0)))


def test_planar_east_slope_aspect(spark):
    """val = x·c (rises eastward): the face looks WEST (aspect 270°,
    steepest-descent direction) and slope = atan(1) = 45° when the rise
    equals the cellsize."""
    n = 8
    cell = 30.0
    plane = spark.range(0, n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
        ((F.col("id") % n).cast("double") * cell).alias("val"),
    )
    rows = slope_aspect(plane, cellsize=cell).collect()
    for r in rows:
        assert r.slope_deg == pytest.approx(45.0, abs=1e-9)
        assert r.aspect_deg == pytest.approx(270.0, abs=1e-9)


def test_hillshade_sun_alignment(spark):
    """The east-rising plane faces west: a WEST sun at 45° hits the
    45°-slope face dead-on (255) and an EAST sun grazes along it (0) —
    sign check on the aspect term (an ascent-convention bug swaps them)."""
    n = 8
    cell = 30.0
    plane = spark.range(0, n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
        ((F.col("id") % n).cast("double") * cell).alias("val"),
    )
    def shade(azimuth):
        rows = hillshade(plane, cellsize=cell, azimuth_deg=azimuth,
                         altitude_deg=45.0).collect()
        vals = {r.hillshade for r in rows}
        assert len(vals) == 1
        return vals.pop()

    east, west = shade(90.0), shade(270.0)
    # slope 45°, altitude 45°: west sun hits the face dead-on…
    assert west == pytest.approx(255.0, abs=1e-9)
    # …and the east sun grazes along it (cos45·cos45 − sin45·sin45 = 0)
    assert east == pytest.approx(0.0, abs=1e-9)


def test_guards(spark, quad):
    with pytest.raises(ValueError, match="cellsize"):
        horn_derivatives(quad, cellsize=0.0)


# --- clump / sieve -------------------------------------------------------------

from sids_data_pipeline_spark.operators.terrain import clump_regions, sieve  # noqa: E402


def _numpy_clump(vals: dict[tuple[int, int], float]) -> dict[tuple[int, int], int]:
    """Union-find oracle: 4-connected equal-value regions, label = min
    packed id ((y << 32) | x). Shares no code with the operator."""
    parent: dict[tuple[int, int], tuple[int, int]] = {p: p for p in vals}

    def find(p):
        while parent[p] != p:
            parent[p] = parent[parent[p]]
            p = parent[p]
        return p

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for (x, y), v in vals.items():
        for nb in ((x + 1, y), (x, y + 1)):
            if nb in vals and vals[nb] == v:
                union((x, y), nb)
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for p in vals:
        groups.setdefault(find(p), []).append(p)
    out = {}
    for members in groups.values():
        label = min((y << 32) | x for x, y in members)
        for p in members:
            out[p] = label
    return out


@pytest.fixture(scope="module")
def speckled(spark):
    """16×16: val 0 background, val 1 at isolated pixels and one 2×2
    patch, a NULL hole — singletons, a small region, and a big region."""
    n = 16

    def val_of(x, y):
        if (x, y) == (5, 5):
            return None
        if (x, y) in ((2, 2), (9, 13)):
            return 1.0
        if (x, y) in ((12, 3), (13, 3), (12, 4), (13, 4)):
            return 1.0
        return 0.0

    rows = [
        (x, y, val_of(x, y)) for y in range(n) for x in range(n)
    ]
    df = spark.createDataFrame(rows, "x int, y int, val double")
    vals = {(x, y): v for x, y, v in rows if v is not None}
    return df, vals


def test_clump_matches_union_find(spark, speckled):
    df, vals = speckled
    got = {(r.x, r.y): r.region for r in clump_regions(df).collect()}
    want = _numpy_clump(vals)
    assert got == want


def test_clump_checker_all_singletons(spark):
    """The checkerboard has NO equal 4-neighbours: every pixel is its own
    region, labelled by its own packed id."""
    px = synthetic_raster(spark, "rast_checker").filter(
        (F.col("x") < 8) & (F.col("y") < 8)
    )
    rows = clump_regions(px).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.region == (r.y << 32) | r.x


def test_sieve_masks_small_regions(spark, speckled):
    df, vals = speckled
    out = {(r.x, r.y): r.val for r in sieve(df, min_size=3).collect()}
    # isolated val-1 pixels sieved; the 2×2 patch (size 4) survives
    assert out[(2, 2)] is None and out[(9, 13)] is None
    assert out[(12, 3)] == 1.0 and out[(13, 4)] == 1.0
    # background untouched, NULL input stays NULL
    assert out[(0, 0)] == 0.0
    assert out[(5, 5)] is None
    with pytest.raises(ValueError, match="min_size"):
        sieve(df, min_size=0)


# --- proximity ------------------------------------------------------------------

from sids_data_pipeline_spark.operators.terrain import proximity  # noqa: E402


def test_proximity_matches_bruteforce(spark):
    """Targets on a 16-step lattice over the 64-grid; brute-force min
    distance per pixel is the oracle. max_distance=6 exercises both the
    radius cut and bucket-boundary candidates."""
    px = synthetic_raster(spark, "rast_gradient")
    got = {
        (r.x, r.y): r.dist
        for r in proximity(
            px,
            target=(F.col("x") % 16 == 0) & (F.col("y") % 16 == 0),
            max_distance=6.0,
        ).collect()
    }
    targets = [(tx, ty) for tx in range(0, 64, 16) for ty in range(0, 64, 16)]
    want = {}
    for y in range(64):
        for x in range(64):
            d = min(
                math.hypot(x - tx, y - ty) for tx, ty in targets
            )
            if d <= 6.0:
                want[(x, y)] = d
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_proximity_nodata_targets_excluded(spark):
    """A target pixel whose val is NULL is not a target (gdal computes
    proximity on the mask of VALID target values)."""
    px = synthetic_raster(spark, "rast_nodata")  # NULL where (x*y)%7==0
    got = proximity(
        px,
        target=(F.col("x") == 7) & (F.col("y") == 7),  # (7*7)%7==0 → NULL
        max_distance=3.0,
    )
    assert got.count() == 0


def test_proximity_cellsize_scales_distance(spark):
    px = synthetic_raster(spark, "rast_gradient")
    got = {
        (r.x, r.y): r.dist
        for r in proximity(
            px,
            target=(F.col("x") == 10) & (F.col("y") == 10),
            max_distance=90.0,
            cellsize=30.0,
        ).collect()
    }
    assert got[(10, 10)] == 0.0
    assert got[(13, 10)] == pytest.approx(90.0)
    assert (14, 10) not in got  # 120 m > maxdist
    with pytest.raises(ValueError, match="max_distance"):
        proximity(px, target=F.col("x") == 0, max_distance=0.0)


def test_overviews_rejects_wrapping_shift(spark):
    """JVM shift counts wrap mod 32: levels > 30 must refuse, not alias."""
    with pytest.raises(ValueError, match=r"\[1, 30\]"):
        build_overviews(synthetic_raster(spark, "rast_gradient"), levels=32)


def test_clump_max_iter_raises_not_partial(spark):
    """An exhausted boundary-CC budget must raise (no partial labels):
    an 80-px line over tile=8 is a 10-label seam chain, far past a
    2-round budget. The tile-local phase alone must NOT mask the bound."""
    line = spark.createDataFrame(
        [(x, 0, 1.0) for x in range(80)], "x int, y int, val double"
    )
    with pytest.raises(RuntimeError, match="converge"):
        clump_regions(line, max_iter=2, tile=8).collect()
    # and succeeds with an adequate bound
    rows = clump_regions(line, max_iter=60, tile=8).collect()
    assert {r.region for r in rows} == {0}


def test_clump_deep_label_chain_across_tiles(spark):
    """Deep-label-chain fixture: a serpentine 1-px region snaking across
    MANY tiles (every seam crossing becomes a boundary-graph node, and
    the chain's label-graph diameter exceeds the propagation budget, so
    the star phase must finish it). Oracle: the union-find twin."""
    rows = []
    width, rows_n, t = 40, 6, 4  # 10 tiles across, 2 down at tile=4
    for ry in range(rows_n):
        y = ry * 2
        for x in range(width):
            rows.append((x, y, 1.0))
        # one connector at alternating ends joins row to the next
        if ry + 1 < rows_n:
            cx = width - 1 if ry % 2 == 0 else 0
            rows.append((cx, y + 1, 1.0))
    df = spark.createDataFrame(rows, "x int, y int, val double")
    got = {(r.x, r.y): r.region for r in clump_regions(df, tile=t).collect()}
    want = _numpy_clump({(x, y): v for x, y, v in rows})
    assert got == want
    assert len(set(got.values())) == 1  # one serpentine region


def test_clump_tile_seams_match_union_find(spark, speckled):
    """The same speckled fixture labelled at tile=4 (regions straddling
    seams) must agree with the single-tile default."""
    df, vals = speckled
    got = {(r.x, r.y): r.region for r in clump_regions(df, tile=4).collect()}
    assert got == _numpy_clump(vals)


def test_group_cols_estate_matches_per_raster(spark):
    """Multi-raster estate in ONE shuffle: group_cols=('raster_id',)
    must equal running each raster alone — including at raster seams
    (windows/blocks never mix rasters)."""
    a = synthetic_raster(spark, "rast_gradient")
    b = synthetic_raster(spark, "rast_checker")
    estate = a.unionByName(b)

    got_hs = {
        (r.raster_id, r.x, r.y): r.hillshade
        for r in hillshade(
            estate, cellsize=30.0, group_cols=("raster_id",)
        ).collect()
    }
    want_hs = {}
    for rid, px in (("rast_gradient", a), ("rast_checker", b)):
        for r in hillshade(px, cellsize=30.0).collect():
            want_hs[(rid, r.x, r.y)] = r.hillshade
    assert got_hs == want_hs

    got_ov = {
        (r.raster_id, r.level, r.x, r.y): (r.val, r.n_px)
        for r in build_overviews(
            estate, levels=2, group_cols=("raster_id",)
        ).collect()
    }
    want_ov = {}
    for rid, px in (("rast_gradient", a), ("rast_checker", b)):
        for r in build_overviews(px, levels=2).collect():
            want_ov[(rid, r.level, r.x, r.y)] = (r.val, r.n_px)
    assert got_ov == want_ov


def test_sieve_fill_merges_into_largest_neighbor(spark, speckled):
    """fill=True: the isolated val-1 pixels and the 2x2 patch (if below
    threshold) take the background value; an isolated-by-nodata small
    region falls back to the mask."""
    df, vals = speckled
    out = {(r.x, r.y): r.val for r in sieve(df, min_size=3, fill=True).collect()}
    # isolated speckles filled with the background (their only neighbor)
    assert out[(2, 2)] == 0.0 and out[(9, 13)] == 0.0
    # the 2x2 patch (size 4 >= 3) survives untouched
    assert out[(12, 3)] == 1.0 and out[(13, 4)] == 1.0
    # background and NULL input unchanged
    assert out[(0, 0)] == 0.0 and out[(5, 5)] is None
    # raise threshold past the patch: it merges into the background too
    out2 = {
        (r.x, r.y): r.val for r in sieve(df, min_size=5, fill=True).collect()
    }
    assert out2[(12, 3)] == 0.0 and out2[(13, 4)] == 0.0


def test_sieve_fill_no_neighbor_masks(spark):
    """A small region surrounded entirely by NULLs has no neighbour to
    merge into — fill falls back to the mask."""
    rows = []
    for y in range(5):
        for x in range(5):
            if (x, y) == (2, 2):
                rows.append((x, y, 7.0))
            else:
                rows.append((x, y, None))
    df = spark.createDataFrame(rows, "x int, y int, val double")
    out = {(r.x, r.y): r.val for r in sieve(df, min_size=2, fill=True).collect()}
    assert out[(2, 2)] is None


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_clump_random_grids_match_union_find(spark, seed):
    """Seeded random 12×12 grids (3 values + NULLs): clump must match
    the union-find oracle exactly — random shapes exercise region
    topologies (nested, touching-at-corners, fragmented) the fixed
    fixtures cannot."""
    import random

    rng = random.Random(seed)
    n = 12
    rows = []
    for y in range(n):
        for x in range(n):
            v = rng.choice([0.0, 1.0, 2.0, None])
            rows.append((x, y, v))
    df = spark.createDataFrame(rows, "x int, y int, val double")
    vals = {(x, y): v for x, y, v in rows if v is not None}
    got = {(r.x, r.y): r.region for r in clump_regions(df).collect()}
    assert got == _numpy_clump(vals)


def test_proximity_dense_targets_all_zero(spark):
    """Every pixel a target → every pixel at distance 0 (the degenerate
    density the docstring calls out still returns the right answer)."""
    px = synthetic_raster(spark, "rast_gradient").filter(
        (F.col("x") < 8) & (F.col("y") < 8)
    )
    rows = proximity(px, target=F.lit(True), max_distance=2.0).collect()
    assert len(rows) == 64
    assert all(r.dist == 0.0 for r in rows)
