"""Hex binning: kernel vs brute force, Catalyst twin parity, operator
semantics, and the two-candidate-rows proof obligation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import cols as X
from geowave_spark.functions import hexgrid as HG
from geowave_spark.operators import hexbin as HXB

RNG = np.random.default_rng(20260820)


@pytest.mark.parametrize("res", [0, 2, 5, 8, HG.MAX_RES])
def test_kernel_matches_brute_force(res):
    lon = RNG.integers(-180_000, 180_000, 800)
    lat = RNG.integers(-90_000, 90_000, 800)
    i, j, hid = HG.hex_assign(lon, lat, res)
    assert hid.max() < HG.PACK
    n_i = HG.ni(res)
    assert (hid == j * n_i + i).all()
    for t in range(0, 800, 17):
        bi, bj = HG.brute_force_assign(
            int(lon[t]) + HG.X_OFF, int(lat[t]) + HG.Y_OFF, res
        )
        assert (bi, bj) == (int(i[t]), int(j[t]))


@pytest.mark.parametrize("res", [0, 6])
def test_lattice_boundary_points(res):
    """Points exactly on row/column midlines (the tie locations) still
    agree with brute force — the packed-key tie-break is the contract."""
    w, h = HG.wh(res)
    bi, bj = 4, 3  # base lattice cell well inside the world box at res 0
    xs, ys = [], []
    for m in range(-3, 4):
        xs += [(bi + m) * w + w // 2, (bi + m) * w]
        ys += [(bj + m) * h + h // 2, (bj + m) * h]
    xs = [x for x in xs if 0 <= x <= 2 * HG.X_OFF]
    ys = [y for y in ys if 0 <= y <= 2 * HG.Y_OFF]
    xg, yg = np.array(np.meshgrid(xs, ys)).reshape(2, -1)
    lon, lat = xg - HG.X_OFF, yg - HG.Y_OFF
    i, j, _ = HG.hex_assign(lon, lat, res)
    for t in range(len(lon)):
        bi, bj = HG.brute_force_assign(
            int(lon[t]) + HG.X_OFF, int(lat[t]) + HG.Y_OFF, res
        )
        assert (bi, bj) == (int(i[t]), int(j[t]))


def test_assignment_is_nearest_center():
    """Voronoi property: the assigned center is no farther than any of the
    assigned hex's 6 neighbors' centers."""
    res = 4
    lon = RNG.integers(-170_000, 170_000, 500)
    lat = RNG.integers(-80_000, 80_000, 500)
    i, j, _ = HG.hex_assign(lon, lat, res)
    cx, cy = HG.hex_center_milli(i, j, res)
    d_own = (lon - cx) ** 2 + (lat - cy) ** 2
    for t in range(0, 500, 11):
        for ni_, nj_ in HG.neighbors(int(i[t]), int(j[t])):
            nx, ny = HG.hex_center_milli(ni_, nj_, res)
            d_n = (int(lon[t]) - int(nx)) ** 2 + (int(lat[t]) - int(ny)) ** 2
            assert d_own[t] <= d_n


def test_neighbor_symmetry_and_count():
    for _ in range(200):
        i0 = int(RNG.integers(1, 2000))
        j0 = int(RNG.integers(1, 2000))
        ns = HG.neighbors(i0, j0)
        assert len(set(ns)) == 6
        for n in ns:
            assert (i0, j0) in HG.neighbors(*n)


def test_col_twin_matches_kernel(spark):
    res = 6
    lon = RNG.integers(-180_000, 180_000, 2000)
    lat = RNG.integers(-90_000, 90_000, 2000)
    ki, kj, _ = HG.hex_assign(lon, lat, res)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(lon, lat)], "lon_milli long, lat_milli long"
    )
    out = (
        HXB.hex_assign(df, res)
        .select("lon_milli", "lat_milli", "hex_i", "hex_j")
        .toPandas()
        .sort_values(["lon_milli", "lat_milli"])
    )
    order = np.lexsort((lat, lon))
    assert (out.hex_i.to_numpy() == ki[order]).all()
    assert (out.hex_j.to_numpy() == kj[order]).all()


def test_hex_density_partitions_rows(spark):
    res = 5
    lon = RNG.integers(-180_000, 180_000, 3000)
    lat = RNG.integers(-90_000, 90_000, 3000)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(lon, lat)], "lon_milli long, lat_milli long"
    )
    d = HXB.hex_density(df, res).toPandas()
    assert d.cnt.sum() == 3000
    # exactly the kernel's occupied set
    _, _, hid = HG.hex_assign(lon, lat, res)
    n_i = HG.ni(res)
    assert set(d.hex_j * n_i + d.hex_i) == set(hid.tolist())
    # centers decode exactly
    cx, cy = HG.hex_center_milli(d.hex_i.to_numpy(), d.hex_j.to_numpy(), res)
    assert (d.lon_c.to_numpy() == cx).all() and (d.lat_c.to_numpy() == cy).all()


def test_hex_smooth_ring_sums(spark):
    """Constructed case: one point per hex in a known 7-hex flower plus an
    isolated hex far away — ring counts are exact neighbor sums."""
    res = 4
    ctr = (50, 51)  # odd row, well inside the res-4 world grid
    flower = [ctr] + HG.neighbors(*ctr)
    iso = (120, 90)
    rows = []
    for i, j in flower + [iso]:
        x, y = HG.hex_center_milli(np.array([i]), np.array([j]), res)
        rows.append((int(x[0]), int(y[0])))
    df = spark.createDataFrame(rows, "lon_milli long, lat_milli long")
    d = HXB.hex_density(df, res)
    s = HXB.hex_smooth(d).toPandas().set_index(["hex_i", "hex_j"])
    assert s.loc[ctr].ring_cnt == 7  # full flower
    assert s.loc[iso].ring_cnt == 1  # isolated
    for n in HG.neighbors(*ctr):
        # each petal sees: itself + center + the 2 adjacent petals = 4
        assert s.loc[n].ring_cnt == 4
    assert (s.cnt == 1).all()


def test_two_candidate_rows_suffice_bound():
    """The analytic condition behind the 2-row argmin: H² > (W/2)² at
    every resolution (hexgrid.py proof) — pinned so a future ladder edit
    that breaks the bound fails here, not as silent misassignment."""
    for res in range(HG.MAX_RES + 1):
        w, h = HG.wh(res)
        assert h * h > (w // 2) ** 2
        assert w % 2 == 0
