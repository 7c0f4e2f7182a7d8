"""polygonize_occupancy closed-form checks: 4-adjacency (not 8), lon wrap,
min_count mask, deterministic region ids."""

from pyspark.sql import functions as F

from geowave_spark.functions import cells as C
from geowave_spark.operators import vectorize as OV

RES = 4  # 16x16 world grid: lon cell = 22500 milli, lat cell = 11250 milli


def _pt(gx, gy):
    """One point in the middle of grid cell (gx, gy) at RES."""
    lon = -180_000 + gx * (C.LON_SPAN_MILLI // (1 << RES)) + 1000
    lat = -90_000 + gy * (C.LAT_SPAN_MILLI // (1 << RES)) + 1000
    return (lon, lat)


def _regions(spark, cells, min_count=1):
    pts = [_pt(gx, gy) for gx, gy, k in cells for _ in range(k)]
    df = spark.createDataFrame(pts, "lon_milli long, lat_milli long")
    rows = OV.polygonize_occupancy(df, res=RES, min_count=min_count).collect()
    return {
        r.region_id: (r.n_cells, r.n_points, r.gx_min, r.gx_max, r.gy_min, r.gy_max)
        for r in rows
    }


def test_diagonal_cells_do_not_merge(spark):
    # (2,2) and (3,3) touch only at a corner: two regions, not one
    got = _regions(spark, [(2, 2, 1), (3, 3, 1), (5, 2, 1), (5, 3, 1)])
    assert len(got) == 3
    # the vertical pair merged; ids are the min packed member
    pid = lambda gx, gy: gx * (1 << 32) + gy
    assert got[pid(5, 2)] == (2, 2, 5, 5, 2, 3)
    assert got[pid(2, 2)][0] == 1 and got[pid(3, 3)][0] == 1


def test_lon_wrap_merges_antimeridian_region(spark):
    # gx 15 and gx 0 are east-neighbors on the wrapped grid
    got = _regions(spark, [(15, 8, 1), (0, 8, 1)])
    assert len(got) == 1
    ((n_cells, n_points, gx0, gx1, gy0, gy1),) = got.values()
    assert (n_cells, n_points) == (2, 2)
    assert (gx0, gx1) == (0, 15)  # raw min/max across the seam (disclosed)


def test_min_count_masks_sparse_cells(spark):
    # a 3-cell strip where the middle cell is below min_count: splits in two
    got = _regions(spark, [(4, 4, 3), (5, 4, 1), (6, 4, 3)], min_count=2)
    assert len(got) == 2
    assert all(v[0] == 1 and v[1] == 3 for v in got.values())
