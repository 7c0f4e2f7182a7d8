"""S2-analogue cells: id-algebra invariants, kernel vs brute force,
Catalyst twin parity, covering exactness, range merging, and the stored-
leaf parquet pushdown contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.functions import cols as X
from geowave_spark.functions import s2cells as S2
from geowave_spark.operators import s2 as OP

RNG = np.random.default_rng(20260820)


def _points(n=2000):
    lon = RNG.integers(-180_000, 180_001, n)
    lat = RNG.integers(-90_000, 90_001, n)
    return lon, lat


# ---------------------------------------------------------------------------
# id algebra
# ---------------------------------------------------------------------------

def test_leaf_level_and_roundtrip():
    lon, lat = _points()
    leaf = S2.leaf_id(lon, lat)
    assert (leaf & 1 == 1).all()  # sentinel at bit 0
    assert (S2.level_of(leaf) == S2.MAX_LEVEL).all()
    face, iu, iv, lvl = S2.decode(leaf)
    assert (lvl == S2.MAX_LEVEL).all()
    assert np.array_equal(S2.cell_id(face, iu, iv, S2.MAX_LEVEL), leaf)


def test_face_chart_partition():
    """Every world point lands on exactly one face, and chart coords stay
    inside the face's span box (the half-open chart contract)."""
    lon, lat = _points()
    face, u, v = S2.face_uv(lon, lat)
    us, vs = S2.face_spans(face)
    assert ((u >= 0) & (u < us)).all()
    assert ((v >= 0) & (v < vs)).all()
    # chart inverse returns the point for equatorial faces (exact) and
    # stays within quantization distance on the clamped cap edges
    ilon, ilat = S2.chart_to_lonlat(face, u, v)
    eq = face < 4
    assert np.array_equal(ilon[eq], lon[eq])
    assert np.array_equal(ilat[eq], lat[eq])


@pytest.mark.parametrize("level", [0, 3, 10, S2.MAX_LEVEL - 1])
def test_parent_contains_leaf_range(level):
    """Contiguity invariant: a leaf id is inside its every ancestor's
    [range_min, range_max] interval — spatial containment IS integer
    range containment."""
    lon, lat = _points()
    leaf = S2.leaf_id(lon, lat)
    par = S2.parent(leaf, level)
    assert (S2.level_of(par) == level).all()
    assert (S2.range_min(par) <= leaf).all()
    assert (leaf <= S2.range_max(par)).all()
    # parent is idempotent and monotone up the tree
    assert np.array_equal(S2.parent(par, level), par)
    if level > 0:
        gp = S2.parent(leaf, level - 1)
        assert (S2.range_min(gp) <= S2.range_min(par)).all()
        assert (S2.range_max(par) <= S2.range_max(gp)).all()


def test_children_tile_parent_range():
    """The 4 children partition the parent's leaf interval exactly."""
    cid = int(S2.parent(S2.leaf_id(np.array([12_345]), np.array([6_789])), 7)[0])
    kids = np.sort(S2.children(cid))
    assert (S2.level_of(kids) == 8).all()
    lo, hi = S2.range_min(kids), S2.range_max(kids)
    assert int(lo[0]) == int(S2.range_min(np.array([cid]))[0])
    assert int(hi[-1]) == int(S2.range_max(np.array([cid]))[0])
    assert (lo[1:] == hi[:-1] + 2).all()  # adjacent (leaf ids are odd)


def test_siblings_disjoint_ranges():
    lon, lat = _points(500)
    cells = np.unique(S2.parent(S2.leaf_id(lon, lat), 6))
    lo = np.sort(S2.range_min(cells))
    hi = np.sort(S2.range_max(cells))
    assert (lo[1:] > hi[:-1]).all()


def test_cell_box_roundtrip():
    """Every point's level-L cell footprint contains the point."""
    lon, lat = _points(800)
    for level in (2, 9):
        cell = S2.parent(S2.leaf_id(lon, lat), level)
        lo_lon, lo_lat, hi_lon, hi_lat = S2.cell_box_milli(cell)
        assert ((lo_lon <= lon) & (lon <= hi_lon)).all()
        assert ((lo_lat <= lat) & (lat <= hi_lat)).all()


# ---------------------------------------------------------------------------
# covering
# ---------------------------------------------------------------------------

BOXES = [
    (-76_000, 40_000, -72_000, 47_000),  # crosses the north-cap seam
    (-10_000, -50_000, 15_000, -46_000),  # south cap + equator band
    (89_000, -1_000, 91_000, 1_000),  # face 2/3 seam
    (-180_000, -90_000, 180_000, 90_000),  # whole world
    (10_000, 10_000, 10_000, 10_000),  # degenerate point box
]


@pytest.mark.parametrize("box", BOXES)
def test_covering_exact_membership(box):
    """Interior-range membership OR (boundary-range AND exact box) is
    EXACTLY the box predicate — the whole query decomposition, brute
    forced on random points."""
    interior, boundary = S2.covering(*box, max_cells=48)
    assert len(interior) + len(boundary) <= 48
    # interior cells fully inside, boundary cells intersecting
    if interior.size:
        assert S2.cell_contained_in_box(interior, *box).all()
    lon, lat = _points(4000)
    leaf = S2.leaf_id(lon, lat)
    in_box = (
        (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    )

    def in_ranges(ids):
        hit = np.zeros(leaf.shape, dtype=bool)
        for lo, hi in S2.merged_leaf_ranges(ids):
            hit |= (leaf >= lo) & (leaf <= hi)
        return hit

    got = in_ranges(interior) | (in_ranges(boundary) & in_box)
    assert np.array_equal(got, in_box)
    # interior ranges are sound on their own (no refinement needed)
    assert (~in_ranges(interior) | in_box).all()


def test_covering_budget_and_merge():
    box = (-76_000, 40_000, -72_000, 47_000)
    interior, boundary = S2.covering(*box, max_cells=48)
    ranges = S2.merged_leaf_ranges(np.concatenate([interior, boundary]))
    assert 0 < len(ranges) <= 48
    los = np.array([r[0] for r in ranges])
    his = np.array([r[1] for r in ranges])
    assert (los <= his).all()
    assert (los[1:] > his[:-1] + 2).all()  # maximal merge: gaps remain
    # a tighter budget yields coarser (fewer, never more) ranges
    i2, b2 = S2.covering(*box, max_cells=8)
    assert len(i2) + len(b2) <= 8


def test_merged_leaf_ranges_sibling_collapse():
    """All 4 children of one cell merge back into the parent's interval."""
    cid = int(S2.parent(S2.leaf_id(np.array([0]), np.array([0])), 5)[0])
    kids = S2.children(cid)
    ranges = S2.merged_leaf_ranges(kids)
    assert ranges == [
        (int(S2.range_min(np.array([cid]))[0]), int(S2.range_max(np.array([cid]))[0]))
    ]


# ---------------------------------------------------------------------------
# Catalyst twin + operators
# ---------------------------------------------------------------------------

def test_jvm_twin_parity(spark):
    lon, lat = _points(3000)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"lon_milli": lon, "lat_milli": lat, "i": np.arange(3000)})
    )
    got = (
        df.select("i", X.s2_leaf_col(F.col("lon_milli"), F.col("lat_milli")).alias("leaf"))
        .orderBy("i")
        .toPandas()["leaf"]
        .to_numpy()
    )
    assert np.array_equal(got, S2.leaf_id(lon, lat))


def test_s2_parent_and_range_cols(spark):
    lon, lat = _points(400)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon_milli": lon, "lat_milli": lat}))
    leaf = X.s2_leaf_col(F.col("lon_milli"), F.col("lat_milli"))
    par = X.s2_parent_col(leaf, 9)
    rmin, rmax = X.s2_range_cols(par)
    out = df.select(par.alias("p"), rmin.alias("lo"), rmax.alias("hi")).toPandas()
    p_exp = S2.parent(S2.leaf_id(lon, lat), 9)
    assert np.array_equal(out["p"].to_numpy(), p_exp)
    assert np.array_equal(out["lo"].to_numpy(), S2.range_min(p_exp))
    assert np.array_equal(out["hi"].to_numpy(), S2.range_max(p_exp))


def test_bbox_query_matches_plain_filter(spark):
    lon, lat = _points(3000)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(3000), "lon_milli": lon, "lat_milli": lat})
    )
    box = (-76_000, 40_000, -72_000, 47_000)
    got = sorted(
        r.event_id for r in OP.s2_bbox_query(df, *box).select("event_id").collect()
    )
    exp = sorted(
        int(i)
        for i in np.nonzero(
            (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
        )[0]
    )
    assert got == exp


def test_stored_leaf_pushdown(spark, tmp_path):
    """The 100 TB read path: a leaf-sorted table with a STORED leaf column
    answers the covering with parquet-pushable range predicates."""
    lon, lat = _points(3000)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(3000), "lon_milli": lon, "lat_milli": lat})
    )
    path = str(tmp_path / "s2store")
    OP.s2_index(df).sort("s2_leaf").write.parquet(path)
    stored = spark.read.parquet(path)
    box = (-76_000, 40_000, -72_000, 47_000)
    q = OP.s2_bbox_query(stored, *box, leaf_col="s2_leaf")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "s2_leaf" in plan.split("PushedFilters")[1][:200]
    got = sorted(r.event_id for r in q.select("event_id").collect())
    exp = sorted(
        int(i)
        for i in np.nonzero(
            (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
        )[0]
    )
    assert got == exp


def test_density_matches_numpy(spark):
    lon, lat = _points(2500)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon_milli": lon, "lat_milli": lat}))
    out = OP.s2_density(df, 8).toPandas().sort_values("cell_id").reset_index(drop=True)
    cells = S2.parent(S2.leaf_id(lon, lat), 8)
    uniq, cnt = np.unique(cells, return_counts=True)
    assert np.array_equal(out["cell_id"].to_numpy(), uniq)
    assert np.array_equal(out["cnt"].to_numpy(), cnt)
    assert np.array_equal(out["range_min"].to_numpy(), S2.range_min(uniq))
    assert np.array_equal(out["range_max"].to_numpy(), S2.range_max(uniq))
    assert np.array_equal(out["face"].to_numpy(), uniq >> S2.FACE_SHIFT)


def test_plan_is_bounded(spark):
    """The regression this family shipped with: unbound, the spread
    ladder duplicates the upstream derivation 2^5 times and the filter
    arms multiply it again (564 KB plans, ~25 s of optimizer time).
    Let-bound, the optimized plan stays small even over DERIVED coords."""
    df = spark.range(1000).select(
        (F.col("id") % 360_000 - 180_000).alias("lon_milli"),
        (F.col("id") % 180_000 - 90_000).alias("lat_milli"),
    )
    q = OP.s2_bbox_query(df.withColumn("event_id", F.col("lon_milli") + 1),
                         -76_000, 40_000, -72_000, 47_000)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 100_000


# ---------------------------------------------------------------------------
# polygon covering (covering_region generalization)
# ---------------------------------------------------------------------------

L_POLY = [
    np.array(
        [[-75_800.3, 39_900.7], [-72_900.1, 39_900.7], [-72_900.1, 41_800.9],
         [-74_200.7, 41_800.9], [-74_200.7, 40_900.3], [-75_800.3, 40_900.3]]
    ),
    np.array(
        [[-74_500.9, 40_200.1], [-73_600.3, 40_200.1],
         [-73_600.3, 40_700.9], [-74_500.9, 40_700.9]]
    ),
]


def _poly_classify(polys):
    from geowave_spark.functions import geometry as G

    def classify(cids):
        lo_lon, lo_lat, hi_lon, hi_lat = S2.cell_box_milli(cids)
        return G.classify_cells_vs_polygon(lo_lon, lo_lat, hi_lon, hi_lat, polys)

    return classify


def test_polygon_covering_exact_membership():
    """Interior-range OR (boundary-range AND even-odd) is EXACTLY the
    even-odd predicate — brute-forced on points dense around the polygon."""
    from geowave_spark.functions import geometry as G

    interior, boundary = S2.covering_region(_poly_classify([L_POLY]), max_cells=64)
    assert interior.size > 0  # concave region still yields interior cells
    lon = RNG.integers(-76_500, -72_000, 6000)
    lat = RNG.integers(39_000, 42_500, 6000)
    leaf = S2.leaf_id(lon, lat)
    in_poly = G.points_in_polygon(lon, lat, [L_POLY])

    def in_ranges(ids):
        hit = np.zeros(leaf.shape, dtype=bool)
        for lo, hi in S2.merged_leaf_ranges(ids):
            hit |= (leaf >= lo) & (leaf <= hi)
        return hit

    got = in_ranges(interior) | (in_ranges(boundary) & in_poly)
    assert np.array_equal(got, in_poly)
    # interior cells are sound alone: never a point outside the polygon
    assert (~in_ranges(interior) | in_poly).all()


def test_box_covering_via_region_equivalent():
    """covering() is the box special case of covering_region()."""
    box = (-76_000, 40_000, -72_000, 47_000)
    a_i, a_b = S2.covering(*box, max_cells=48)
    b_i, b_b = S2.covering_region(S2.box_classifier(*box), max_cells=48)
    assert np.array_equal(a_i, b_i) and np.array_equal(a_b, b_b)


def test_polygon_query_matches_brute_force(spark):
    from geowave_spark.functions import geometry as G
    import pandas as pd

    lon = RNG.integers(-76_500, -72_000, 3000)
    lat = RNG.integers(39_000, 42_500, 3000)
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(3000), "lon_milli": lon, "lat_milli": lat})
    )
    got = sorted(
        r.event_id
        for r in OP.s2_polygon_query(df, L_POLY).select("event_id").collect()
    )
    exp = sorted(int(i) for i in np.nonzero(G.points_in_polygon(lon, lat, [L_POLY]))[0])
    assert got == exp


def test_polygon_query_stored_leaf(spark, tmp_path):
    from geowave_spark.functions import geometry as G
    import pandas as pd

    lon = RNG.integers(-76_500, -72_000, 2000)
    lat = RNG.integers(39_000, 42_500, 2000)
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(2000), "lon_milli": lon, "lat_milli": lat})
    )
    path = str(tmp_path / "s2poly")
    OP.s2_index(df).sort("s2_leaf").write.parquet(path)
    q = OP.s2_polygon_query(spark.read.parquet(path), L_POLY, leaf_col="s2_leaf")
    got = sorted(r.event_id for r in q.select("event_id").collect())
    exp = sorted(int(i) for i in np.nonzero(G.points_in_polygon(lon, lat, [L_POLY]))[0])
    assert got == exp


def test_wrap_covering_exact_membership():
    """Antimeridian wrap (minx > maxx): union-of-two-boxes covering is
    exact under the wrapped predicate."""
    box = (170_000, -20_000, -165_000, 30_000)
    c1 = S2.box_classifier(box[0], box[1], 180_000, box[3])
    c2 = S2.box_classifier(-180_000, box[1], box[2], box[3])
    interior, boundary = S2.covering_region(
        lambda cids: np.maximum(c1(cids), c2(cids)), max_cells=48
    )
    lon, lat = _points(5000)
    leaf = S2.leaf_id(lon, lat)
    in_box = ((lon >= box[0]) | (lon <= box[2])) & (lat >= box[1]) & (lat <= box[3])

    def in_ranges(ids):
        hit = np.zeros(leaf.shape, dtype=bool)
        for lo, hi in S2.merged_leaf_ranges(ids):
            hit |= (leaf >= lo) & (leaf <= hi)
        return hit

    got = in_ranges(interior) | (in_ranges(boundary) & in_box)
    assert np.array_equal(got, in_box)
    assert (~in_ranges(interior) | in_box).all()


def test_wrap_query_matches_plain_filter(spark):
    import pandas as pd

    lon, lat = _points(3000)
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(3000), "lon_milli": lon, "lat_milli": lat})
    )
    box = (170_000, -20_000, -165_000, 30_000)
    got = sorted(
        r.event_id for r in OP.s2_bbox_query(df, *box).select("event_id").collect()
    )
    keep = ((lon >= box[0]) | (lon <= box[2])) & (lat >= box[1]) & (lat <= box[3])
    assert got == sorted(int(i) for i in np.nonzero(keep)[0])
