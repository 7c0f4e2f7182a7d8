"""Clustering analytics vs brute-force numpy references (the reference's
analytics ITs cross-check MR implementations against single-node
reimplementations, e.g. KDERasterResizeIT / DBScanIT)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.clustering import dbscan, kmeans
from geowave_spark.operators import clustering as OC


def _mkdf(spark, xs, ys):
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(xs), dtype=np.int64),
            "lon_milli": np.asarray(xs, dtype=np.int64),
            "lat_milli": np.asarray(ys, dtype=np.int64),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def _brute_dbscan(px, py, eps, min_pts):
    """Reference DBSCAN: exact neighbor graph, BFS over cores."""
    n = len(px)
    dlon = np.abs(px[:, None] - px[None, :])
    dlon = np.minimum(dlon, 360_000 - dlon)
    d2 = dlon**2 + (py[:, None] - py[None, :]) ** 2
    nbr = d2 <= eps * eps
    core = nbr.sum(axis=1) >= min_pts
    label = -np.ones(n, dtype=np.int64)
    for seed in range(n):
        if not core[seed] or label[seed] >= 0:
            continue
        stack, comp = [seed], []
        label[seed] = seed
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in np.nonzero(nbr[u])[0]:
                if core[v] and label[v] < 0:
                    label[v] = seed
                    stack.append(v)
    # canonical label = min member id per component (match engine)
    for seed in set(label[label >= 0]):
        members = np.nonzero(label == seed)[0]
        label[members] = members.min()
    # border points
    out = {int(i): int(label[i]) for i in range(n) if core[i]}
    for i in range(n):
        if not core[i]:
            cands = [int(label[j]) for j in np.nonzero(nbr[i])[0] if core[j]]
            if cands:
                out[int(i)] = min(cands)
    return out


@pytest.mark.parametrize("seed,min_pts", [(1, 4), (7, 6)])
def test_dbscan_matches_bruteforce(spark, seed, min_pts):
    rng = np.random.default_rng(seed)
    # three dense blobs + sprinkled noise, all in milli-degrees
    blobs = [(-74_000, 40_700), (2_300, 48_800), (-73_200, 41_900)]
    xs, ys = [], []
    for bx, by in blobs:
        xs.append(rng.integers(bx - 300, bx + 300, 60))
        ys.append(rng.integers(by - 300, by + 300, 60))
    xs.append(rng.integers(-179_000, 179_000, 40))
    ys.append(rng.integers(-80_000, 80_000, 40))
    px = np.concatenate(xs)
    py = np.concatenate(ys)
    eps = 150

    pdf, df = _mkdf(spark, px, py)
    got = {
        int(r["event_id"]): int(r["cluster"])
        for r in dbscan(df, eps_milli=eps, min_pts=min_pts).collect()
    }
    want = _brute_dbscan(px, py, eps, min_pts)
    assert got == want


def test_dbscan_dateline_cluster(spark):
    """A cluster straddling the antimeridian is found as one cluster."""
    xs = np.array([179_950, 179_990, -179_980, -179_940, 0])
    ys = np.array([0, 10, 20, 5, 0])
    _, df = _mkdf(spark, xs, ys)
    got = {
        int(r["event_id"]): int(r["cluster"])
        for r in dbscan(df, eps_milli=100, min_pts=3).collect()
    }
    assert set(got.keys()) == {0, 1, 2, 3}
    assert len(set(got.values())) == 1


def test_kmeans_separated_blobs(spark):
    rng = np.random.default_rng(3)
    c1 = (rng.integers(-74_200, -73_800, 50), rng.integers(40_500, 40_900, 50))
    c2 = (rng.integers(2_100, 2_500, 50), rng.integers(48_600, 49_000, 50))
    c3 = (rng.integers(139_500, 139_900, 50), rng.integers(35_500, 35_900, 50))
    px = np.concatenate([c1[0], c2[0], c3[0]])
    py = np.concatenate([c1[1], c2[1], c3[1]])
    _, df = _mkdf(spark, px, py)
    out = kmeans(df, k=3).toPandas()
    assert len(out) == 150
    # well-separated blobs must land in pure clusters
    for lo, hi in [(0, 50), (50, 100), (100, 150)]:
        grp = out[(out.event_id >= lo) & (out.event_id < hi)].cluster
        assert grp.nunique() == 1
    assert out.cluster.nunique() == 3
    # determinism
    out2 = kmeans(df, k=3).toPandas()
    assert out.sort_values("event_id").cluster.tolist() == out2.sort_values("event_id").cluster.tolist()


def test_kmeans_assignment_plan_zero_exchange(spark):
    """The Lloyd assignment is pure column arithmetic over LITERAL
    centroids: the returned labeling plans ZERO shuffle exchanges and no
    window.  (The r3 crossJoin+row_number plan hash-exchanged all N×k
    fanned rows per iteration — the last named scale-killer.)"""
    from geowave_spark.operators.bucketed import n_shuffle_exchanges

    rng = np.random.default_rng(7)
    _, df = _mkdf(
        spark, rng.integers(-50_000, 50_000, 200), rng.integers(-40_000, 40_000, 200)
    )
    out = kmeans(df, k=4)
    assert n_shuffle_exchanges(out) == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def _brute_kmeans(px, py, k, max_iter=10):
    """Pure-python replay of the fixed-point quantized Lloyd iteration
    (farthest seeding, packed-key argmin ties→smaller cluster, half-up
    integer means) — the definitional oracle for the engine."""
    from geowave_spark.operators.clustering import KM_ENC, KM_OFF, _km_round_mean

    pts = sorted(zip(range(len(px)), map(int, px), map(int, py)))
    seeds = [(pts[0][1], pts[0][2])]
    for _ in range(1, k):
        far = max(
            pts,
            key=lambda p: (
                min((p[1] - cx) ** 2 + (p[2] - cy) ** 2 for cx, cy in seeds),
                -p[0],
            ),
        )
        seeds.append((far[1], far[2]))
    cents = list(seeds)
    lab = {}
    for _ in range(max_iter):
        lab = {
            pid: min(
                range(k),
                key=lambda c: ((x - cents[c][0]) ** 2 + (y - cents[c][1]) ** 2)
                * KM_ENC
                + c,
            )
            for pid, x, y in pts
        }
        new = []
        for c in range(k):
            mem = [(x, y) for pid, x, y in pts if lab[pid] == c]
            if not mem:
                new.append(cents[c])
            else:
                sx = sum(x + KM_OFF for x, _ in mem)
                sy = sum(y + KM_OFF for _, y in mem)
                new.append((_km_round_mean(sx, len(mem)), _km_round_mean(sy, len(mem))))
        if new == cents:
            break
        cents = new
    return lab


def test_kmeans_matches_brute_force_replay(spark):
    """Engine labels == the pure-python fixed-point replay, bit-exact —
    pins the quantization/tie semantics the DuckDB registry oracle also
    unrolls."""
    rng = np.random.default_rng(11)
    px = rng.integers(-170_000, 170_000, 300)
    py = rng.integers(-80_000, 80_000, 300)
    _, df = _mkdf(spark, px, py)
    got = {int(r["event_id"]): int(r["cluster"]) for r in kmeans(df, k=4).collect()}
    assert got == _brute_kmeans(px, py, 4)


def test_kmeans_minby_path_matches_literal(spark, monkeypatch):
    """Forcing the large-k broadcast min_by assignment path produces the
    same labeling as the literal-key path (same packed-key tie rule)."""
    from geowave_spark.operators import clustering as OCL

    rng = np.random.default_rng(13)
    _, df = _mkdf(
        spark, rng.integers(-90_000, 90_000, 150), rng.integers(-60_000, 60_000, 150)
    )
    lit = {int(r["event_id"]): int(r["cluster"]) for r in kmeans(df, k=3).collect()}
    monkeypatch.setattr(OCL, "KM_LITERAL_MAX", 1)
    big = {int(r["event_id"]): int(r["cluster"]) for r in kmeans(df, k=3).collect()}
    assert lit == big


# ---------------------------------------------------------------------------
# Cluster hull output (round 2 — GeometryHullTool analogue)
# ---------------------------------------------------------------------------


def test_convex_hull_brute_force():
    """Monotone chain vs brute force: every input point inside-or-on the
    hull, hull vertices are input points, turns strictly CCW."""
    import numpy as np

    from geowave_spark.functions import geometry as G

    rng = np.random.default_rng(7)
    pts = rng.integers(-1000, 1000, size=(200, 2)).astype(np.float64)
    ring = G.convex_hull(pts)
    assert len(ring) >= 3
    # all vertices are input points
    ptset = {tuple(p) for p in pts}
    assert all(tuple(v) in ptset for v in ring)
    # CCW strict turns
    n = len(ring)
    for i in range(n):
        a, b, c = ring[i], ring[(i + 1) % n], ring[(i + 2) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        assert cross > 0
    # every point inside or on the hull (all half-plane tests >= 0)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        s = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (pts[:, 0] - a[0])
        assert (s >= 0).all()
    assert G.ring_area2(ring) > 0


def test_cluster_hulls_over_dbscan(spark, sf_dir):
    import numpy as np

    from geowave_spark.functions import geometry as G
    from geowave_spark.sources import tables as TB

    geo = TB.geo_events(spark, sf_dir)
    labels = OC.dbscan(geo, eps_milli=200, min_pts=5)
    hulls = OC.cluster_hulls(labels, geo).toPandas()
    assert len(hulls) >= 1
    assert hulls.n_points.sum() == labels.count()
    # spot-check the biggest cluster against a local recompute
    big = hulls.loc[hulls.n_points.idxmax()]
    members = set(
        r.event_id for r in labels.filter(F.col("cluster") == int(big.cluster)).collect()
    )
    pdf = geo.filter(F.col("event_id").isin(list(members))).toPandas()
    ring = G.convex_hull(pdf[["lon_milli", "lat_milli"]].to_numpy(np.float64))
    assert int(big.n_vertices) == len(ring)
    assert big.area2_milli == G.ring_area2(ring)
    # WKB round-trips to the same ring
    polys = G.polygon_rings(bytes(big.hull_wkb))
    assert np.array_equal(np.asarray(polys[0][0])[:-1], ring) or np.array_equal(
        np.asarray(polys[0][0]), ring
    )


def _cshape_points():
    import numpy as np

    pts = []
    for x in range(0, 11):
        for y in range(0, 11):
            if x >= 5 and 3 <= y <= 7:
                continue  # the notch: an empty region the convex hull covers
            pts.append((float(x), float(y)))
    return np.array(pts)


def test_concave_hull_brute_force_properties():
    """Park & Oh dig vs brute-force property checks (the reference's
    GeometryHullToolTest strategy): the ring is simple, every input point
    stays inside-or-on it, its area is below the convex hull's, the notch
    interior is excluded, and an infinite threshold degenerates to the
    convex hull."""
    import numpy as np

    from geowave_spark.functions import geometry as G

    pts = _cshape_points()
    cv, cc = G.convex_hull(pts), G.concave_hull(pts)
    a_cv, a_cc = G.ring_area2(cv), G.ring_area2(cc)
    assert 0 < a_cc < a_cv
    n = len(cc)
    segs = [(tuple(cc[i]), tuple(cc[(i + 1) % n])) for i in range(n)]
    # simple ring: non-adjacent edges never cross
    for i in range(n):
        for j in range(i + 1, n):
            if j == (i + 1) % n or (j + 1) % n == i or (i == 0 and j == n - 1):
                continue
            assert not G._segs_cross(*segs[i], *segs[j]), (i, j)
    # containment: every input point inside or on the boundary
    inside = G.points_in_polygon(pts[:, 0], pts[:, 1], [[cc]])
    dmin = np.array(
        [min(G._seg_profile(s, e, (px, py))[1] for s, e in segs) for px, py in pts]
    )
    assert (inside | (dmin < 1e-9)).all()
    # all vertices are input points
    ptset = {tuple(p) for p in pts}
    assert all(tuple(v) in ptset for v in cc)
    # the notch interior (inside the convex hull) is excluded
    assert G.points_in_polygon(np.array([8.0]), np.array([5.0]), [[cv]])[0]
    assert not G.points_in_polygon(np.array([8.0]), np.array([5.0]), [[cc]])[0]
    # threshold -> infinity: no dig qualifies; area equals the convex hull
    assert G.ring_area2(G.concave_hull(pts, threshold=1e18)) == a_cv


def test_concave_hull_random_clusters():
    import numpy as np

    from geowave_spark.functions import geometry as G

    rng = np.random.default_rng(11)
    for trial in range(5):
        pts = rng.integers(-500, 500, size=(120, 2)).astype(np.float64)
        cc = G.concave_hull(pts)
        cv = G.convex_hull(pts)
        assert 0 < G.ring_area2(cc) <= G.ring_area2(cv)
        n = len(cc)
        segs = [(tuple(cc[i]), tuple(cc[(i + 1) % n])) for i in range(n)]
        inside = G.points_in_polygon(pts[:, 0], pts[:, 1], [[cc]])
        dmin = np.array(
            [min(G._seg_profile(s, e, (px, py))[1] for s, e in segs) for px, py in pts]
        )
        assert (inside | (dmin < 1e-9)).all(), trial


def test_cluster_hulls_concave_mode(spark):
    """cluster_hulls(concave_threshold=1.8) emits concave columns whose
    area never exceeds the convex hull's, and matches a local recompute on
    a C-shaped synthetic cluster."""
    import numpy as np

    from geowave_spark.functions import geometry as G

    pts = _cshape_points()
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(pts)]
    points = spark.createDataFrame(rows, "event_id long, lon_milli double, lat_milli double")
    labels = points.select("event_id").withColumn("cluster", F.lit(0).cast("long"))
    got = OC.cluster_hulls(labels, points, concave_threshold=1.8).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.concave_area2_milli <= r.area2_milli
    # single shard-spread cluster of 111 points: the shard union keeps all
    # boundary-defining points, the final dig reproduces the direct hull's
    # area on this fixture
    direct = G.concave_hull(pts)
    assert r.concave_area2_milli <= G.ring_area2(G.convex_hull(pts))
    assert r.concave_area2_milli > 0
    polys = G.polygon_rings(bytes(r.concave_wkb))
    ring = np.asarray(polys[0][0])[:-1]
    assert not G.points_in_polygon(np.array([8.0]), np.array([5.0]), [[ring]])[0]


def test_kmeans_mllib_production_path(spark, sf_dir):
    """MLlib drop-in: k clusters, all rows labeled, blob centers separate
    (each synthetic hot blob dominated by one cluster)."""
    from geowave_spark.sources import tables as TB

    geo = TB.geo_events(spark, sf_dir)
    out = OC.kmeans_mllib(geo, k=5)
    pdf = out.toPandas()
    assert len(pdf) == geo.count()
    assert pdf.cluster.nunique() == 5
    # hot-blob rows of one blob should overwhelmingly share a cluster
    joined = out.join(geo, "event_id").toPandas()
    nyc = joined[(joined.lon_milli - -73_985).abs() < 1500]
    if len(nyc) > 10:
        top = nyc.cluster.value_counts(normalize=True).iloc[0]
        assert top > 0.9


# ---------------------------------------------------------------------------
# KMeans family: jump (Sugar–James), kmeans|| init, strip-weak centroids
# ---------------------------------------------------------------------------


def _blobs(spark, centers, per=40, spread=400):
    """Deterministic integer blobs: `per` points in a ±spread box around
    each center (no RNG — integer lattice offsets)."""
    xs, ys = [], []
    for cx, cy in centers:
        for i in range(per):
            xs.append(cx + (i * 37) % (2 * spread) - spread)
            ys.append(cy + (i * 59) % (2 * spread) - spread)
    return _mkdf(spark, xs, ys)


def test_kmeans_jump_picks_true_k(spark):
    """The fitted (Lloyd) jump statistic recovers the true cluster count
    on well-separated blobs — KMeansJumpJobRunner's contract."""
    centers = [(-50_000, -30_000), (60_000, 10_000), (0, 45_000), (120_000, -40_000)]
    _, df = _blobs(spark, centers)
    best_k, table = OC.kmeans_jump(df, list(range(2, 7)), max_iter=8)
    assert best_k == len(centers)
    ks = [k for k, _, _ in table]
    assert ks == sorted(ks)
    # distortion increases sharply at true k: jump at k=4 dominates
    jumps = {k: j for k, _, j in table}
    assert jumps[4] == max(jumps.values())


def test_kmeans_distortion_table_matches_numpy(spark):
    """Sampled-centroid distortion table == brute-force numpy replay of
    the same deterministic rank sample."""
    import hashlib

    pdf, df = _blobs(spark, [(0, 0), (80_000, 20_000)], per=30)
    ks = [2, 3, 4]
    got = {r["k"]: r for r in OC.kmeans_distortion_table(df, ks).collect()}

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    order = sorted(
        range(len(pdf)), key=lambda i: (h60(str(int(pdf.event_id[i]))), int(pdf.event_id[i]))
    )
    px, py = pdf.lon_milli.to_numpy(), pdf.lat_milli.to_numpy()
    for k in ks:
        cents = [(px[i], py[i]) for i in order[:k]]
        d2 = np.min(
            [(px - cx) ** 2 + (py - cy) ** 2 for cx, cy in cents], axis=0
        )
        assert int(got[k]["sum_d2"]) == int(d2.sum())
        assert got[k]["n"] == len(pdf)
        want_d = 2.0 * len(pdf) / float(d2.sum())
        assert got[k]["distortion"] == pytest.approx(want_d, rel=1e-15)


def test_kmeans_parallel_init_quality_and_determinism(spark):
    """kmeans|| seeds: k distinct seeds, deterministic across runs, and a
    Lloyd refinement from them reaches the blob optimum (the same final
    SSE as the farthest-point-seeded kmeans)."""
    centers = [(-40_000, 0), (40_000, 0), (0, 60_000)]
    _, df = _blobs(spark, centers, per=25)
    seeds1 = OC.kmeans_parallel_init(df, 3, rounds=3)
    seeds2 = OC.kmeans_parallel_init(df, 3, rounds=3)
    assert seeds1 == seeds2
    assert len(seeds1) == 3 and len({(x, y) for _, x, y in seeds1}) == 3
    # each true blob center captured by a distinct nearest seed
    owners = set()
    for cx, cy in centers:
        owners.add(
            min(seeds1, key=lambda s: (s[1] - cx) ** 2 + (s[2] - cy) ** 2)[0]
        )
    assert len(owners) == 3


def test_strip_weak_break_point_closed_form():
    """MaxChangeBreakStrategy replay: cut at the largest consecutive drop
    (last max on ties), stop scanning at count <= 1."""
    assert OC.strip_weak_break_point([100, 90, 80, 5, 4]) == 3
    assert OC.strip_weak_break_point([100, 10, 8, 6]) == 1
    # ties -> LAST maximal gap (the reference's >= update)
    assert OC.strip_weak_break_point([30, 20, 10, 8]) == 2
    # count <= 1 stops the scan before the later gap is seen
    assert OC.strip_weak_break_point([50, 49, 1, 0]) == 1
    # monotone gentle decline: last pair still wins with >=
    assert OC.strip_weak_break_point([5, 4, 3, 2]) == 3


def test_strip_weak_centroids_dataframe(spark):
    """DataFrame wrapper: survivors = clusters above the MaxChange cut,
    clamped to [minimum, maximum]."""
    rows = (
        [(i, 0) for i in range(100)]
        + [(100 + i, 1) for i in range(90)]
        + [(200 + i, 2) for i in range(4)]
        + [(300 + i, 3) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "event_id long, cluster long")
    assert sorted(OC.strip_weak_centroids(df)) == [0, 1]
    assert sorted(OC.strip_weak_centroids(df, minimum=3)) == [0, 1, 2]
    assert OC.strip_weak_centroids(df, maximum=1) == [0]


def test_kmeans_parallel_init_mode(spark):
    """kmeans(init='parallel') reaches the blob optimum: same partition
    of points as the farthest-point-seeded run on well-separated blobs."""
    centers = [(-40_000, 0), (40_000, 0), (0, 60_000)]
    _, df = _blobs(spark, centers, per=20)
    a = {r.event_id: r.cluster for r in kmeans(df, 3).collect()}
    b = {r.event_id: r.cluster for r in kmeans(df, 3, init="parallel").collect()}
    # cluster ids may differ; the induced partition must be identical
    from collections import defaultdict

    def parts(lab):
        g = defaultdict(set)
        for i, c in lab.items():
            g[c].add(i)
        return {frozenset(v) for v in g.values()}

    assert parts(a) == parts(b)
    with pytest.raises(ValueError, match="init"):
        kmeans(df, 3, init="random")


def test_kmeans_multilevel_blob_recovery(spark):
    """Zoom hierarchy (MultiLevelClusteringJobRunner parity): 4 separated
    blobs, k=2, 2 levels — level 1 finds the 2 super-groups, level 2
    splits each into its 2 blobs; labels nest by integer division and are
    deterministic."""
    import pandas as pd

    from geowave_spark.operators.clustering import kmeans_multilevel

    rng = np.random.RandomState(3)
    centers = [(-60000, -40000), (-60000, 40000), (60000, -40000), (60000, 40000)]
    rows = []
    for b, (cx, cy) in enumerate(centers):
        for i in range(60):
            rows.append(
                (b * 60 + i, cx + int(rng.randint(-2000, 2000)),
                 cy + int(rng.randint(-2000, 2000)), b)
            )
    pdf = pd.DataFrame(rows, columns=["event_id", "lon_milli", "lat_milli", "blob"])
    df = spark.createDataFrame(pdf)

    out = kmeans_multilevel(df, k=2, zoom_levels=2).toPandas()
    assert set(out["zoom_level"]) == {1, 2}
    l1 = out[out.zoom_level == 1].set_index("event_id")["cluster"]
    l2 = out[out.zoom_level == 2].set_index("event_id")["cluster"]

    # level 1: the two super-groups (west blobs 0,1 vs east blobs 2,3)
    side = pdf.set_index("event_id")["blob"] // 2
    assert l1.groupby(side).nunique().max() == 1  # one label per side
    assert l1.nunique() == 2
    # level 2: four leaf clusters, one per blob, nested in their parent
    blob = pdf.set_index("event_id")["blob"]
    assert l2.groupby(blob).nunique().max() == 1
    assert l2.nunique() == 4
    nested = (l2 // 2).astype(int)
    assert (nested == l1.loc[nested.index]).all()

    # determinism across repartition
    out2 = kmeans_multilevel(df.repartition(13), k=2, zoom_levels=2).toPandas()
    a = out.sort_values(["zoom_level", "event_id"]).reset_index(drop=True)
    b = out2.sort_values(["zoom_level", "event_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_kmeans_grouped_small_groups(spark):
    """Groups with fewer than k points degrade gracefully (m effective
    clusters, no crash, deterministic)."""
    import pandas as pd

    from geowave_spark.operators.clustering import kmeans_grouped

    pdf = pd.DataFrame(
        {
            "pid": [1, 2, 3, 4],
            "px": [0.0, 10.0, 1000.0, 1001.0],
            "py": [0.0, 0.0, 0.0, 0.0],
            "grp": [0, 0, 1, 1],
        }
    )
    out = kmeans_grouped(spark.createDataFrame(pdf), k=3).toPandas()
    assert len(out) == 4
    assert out.groupby("grp")["cluster"].nunique().tolist() == [2, 2]


# ---------------------------------------------------------------------------
# grid_hull_vertices — the convex arm with a SQL oracle
# ---------------------------------------------------------------------------


def _hull_vertex_chars(pts):
    """Support-line characterization (the oracle's rule): p is a hull
    vertex iff some ray p→q keeps every other point strictly left or on
    the ray ahead of p."""
    S = sorted(set(map(tuple, pts)))
    out = set()
    for p in S:
        for q in S:
            if q == p:
                continue
            ok = True
            for r in S:
                if r == p:
                    continue
                cr = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
                dt = (r[0] - p[0]) * (q[0] - p[0]) + (r[1] - p[1]) * (q[1] - p[1])
                if cr < 0 or (cr == 0 and dt <= 0):
                    ok = False
                    break
            if ok:
                out.add(p)
                break
    return out


def test_hull_characterization_equals_monotone_chain():
    from geowave_spark.functions import geometry as G

    rng = np.random.RandomState(5)
    for _ in range(200):
        pts = rng.randint(0, 12, size=(rng.randint(3, 25), 2))
        S = np.unique(pts, axis=0)
        if len(S) < 3:
            continue
        ring = G.convex_hull(S.astype(float))
        if len(ring) >= 3 and G.ring_area2(ring) != 0:
            hv = set((int(x), int(y)) for x, y in ring)
        else:
            hv = {tuple(map(int, S[0])), tuple(map(int, S[-1]))}
        assert hv == _hull_vertex_chars(S.tolist())


def test_grid_hull_vertices_engine(spark):
    from geowave_spark.operators.clustering import grid_hull_vertices

    rows = []
    # cell 1: square + interior + an on-edge collinear point (dropped)
    for x, y in [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (5, 0), (5, 0)]:
        rows.append((1, x, y))
    # cell 2: fully collinear -> lexicographic endpoints
    for k in range(6):
        rows.append((2, k, k))
    # cell 3: below min_pts -> filtered out
    rows += [(3, 0, 0), (3, 1, 1)]
    df = spark.createDataFrame(rows, "cell long, x long, y long")
    got = {(r["cell"], r["x"], r["y"])
           for r in grid_hull_vertices(df, min_pts=5, max_pts=120).collect()}
    assert got == {
        (1, 0, 0), (1, 10, 0), (1, 10, 10), (1, 0, 10),
        (2, 0, 0), (2, 5, 5),
    }
