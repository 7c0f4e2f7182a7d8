"""Trajectory family (operators/tracks.py): segmentation, summaries,
grid-dwell stay points, integer Douglas–Peucker vs brute force, Hausdorff
pairs vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.operators import tracks as TK


def _pts(spark, rows):
    """rows: (track_id, pt_id, t_seconds, x, y) with ts derived from t."""
    df = spark.createDataFrame(
        rows, "track_id long, pt_id long, t long, x long, y long"
    )
    return df.select(
        "track_id", "pt_id",
        F.timestamp_seconds("t").alias("ts"),
        "t", "x", "y",
    )


def test_segment_gap_split(spark):
    rows = [
        (1, 1, 0, 0, 0),
        (1, 2, 100, 10, 0),
        (1, 3, 100_000, 20, 0),   # > default 86400? no: gap 99900 > 86400 → split
        (1, 4, 100_050, 30, 0),
        (2, 5, 0, 0, 0),          # independent track
    ]
    seg = TK.segment_tracks(_pts(spark, rows), gap_s=86_400)
    got = {r["pt_id"]: r["seg"] for r in seg.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_segment_summary_manhattan(spark):
    rows = [
        (1, 1, 0, 0, 0),
        (1, 2, 10, 3, 4),     # step |3|+|4| = 7
        (1, 3, 20, -2, 4),    # step 5
        (1, 4, 1_000_000, 0, 0),  # new segment (single point)
    ]
    seg = TK.segment_tracks(_pts(spark, rows), gap_s=3600)
    summ = {
        (r["track_id"], r["seg"]): r
        for r in TK.segment_summary(seg).collect()
    }
    s0 = summ[(1, 0)]
    assert (s0["n_points"], s0["path_m"], s0["max_step_m"]) == (3, 12, 7)
    assert (s0["t_start"], s0["t_end"], s0["dur_s"]) == (0, 20, 20)
    s1 = summ[(1, 1)]
    assert (s1["n_points"], s1["path_m"], s1["dur_s"]) == (1, 0, 0)


def test_stay_points_runs(spark):
    # track 1: 3 points in one cell (dwell 100s), hop away, return (new run)
    rows = [
        (1, 1, 0, 100, 100),
        (1, 2, 50, 150, 120),
        (1, 3, 100, 180, 110),
        (1, 4, 200, 50_000, 100),   # different cell
        (1, 5, 300, 120, 100),      # back: a NEW run in the first cell
        (1, 6, 450, 130, 105),
    ]
    stays = TK.stay_points(_pts(spark, rows), cell_milli=1000, min_dur_s=100)
    got = sorted(
        (r["t_start"], r["t_end"], r["n_points"]) for r in stays.collect()
    )
    assert got == [(0, 100, 3), (300, 450, 2)]


def _brute_dp(pts, tol):
    """Recursive float Douglas–Peucker (textbook form) for cross-checking
    the integer kernel; tol chosen away from decision boundaries."""
    if len(pts) <= 2:
        return list(pts)
    ax, ay = pts[0]
    bx, by = pts[-1]
    dx, dy = bx - ax, by - ay
    ln = (dx * dx + dy * dy) ** 0.5
    best, bi = -1.0, -1
    for i in range(1, len(pts) - 1):
        px, py = pts[i][0] - ax, pts[i][1] - ay
        d = (
            abs(dx * py - dy * px) / ln
            if ln > 0
            else (px * px + py * py) ** 0.5
        )
        if d > best:
            best, bi = d, i
    if best <= tol:
        return [pts[0], pts[-1]]
    return _brute_dp(pts[: bi + 1], tol)[:-1] + _brute_dp(pts[bi:], tol)


def test_simplify_matches_brute_force(spark):
    rng = np.random.RandomState(11)
    rows = []
    tracks = {}
    for tid in range(6):
        n = int(rng.randint(3, 40))
        xs = np.cumsum(rng.randint(-800, 801, n))
        ys = np.cumsum(rng.randint(-800, 801, n))
        tracks[tid] = list(zip(map(int, xs), map(int, ys)))
        for j in range(n):
            rows.append((tid, tid * 1000 + j, j * 10, int(xs[j]), int(ys[j])))
    pts = TK.segment_tracks(_pts(spark, rows), gap_s=3600)
    tol = 500
    out = TK.simplify_tracks(pts, tol_milli=tol).collect()
    got = {}
    for r in out:
        got.setdefault(r["track_id"], []).append((r["t"], r["x"], r["y"]))
    for tid, pl in tracks.items():
        exp = _brute_dp(pl, float(tol))
        kept = [(x, y) for _, x, y in sorted(got[tid])]
        assert kept == exp, f"track {tid}"


def test_simplify_properties(spark):
    rows = [(1, j, j * 10, j * 100, (j % 5) * 40) for j in range(30)]
    pts = TK.segment_tracks(_pts(spark, rows), gap_s=3600)
    out = sorted(
        (r["t"], r["x"], r["y"])
        for r in TK.simplify_tracks(pts, tol_milli=50).collect()
    )
    # endpoints always kept
    assert out[0] == (0, 0, 0) and out[-1] == (290, 2900, 160)
    # idempotence: simplifying the simplified output changes nothing
    rows2 = [(1, i, t, x, y) for i, (t, x, y) in enumerate(out)]
    pts2 = TK.segment_tracks(_pts(spark, rows2), gap_s=10**9)
    out2 = sorted(
        (r["t"], r["x"], r["y"])
        for r in TK.simplify_tracks(pts2, tol_milli=50).collect()
    )
    assert out2 == out


def _brute_hausdorff2(pa, pb):
    def directed(u, v):
        return max(min((ux - vx) ** 2 + (uy - vy) ** 2 for vx, vy in v)
                   for ux, uy in u)

    return max(directed(pa, pb), directed(pb, pa))


def test_hausdorff_vs_brute(spark):
    rng = np.random.RandomState(3)
    rows, tracks = [], {}
    # three tracks starting in the same 2000-cell, one far away
    for tid, (bx, by) in enumerate([(0, 0), (300, 300), (900, 100),
                                    (90_000, 0)]):
        n = int(rng.randint(4, 12))
        xs = bx + np.cumsum(rng.randint(-300, 301, n))
        ys = by + np.cumsum(rng.randint(-300, 301, n))
        # force the START point into the base cell for determinism
        xs[0], ys[0] = bx, by
        tracks[tid] = list(zip(map(int, xs), map(int, ys)))
        for j in range(n):
            rows.append((tid, tid * 100 + j, j, int(xs[j]), int(ys[j])))
    out = TK.track_hausdorff_pairs(_pts(spark, rows), cell_milli=2000)
    got = {
        (r["track_a"], r["track_b"]): r["hausdorff2"] for r in out.collect()
    }
    # candidates: only the three co-started tracks pair up
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    for (a, b), h2 in got.items():
        assert h2 == _brute_hausdorff2(tracks[a], tracks[b]), (a, b)


def test_hausdorff_identical_tracks_zero(spark):
    rows = [(1, j, j, j * 10, j * 20) for j in range(5)]
    rows += [(2, 100 + j, j, j * 10, j * 20) for j in range(5)]
    out = TK.track_hausdorff_pairs(_pts(spark, rows), cell_milli=2000)
    assert [(r["track_a"], r["track_b"], r["hausdorff2"])
            for r in out.collect()] == [(1, 2, 0)]


def test_od_flows_closed_form(spark):
    # track 1: cell A -> A -> B -> A ; track 2: A -> B
    rows = [
        (1, 1, 0, 100, 100),
        (1, 2, 10, 200, 150),        # same cell (1000-cell): no hop
        (1, 3, 20, 5_000, 100),      # A -> B
        (1, 4, 30, 100, 100),        # B -> A
        (2, 5, 0, 150, 110),
        (2, 6, 10, 5_100, 120),      # A -> B
    ]
    out = TK.od_flows(_pts(spark, rows), cell_milli=1000)
    got = {
        (r["gx0"], r["gy0"], r["gx1"], r["gy1"]): (r["n_trips"], r["n_tracks"])
        for r in out.collect()
    }
    a = (180, 90)   # (100+180000)//1000, (100+90000)//1000
    b = (185, 90)
    assert got == {
        (a[0], a[1], b[0], b[1]): (2, 2),
        (b[0], b[1], a[0], a[1]): (1, 1),
    }


def _brute_frechet2(pa, pb):
    import functools

    @functools.lru_cache(maxsize=None)
    def c(i, j):
        d2 = (pa[i][0] - pb[j][0]) ** 2 + (pa[i][1] - pb[j][1]) ** 2
        if i == 0 and j == 0:
            return d2
        if i == 0:
            return max(c(0, j - 1), d2)
        if j == 0:
            return max(c(i - 1, 0), d2)
        return max(min(c(i - 1, j), c(i, j - 1), c(i - 1, j - 1)), d2)

    return c(len(pa) - 1, len(pb) - 1)


def test_frechet_vs_brute(spark):
    rng = np.random.RandomState(9)
    rows, tracks = [], {}
    for tid in range(4):
        n = int(rng.randint(3, 15))
        xs = np.cumsum(rng.randint(-400, 401, n))
        ys = np.cumsum(rng.randint(-400, 401, n))
        xs[0], ys[0] = tid * 10, tid * 10  # co-located starts -> all pair up
        tracks[tid] = list(zip(map(int, xs), map(int, ys)))
        for j in range(n):
            rows.append((tid, tid * 100 + j, j, int(xs[j]), int(ys[j])))
    out = TK.track_frechet_pairs(_pts(spark, rows), cell_milli=2000)
    got = {(r["track_a"], r["track_b"]): r["frechet2"] for r in out.collect()}
    assert len(got) == 6
    for (a, b), f2 in got.items():
        assert f2 == _brute_frechet2(tuple(tracks[a]), tuple(tracks[b])), (a, b)


def test_frechet_order_aware_vs_hausdorff(spark):
    # out-and-back track vs its first leg: Hausdorff-close, Frechet-far
    leg = [(i * 100, 0) for i in range(5)]
    back = leg + leg[-2::-1]
    rows = [(1, j, j, x, y) for j, (x, y) in enumerate(back)]
    rows += [(2, 100 + j, j, x, y) for j, (x, y) in enumerate(leg)]
    pts = _pts(spark, rows)
    h2 = TK.track_hausdorff_pairs(pts, cell_milli=2000).collect()[0]["hausdorff2"]
    f2 = TK.track_frechet_pairs(pts, cell_milli=2000).collect()[0]["frechet2"]
    assert h2 == 0
    assert f2 == _brute_frechet2(tuple(back), tuple(leg))
    assert f2 > h2


def test_end_gate_tightens_candidates(spark):
    # tracks 1,2 share start AND end cells; track 3 shares only the start
    rows = [(1, j, j, j * 100, 0) for j in range(5)]
    rows += [(2, 100 + j, j, j * 100 + 10, 5) for j in range(5)]
    rows += [(3, 200 + j, j, j * 1000, 0) for j in range(5)]  # ends far away
    pts = _pts(spark, rows)
    loose = {(r["track_a"], r["track_b"])
             for r in TK.track_hausdorff_pairs(pts, cell_milli=2000).collect()}
    tight = {(r["track_a"], r["track_b"])
             for r in TK.track_hausdorff_pairs(
                 pts, cell_milli=2000, end_gate=True).collect()}
    assert loose == {(1, 2), (1, 3), (2, 3)}
    assert tight == {(1, 2)}
    # end-gated values agree with the loose path on surviving pairs
    loose_vals = {
        (r["track_a"], r["track_b"]): r["hausdorff2"]
        for r in TK.track_hausdorff_pairs(pts, cell_milli=2000).collect()
    }
    tight_vals = {
        (r["track_a"], r["track_b"]): r["hausdorff2"]
        for r in TK.track_hausdorff_pairs(
            pts, cell_milli=2000, end_gate=True).collect()
    }
    assert tight_vals[(1, 2)] == loose_vals[(1, 2)]


def test_resample_closed_form(spark):
    # one track: points at t=50 (0,0), t=250 (100, -200); grid step 100
    rows = [(1, 1, 50, 0, 0), (1, 2, 250, 100, -200)]
    out = sorted(
        (r["t_grid"], r["x"], r["y"])
        for r in TK.resample_tracks(_pts(spark, rows), step_s=100).collect()
    )
    # epochs 100 and 200: linear interp (exact floor for negative dy)
    assert out == [(100, 25, -50), (200, 75, -150)]


def test_resample_on_point_and_boundary(spark):
    rows = [(1, 1, 0, 10, 20), (1, 2, 100, 30, 40), (1, 3, 200, 50, 60)]
    out = {r["t_grid"]: (r["x"], r["y"])
           for r in TK.resample_tracks(_pts(spark, rows), step_s=100).collect()}
    # every epoch lands ON a point: values are exact, incl. both ends
    assert out == {0: (10, 20), 100: (30, 40), 200: (50, 60)}


def test_resample_matches_numpy(spark):
    rng = np.random.RandomState(6)
    rows = []
    tracks = {}
    for tid in range(4):
        ts = np.sort(rng.choice(np.arange(0, 5000), size=12, replace=False))
        xs = rng.randint(-150_000, 150_000, 12)
        ys = rng.randint(-80_000, 80_000, 12)
        tracks[tid] = (ts, xs, ys)
        for j in range(12):
            rows.append((tid, tid * 100 + j, int(ts[j]), int(xs[j]), int(ys[j])))
    step = 250
    out = {}
    for r in TK.resample_tracks(_pts(spark, rows), step_s=step).collect():
        out[(r["track_id"], r["t_grid"])] = (r["x"], r["y"])
    import math

    n_expected = 0
    for tid, (ts, xs, ys) in tracks.items():
        g = math.ceil(ts[0] / step) * step
        while g <= ts[-1]:
            j = int(np.searchsorted(ts, g, side="right")) - 1
            if ts[j] == g:
                exp = (int(xs[j]), int(ys[j]))
            else:
                t0, t1 = int(ts[j]), int(ts[j + 1])
                exp = tuple(
                    int(v0) + ((int(v1) - int(v0)) * (g - t0)) // (t1 - t0)
                    for v0, v1 in ((xs[j], xs[j + 1]), (ys[j], ys[j + 1]))
                )
            assert out[(tid, g)] == exp, (tid, g)
            n_expected += 1
            g += step
    assert len(out) == n_expected


def test_resample_grid_guard(spark):
    rows = [(1, 1, 0, 0, 0), (1, 2, 10**9, 5, 5)]
    with pytest.raises(Exception, match="coarser step_s"):
        TK.resample_tracks(_pts(spark, rows), step_s=1).collect()
