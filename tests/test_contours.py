"""Marching-squares contours (operators/contours.py): case-table
combinatorics, closed form, and Spark-vs-python replay."""

import numpy as np
from pyspark.sql import functions as F

from geowave_spark.operators import contours as C


def _inside(case_id, corner_bit):
    return bool(case_id & corner_bit)


EDGE_CORNERS = {0: (1, 2), 1: (2, 4), 2: (8, 4), 3: (1, 8)}


def _crossing_edges(case_id):
    return [
        e
        for e, (a, b) in EDGE_CORNERS.items()
        if _inside(case_id, a) != _inside(case_id, b)
    ]


def test_case_table_combinatorics():
    """Every crossing edge of every case is used by exactly one segment
    (in both saddle variants) — the table is topologically complete."""
    for case_id in range(16):
        variants = (
            [C.SADDLE_IN[case_id], C.SADDLE_OUT[case_id]]
            if case_id in (5, 10)
            else [C.CASES[case_id]]
        )
        for segs in variants:
            used = [e for seg in segs for e in seg]
            assert sorted(used) == sorted(_crossing_edges(case_id)), case_id


def _py_contours(cells: dict, t: int):
    """Independent python replay of the integer marching-squares rules."""
    S = C.SCALE
    blocks = set()
    for (gx, gy) in cells:
        for dx in (0, 1):
            for dy in (0, 1):
                blocks.add((gx - dx, gy - dy))

    def interp(v_lo, v_hi):
        if v_hi >= t > v_lo:
            return ((t - v_lo) * S) // (v_hi - v_lo)
        return S - ((t - v_hi) * S) // (v_lo - v_hi)

    out = []
    for (bx, by) in blocks:
        v00 = cells.get((bx, by), 0)
        v10 = cells.get((bx + 1, by), 0)
        v01 = cells.get((bx, by + 1), 0)
        v11 = cells.get((bx + 1, by + 1), 0)
        case_id = (
            (v00 >= t) * 1 + (v10 >= t) * 2 + (v11 >= t) * 4 + (v01 >= t) * 8
        )
        if case_id in (0, 15):
            continue
        if case_id in (5, 10):
            segs = (
                C.SADDLE_IN[case_id]
                if v00 + v10 + v01 + v11 >= 4 * t
                else C.SADDLE_OUT[case_id]
            )
        else:
            segs = C.CASES[case_id]
        epos = {
            0: lambda: (interp(v00, v10), 0),
            1: lambda: (S, interp(v10, v11)),
            2: lambda: (interp(v01, v11), S),
            3: lambda: (0, interp(v00, v01)),
        }
        for ea, eb in segs:
            xa, ya = epos[ea]()
            xb, yb = epos[eb]()
            out.append(
                (bx, by, case_id, bx * S + xa, by * S + ya,
                 bx * S + xb, by * S + yb)
            )
    return sorted(out)


def test_closed_form_single_cell():
    # one hot cell: 4 blocks, each a single-corner case, a diamond around it
    segs = _py_contours({(10, 10): 5}, t=3)
    assert len(segs) == 4
    assert {s[2] for s in segs} == {1, 2, 4, 8}
    # crossing position: ((3-0)*1000)//(5-0) = 600 from the cold corner
    for s in segs:
        for coord in s[3:]:
            assert coord % 1000 in (0, 400, 600)


def test_spark_matches_python_replay(spark):
    rng = np.random.RandomState(5)
    cells = {}
    for _ in range(120):
        cells[(int(rng.randint(0, 12)), int(rng.randint(0, 12)))] = int(
            rng.randint(1, 9)
        )
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()],
        "gx long, gy long, v long",
    )
    for t in (1, 3, 5, 8):
        got = sorted(
            (r["bx"], r["by"], r["case_id"], r["x0"], r["y0"], r["x1"], r["y1"])
            for r in C.contour_segments(df, threshold=t).collect()
        )
        assert got == _py_contours(cells, t), f"threshold {t}"


def test_grid_density_counts(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (100, 100)], "lon_milli long, lat_milli long"
    )
    g = {(r["gx"], r["gy"]): r["v"]
         for r in C.grid_density(df, res=9).collect()}
    assert sum(g.values()) == 3 and len(g) == 1  # all in one 512-cell


def test_morans_i_clustered_vs_checkerboard(spark):
    # clustered surface -> strongly positive; alternating stripes ->
    # negative (under QUEEN adjacency a checkerboard is only mildly
    # negative — its diagonals agree — so stripes are the cleaner probe)
    clustered = [(x, y, 10 if x < 4 else 1) for x in range(8) for y in range(8)]
    stripes = [(x, y, 10 if x % 2 == 0 else 1)
               for x in range(8) for y in range(8)]
    dfc = spark.createDataFrame(clustered, "gx long, gy long, v long")
    dfk = spark.createDataFrame(stripes, "gx long, gy long, v long")
    i_c = C.morans_i(C.morans_i_components(dfc))
    i_k = C.morans_i(C.morans_i_components(dfk))
    assert i_c > 0.5
    assert i_k < -0.3
    # constant surface: zero variance raises
    dfu = spark.createDataFrame(
        [(x, y, 3) for x in range(4) for y in range(4)],
        "gx long, gy long, v long",
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="zero variance"):
        C.morans_i(C.morans_i_components(dfu))


def test_morans_i_matches_numpy_reference(spark):
    rng = np.random.RandomState(2)
    cells = [(int(x), int(y), int(rng.randint(1, 20)))
             for x in range(6) for y in range(6)]
    df = spark.createDataFrame(cells, "gx long, gy long, v long")
    got = C.morans_i(C.morans_i_components(df))
    # textbook float computation
    vals = {(x, y): v for x, y, v in cells}
    xs = np.array([v for _, _, v in cells], dtype=float)
    mean = xs.mean()
    num = w = 0.0
    for (x, y), v in vals.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nb = vals.get((x + dx, y + dy))
                if nb is not None:
                    num += (v - mean) * (nb - mean)
                    w += 1
    den = ((xs - mean) ** 2).sum()
    exp = (len(xs) / w) * (num / den)
    assert abs(got - exp) < 1e-9


def test_gi_star_hotspot_detection(spark):
    # uniform background with one hot 2x2 block: top z-scores are the
    # cells whose neighborhoods cover the block
    cells = [(x, y, 2) for x in range(10) for y in range(10)]
    cells = [(x, y, 50 if (x in (4, 5) and y in (4, 5)) else v)
             for x, y, v in cells]
    df = spark.createDataFrame(cells, "gx long, gy long, v long")
    out = C.gi_star(C.gi_star_components(df))
    rows = {(r["gx"], r["gy"]): r for r in out.collect()}
    # exact integer components: center cell (4,4) neighborhood holds
    # 4 hot cells (200) + 5 background (10)
    assert rows[(4, 4)]["nbr_sum"] == 210 and rows[(4, 4)]["n_nbr"] == 9
    top4 = sorted(rows.values(), key=lambda r: -r["z"])[:4]
    assert {(r["gx"], r["gy"]) for r in top4} == {(4, 4), (4, 5), (5, 4), (5, 5)}
    # far-away background cell is not significant
    assert abs(rows[(0, 9)]["z"]) < 1.0 < rows[(4, 4)]["z"]


def test_gi_star_z_matches_numpy(spark):
    rng = np.random.RandomState(4)
    cells = [(int(x), int(y), int(rng.randint(1, 30)))
             for x in range(7) for y in range(7)]
    df = spark.createDataFrame(cells, "gx long, gy long, v long")
    got = {(r["gx"], r["gy"]): r["z"]
           for r in C.gi_star(C.gi_star_components(df)).collect()}
    vals = {(x, y): v for x, y, v in cells}
    xs = np.array([v for _, _, v in cells], dtype=float)
    n, mean, std = len(xs), xs.mean(), xs.std()
    for (x, y), v in vals.items():
        nb = [vals[(x + dx, y + dy)]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (x + dx, y + dy) in vals]
        w = len(nb)
        exp = (sum(nb) - mean * w) / (std * ((n * w - w * w) / (n - 1)) ** 0.5)
        assert abs(got[(x, y)] - exp) < 1e-9, (x, y)
