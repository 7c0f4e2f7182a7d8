"""Truth tables for the 9 registered geometry predicates (reference
GeoWaveJavaSparkSQLIT UDF truth tests, test/src/test/.../spark/
GeoWaveJavaSparkSQLIT.java:93-250)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geowave_spark.functions import geometry as G

SQ = lambda x0, y0, s: np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]])

A = G.wkb_polygon([SQ(0, 0, 10)])            # big square
B = G.wkb_polygon([SQ(2, 2, 3)])             # inside A
C = G.wkb_polygon([SQ(8, 8, 4)])             # overlaps A's corner
D = G.wkb_polygon([SQ(20, 20, 2)])           # disjoint
E = G.wkb_polygon([SQ(10, 3, 4.0)])          # shares A's right edge (touches)
HOLED = G.wkb_polygon([SQ(0, 0, 10), SQ(4, 4, 2)])  # A with a hole over B's middle
P_IN = G.wkb_point(5.0, 5.0)
P_OUT = G.wkb_point(50.0, 5.0)
MP = G.wkb_multipolygon([[SQ(0, 0, 1)], [SQ(5, 5, 1)]])

CASES = [
    # (op, a, b, expected)
    ("intersects", A, B, True),
    ("intersects", A, C, True),
    ("intersects", A, D, False),
    ("disjoint", A, D, True),
    ("contains", A, B, True),
    ("contains", A, C, False),
    ("covers", A, B, True),
    ("within", B, A, True),
    ("within", A, B, False),
    ("overlaps", A, C, True),
    ("overlaps", A, B, False),
    ("touches", A, E, True),
    ("touches", A, C, False),
    ("equals", A, A, True),
    ("equals", A, B, False),
    ("crosses", A, B, False),
    ("intersects", A, P_IN, True),
    ("contains", A, P_IN, True),
    ("contains", A, P_OUT, False),
    ("within", P_IN, A, True),
    ("disjoint", P_OUT, A, True),
    ("intersects", MP, G.wkb_point(5.5, 5.5), True),
    ("intersects", MP, G.wkb_point(3.0, 3.0), False),
    # hole semantics: the hole ejects B's center region
    ("contains", HOLED, G.wkb_polygon([SQ(4.2, 4.2, 1.0)]), False),
    ("contains", HOLED, G.wkb_polygon([SQ(1, 1, 2)]), True),
    ("intersects", HOLED, G.wkb_point(5.0, 5.0), False),  # in the hole
]


@pytest.mark.parametrize("op,a,b,want", CASES)
def test_geom_op_truth(op, a, b, want):
    assert G.geom_op(op, a, b) is bool(want)


def test_registered_sql_udfs(spark):
    from geowave_spark.functions.udfs import register_geom_predicates

    register_geom_predicates(spark)
    df = spark.createDataFrame(
        pd.DataFrame({"a": [bytearray(A)] * 3, "b": [bytearray(B), bytearray(D), bytearray(C)]})
    )
    df.createOrReplaceTempView("gpairs")
    rows = spark.sql(
        "SELECT geomIntersects(a, b) AS i, geomContains(a, b) AS c, "
        "geomDisjoint(a, b) AS d FROM gpairs"
    ).collect()
    assert [(r.i, r.c, r.d) for r in rows] == [
        (True, True, False),
        (False, False, True),
        (True, False, False),
    ]
