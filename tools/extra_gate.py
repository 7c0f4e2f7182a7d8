"""Driver-style correctness artifact for the EXTRA registry.

The grading driver's roster is capped at 50 queries; everything beyond it
lives in registry EXTRA_QUERIES/EXTRA_ORACLES and is enforced by
tests/test_oracles_all.py (sf0.001).  This script runs the SAME
row-count + sorted-value comparison the driver runs, at the driver's
sf0.01, and writes EXTRA_CORRECTNESS.json — an auditable per-query record
for the queries the driver cannot see.

Run exclusively (Spark job):  python tools/extra_gate.py
"""

from __future__ import annotations

import hashlib
import json
import re
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geowave_spark.registry import EXTRA_ORACLES, EXTRA_QUERIES
from geowave_spark.session import get_spark

SF = "/root/testdata/sf0.01"
# --sf-dir/--all/--out generalize the same sweep into a SCALE gate: both
# rosters compared against their oracles at e.g. sf0.1 (10x the driver's
# gate scale), written to a separate artifact.  Default invocation is
# byte-identical to the original EXTRA-only sf0.01 behavior.
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def value_hash(pdf) -> str:
    cols = sorted(pdf.columns)
    a = pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in cols:
        col = a[c]
        if str(col.dtype).startswith("float"):
            col = col.astype(float).round(9)
        h.update(col.astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()[:16]


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF)
    ap.add_argument("--all", action="store_true",
                    help="sweep the MAIN roster too, not just EXTRA")
    ap.add_argument("--out", default="EXTRA_CORRECTNESS.json")
    ap.add_argument("--skip", action="append", default=[],
                    help="name=reason — record the query as skipped "
                         "instead of running it (e.g. a closure oracle "
                         "that goes quadratic at this scale)")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names: gate just these "
                         "(iteration aid; the artifact still only counts "
                         "as the round gate when run without it)")
    args = ap.parse_args(argv)
    sf_dir = args.sf_dir
    skips = dict(s.split("=", 1) for s in args.skip)

    queries, oracles = dict(EXTRA_QUERIES), dict(EXTRA_ORACLES)
    if args.all:
        from geowave_spark.registry import ORACLES, QUERIES

        queries.update(QUERIES)
        oracles.update(ORACLES)
    if args.only:
        keep = set(args.only.split(","))
        missing = keep - set(queries)
        if missing:
            ap.error(f"unknown query names: {sorted(missing)}")
        queries = {k: v for k, v in queries.items() if k in keep}

    spark = get_spark(app_name="extra_gate")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out, fails = {}, []
    for name in sorted(queries):
        if name in skips:
            out[name] = {"status": "skipped", "reason": skips[name]}
            print(name, "skipped:", skips[name])
            continue
        spdf = queries[name](spark, sf_dir).toPandas()
        rec = {"rows": len(spdf), "cols": sorted(spdf.columns)}
        if name in oracles:
            osql = oracles[name]
            if callable(osql):  # sf-dependent oracle text
                osql = osql(sf_dir)
            opdf = con.execute(osql).fetchdf()
            rec["oracle_rows"] = len(opdf)
            rec["schema_match"] = sorted(opdf.columns) == rec["cols"]
            rec["hash_match"] = (
                rec["schema_match"]
                and rec["rows"] == rec["oracle_rows"]
                and value_hash(spdf) == value_hash(opdf)
            )
            rec["status"] = "exact" if rec["hash_match"] else "FAIL"
        else:
            rec["status"] = "rows_only"
        out[name] = rec
        print(name, rec["status"], rec["rows"])
        if rec["status"] == "FAIL":
            fails.append(name)
    m = re.search(r"sf(\d+(?:\.\d+)?)/?$", sf_dir)
    sf = float(m.group(1)) if m else sf_dir  # non-sf dirs: record the path
    with open(args.out, "w") as f:
        json.dump({"sf": sf, "queries": out, "fails": fails}, f, indent=1,
                  sort_keys=True)
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
