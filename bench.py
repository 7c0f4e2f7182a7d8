"""Benchmark harness: headline query suites at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "rows": {...}, "rows_per_sec": {...}}

Each suite is forced end-to-end with a no-op sink (``format("noop")``) so the
measurement covers the full distributed plan — scan, cover join, refine UDFs,
shuffles — without driver-side collect cost, mirroring how the reference's
scan engine streams results without materializing them client-side
(BaseDataStore.internalQuery, core/store/.../base/BaseDataStore.java:176-330).

Scaling mode (the BASELINE.json north_rule's two-cluster-size criterion,
proxied in-sandbox by two parallelism levels): run

    python bench.py --scaling

which re-executes this script at local[8] and local[32] via subprocess and
writes throughput at both plus scaling efficiency to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline suites (subset of registry.QUERIES — the BASELINE.json metric's
# BBOX / polygon-PIP / kNN suites plus tiling and spatial-temporal).
HEADLINE = [
    "bbox_suite",
    "pip_convex",
    "pip_concave_hole",
    "knn",
    "spatial_temporal",
    "tile_assign",
]


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(sf_dir: str = SF_DIR) -> dict:
    from geowave_spark.registry import QUERIES
    from geowave_spark.session import get_spark

    spark = get_spark(app_name="geowave_spark_bench")

    # Input size for rows/sec (the BASELINE metric is rows/sec over the
    # indexed corpus).
    n_input = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # Warm-up: JIT, Arrow init, Python worker fork pool — one small JVM pass
    # plus one pandas-UDF pass so worker startup isn't billed to a suite.
    QUERIES["bbox_hot"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    from pyspark.sql import functions as F

    from geowave_spark.functions import udfs as U

    spark.range(1 << 16).select(
        U.cell_encode(F.col("id") % 360 - 180.0, F.col("id") % 180 - 90.0, F.lit(10))
    ).write.mode("overwrite").format("noop").save()

    per_q: dict[str, float] = {}
    rows: dict[str, int] = {}
    rps: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        # Two executions; report the second.  The first pays one-time
        # whole-stage-codegen compilation + JIT for this plan shape; the
        # second is the steady-state throughput that extrapolates to a
        # long-running cluster job (the BASELINE metric's regime).
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = time.perf_counter() - t0
        per_q[name] = round(best, 3)
        rows[name] = n_input
        rps[name] = round(n_input / best, 1)

    total = round(sum(per_q.values()), 3)
    return {
        "metric": "spatial_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": per_q,
        "sf": _sf_from_dir(sf_dir),
        "input_rows": n_input,
        "rows_per_sec": rps,
        "parallelism": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
    }


def run_scaling(sf_dir: str = SF_DIR, levels=(8, 32)) -> None:
    """North-rule evidence: same job at two parallelism levels."""
    results = {}
    for n in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True,
            check=True,
        )
        results[n] = json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = levels
    thr = {n: results[n]["input_rows"] * len(HEADLINE) / results[n]["value"] for n in levels}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    report = {
        "sf": results[lo]["sf"],
        "levels": {str(n): {"total_sec": results[n]["value"], "rows_per_sec": round(thr[n], 1),
                            "queries": results[n]["queries"]} for n in levels},
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8 from N to 4N parallelism (north_rule proxy: local[8] vs local[32])",
        "pass": eff >= 0.8,
    }
    bench_dir = Path(__file__).resolve().parent / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = bench_dir / "BASELINE.md"
    lines = [
        "# BENCH — two-parallelism scaling evidence (north_rule)",
        "",
        "Sandbox proxy for the N vs 4N executor criterion: the identical job",
        f"(suites: {', '.join(HEADLINE)}) on the identical input",
        f"(`{sf_dir}`, {results[lo]['input_rows']} rows) at `local[{lo}]` and `local[{hi}]`.",
        "",
        "| parallelism | total sec | throughput (input rows x suites / sec) |",
        "|---|---|---|",
    ]
    for n in levels:
        lines.append(f"| local[{n}] | {results[n]['value']} | {round(thr[n], 1)} |")
    lines += [
        "",
        f"**Scaling efficiency ({lo}→{hi}): {report['scaling_efficiency']}**"
        f" (criterion ≥ 0.8: {'PASS' if report['pass'] else 'FAIL'})",
        "",
        "Per-query seconds:",
        "",
        "```json",
        json.dumps({str(n): results[n]["queries"] for n in levels}, indent=2),
        "```",
    ]
    md.write_text("\n".join(lines) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
