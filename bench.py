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
# BBOX / polygon-PIP / kNN suites plus tiling and spatial-temporal), each
# mapped to the input table whose row count defines its rows/sec.
HEADLINE_INPUTS = {
    "bbox_suite": "events",
    "pip_convex": "events",
    "pip_concave_hole": "events",
    "knn": "events",
    "spatial_temporal": "events",
    "tile_assign": "events",
    # training-data pipeline suites (first-class operators)
    "exact_dedup": "documents",
    "minhash_lsh_pairs": "documents",
    "simhash_pairs": "documents",
    "winnow_fingerprints": "documents",
    "embed_topk": "embeddings",
    "image_features": "events",  # synthetic images, count independent of sf
}
HEADLINE = list(HEADLINE_INPUTS)


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

    # Input sizes for rows/sec (the BASELINE metric is rows/sec over the
    # indexed corpus).
    n_rows = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        for t in {"events", "documents", "embeddings"}
    }

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
        n_input = n_rows[HEADLINE_INPUTS[name]]
        per_q[name] = round(best, 3)
        rows[name] = n_input
        rps[name] = round(n_input / best, 1)

    total = round(sum(per_q.values()), 3)
    return {
        "metric": "suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": per_q,
        "sf": _sf_from_dir(sf_dir),
        "input_rows": rows,
        "rows_per_sec": rps,
        "parallelism": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
    }


SCALING_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "60000"))


def run_scaling_job(n_rows: int = SCALING_N) -> dict:
    """One throughput-bound pipeline pass — the unit the north_rule measures.

    The BASELINE metric is "spatial-join + tile-assignment rows/sec" on the
    image+caption table; the per-suite latency benchmark above is the wrong
    regime for a *scaling* measurement (sub-second jobs are dominated by
    scheduling constants that do not parallelize).  This job is the real
    pipeline at input scale: deterministic image generation (PNG encode),
    decode + feature extraction, cell indexing, a 20-box spatial cover join,
    and pyramid tile assignment — per-core work dominates, which is exactly
    the 1000-executor regime the criterion models.
    """
    from pyspark.sql import functions as F

    from geowave_spark.operators import bbox as OB
    from geowave_spark.operators import index as OI
    from geowave_spark.operators import multimodal as OM
    from geowave_spark.operators import tiling as OTL
    from geowave_spark.plans import planner as P
    from geowave_spark.session import get_spark
    from geowave_spark.sources import synthetic as SYN

    spark = get_spark(app_name="geowave_spark_scaling")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    parts = cpus * 4

    boxes = [
        P.BoxQuery(f"b{i}", -170.0 + i * 17.0, -60.0 + (i % 6) * 18.0,
                   -165.0 + i * 17.0, -50.0 + (i % 6) * 18.0)
        for i in range(20)
    ]

    t0 = time.perf_counter()
    imgs = SYN.images(spark, n=n_rows, partitions=parts, with_bytes=True)
    feats = OM.image_features(imgs)
    n_feat = feats.count()

    meta = SYN.images(spark, n=n_rows, partitions=parts, with_bytes=False)
    indexed = OI.index_points(meta, id_col="image_id")
    n_hits = OB.query_bbox(
        indexed, boxes, id_cols=("image_id",), tiers=[OI.C.MAX_RES]
    ).count()
    n_tiles = OTL.assign_tiles(meta, build_pyramid=True, min_pyramid_level=4).count()
    wall = time.perf_counter() - t0
    return {
        "n_rows": n_rows,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_rows / wall, 1),
        "n_feat": n_feat,
        "n_hits": n_hits,
        "n_tiles": n_tiles,
        "parallelism": cpus,
    }


def run_scaling(sf_dir: str = SF_DIR, levels=(8, 32)) -> None:
    """North-rule evidence: the same throughput job at two parallelism
    levels (sandbox proxy for N vs 4N executors), plus the per-suite
    latency numbers for reference."""
    results = {}
    for n in levels:
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(n),
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_SCALE_N=str(SCALING_N),
        )
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-job"],
            env=env, capture_output=True, text=True, check=True,
        )
        results[n] = json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = levels
    thr = {n: results[n]["rows_per_sec"] for n in levels}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    # result invariance across parallelism levels (determinism evidence)
    invariant = all(
        results[lo][k] == results[hi][k] for k in ("n_feat", "n_hits", "n_tiles")
    )
    report = {
        "job": f"generate+decode+index+bbox-join+tile-assign over {SCALING_N} synthetic images",
        "levels": {
            str(n): {"wall_sec": results[n]["wall_sec"], "rows_per_sec": thr[n]}
            for n in levels
        },
        "results_invariant": invariant,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8 from N to 4N parallelism (north_rule proxy: local[8] vs local[32])",
        "pass": eff >= 0.8 and invariant,
    }
    bench_dir = Path(__file__).resolve().parent / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = bench_dir / "BASELINE.md"
    lines = [
        "# BENCH — two-parallelism scaling evidence (north_rule)",
        "",
        "Sandbox proxy for the N vs 4N executor criterion: the identical",
        "throughput pipeline — deterministic image generation (PNG encode),",
        "decode + dhash feature extraction, cell indexing, a 20-box spatial",
        f"cover join, and pyramid tile assignment — over {SCALING_N} synthetic",
        "image rows (FIXTURES F1 generator; no external data) at `local[8]`",
        "and `local[32]`.  Per-core work dominates (the 1000-executor regime);",
        "outputs are asserted identical at both levels.",
        "",
        "| parallelism | wall sec | throughput (rows/sec) |",
        "|---|---|---|",
    ]
    for n in levels:
        lines.append(
            f"| local[{n}] | {results[n]['wall_sec']} | {thr[n]} |"
        )
    lines += [
        "",
        f"**Scaling efficiency ({lo}→{hi}): {report['scaling_efficiency']}**"
        f" (criterion ≥ 0.8: {'PASS' if report['pass'] else 'FAIL'}); "
        f"results invariant across levels: {invariant} "
        f"(n_feat={results[lo]['n_feat']}, n_hits={results[lo]['n_hits']}, "
        f"n_tiles={results[lo]['n_tiles']})",
        "",
        "Per-suite latency numbers (NOT the scaling metric — sub-second jobs",
        "are scheduling-bound): see the driver's `BENCH_r{N}.json`.",
    ]
    md.write_text("\n".join(lines) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling-job" in sys.argv:
        print(json.dumps(run_scaling_job()))
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
