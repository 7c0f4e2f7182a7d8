"""geowave_spark CLI — the reference's ``geowave`` operation tree
re-expressed over the Spark engine.

Reference surface (file:line provenance):

* ``config addstore / addindex / list`` — core/cli/.../operations/config/
  (AddStoreCommand.java, AddIndexCommand.java, ListCommand.java,
  ConfigOptions.java: a local properties file keyed by name).  Here the
  config is a JSON file: stores map a name to a table directory (the
  KV-store namespace collapses to a parquet path), indexes hold the
  encode dials (resolution, salt buckets/mode) that AddIndexCommand's
  plugin options carry.
* ``ingest localtogw`` — core/ingest/.../operations/LocalToGeowaveCommand:
  read a local source through a format plugin, key every row, write to
  the store.  Format plugins: sources/formats.py etc. (SURVEY §2.2).
* ``stat recalc / liststats`` — core/store/.../operations/remote/
  RecalculateStatsCommand.java, ListStatsCommand.java.
* ``query`` — the engine's CQL planner (plans/cql.py; the reference fork
  exposes CQL through VectorQueryOptions rather than a CLI verb — the
  verb is provided because a Spark user expects one).  ``--explain``
  mirrors core/cli ExplainCommand.java: show the plan, don't run it.
* ``remote clear / copy / mergedata / listadapter / listindex`` —
  docs/content/commands/020-remote-commands.adoc store maintenance;
  mergedata maps to operators/compact.compact_store.
* ``sql`` — analytics/spark/.../sparksql/operations/SparkSqlCommand.java
  + SqlQueryRunner.java: free-form Spark SQL with store names resolving
  to temp views and the geometry UDFs registered.
* ``analytic dbscan / kde / kmeans / nn`` — analytics/mapreduce/.../
  operations/{DBScanCommand,KdeCommand,KmeansJumpCommand,
  NearestNeighborCommand}.java and analytics/spark KmeansSparkCommand.
* ``export`` — extensions/adapters/vector/.../export/
  VectorLocalExportCommand.java.

Scale: every verb builds one declarative DataFrame job (the session comes
from session.get_spark, so AQE/Arrow dials are the cluster ones); nothing
collects beyond the preview rows printed to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

__version__ = "0.3.0"

DEFAULT_CONFIG = "geowave_spark_config.json"


# ---------------------------------------------------------------------------
# config file (ConfigOptions.java analogue)
# ---------------------------------------------------------------------------


def _config_path(args) -> str:
    return args.config or os.environ.get("GEOWAVE_SPARK_CONFIG", DEFAULT_CONFIG)


def _load_config(args) -> dict:
    path = _config_path(args)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"stores": {}, "indexes": {}}


def _save_config(args, cfg: dict) -> None:
    with open(_config_path(args), "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)


def _store_path(cfg: dict, name: str) -> str:
    try:
        return cfg["stores"][name]["path"]
    except KeyError:
        raise SystemExit(f"unknown store {name!r}: run `config addstore` first")


def _index_opts(cfg: dict, name: str) -> dict:
    try:
        return cfg["indexes"][name]
    except KeyError:
        raise SystemExit(f"unknown index {name!r}: run `config addindex` first")


# ---------------------------------------------------------------------------
# session + io helpers
# ---------------------------------------------------------------------------


def _spark(args, injected):
    if injected is not None:
        return injected
    from geowave_spark.session import get_spark

    return get_spark(master=args.master, app_name="geowave_spark_cli")


def _emit(df, args, out) -> int:
    """Write the result (``--out``) or print a bounded preview; returns the
    row count so every verb reports what it did."""
    if getattr(args, "explain", False):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(buf.getvalue(), file=out)
        return 0
    if getattr(args, "out", None):
        from geowave_spark.sources.export import export_vector

        export_vector(df, args.out, fmt=args.out_format)
        n = df.sparkSession.read.format(args.out_format).load(args.out).count()
        print(f"wrote {n} rows to {args.out}", file=out)
        return n
    rows = df.limit(args.limit).collect()
    cols = df.columns
    print("\t".join(cols), file=out)
    for r in rows:
        print("\t".join(str(r[c]) for c in cols), file=out)
    return len(rows)


def _geo_milli(df):
    from pyspark.sql import functions as F

    out = df
    if "lon_milli" not in df.columns:
        out = out.withColumn(
            "lon_milli", F.round(F.col("lon") * 1000).cast("long")
        ).withColumn("lat_milli", F.round(F.col("lat") * 1000).cast("long"))
    return out


# ---------------------------------------------------------------------------
# verbs
# ---------------------------------------------------------------------------


def cmd_config(args, spark, out) -> int:
    cfg = _load_config(args)
    if args.config_cmd == "addstore":
        cfg["stores"][args.name] = {"path": args.path}
        _save_config(args, cfg)
        print(f"store {args.name} -> {args.path}", file=out)
    elif args.config_cmd == "addindex":
        cfg["indexes"][args.name] = {
            "strategy": args.strategy,
            "res": args.res,
            "salt_buckets": args.salt_buckets,
            "salt_mode": args.salt_mode,
        }
        _save_config(args, cfg)
        print(f"index {args.name}: strategy={args.strategy} res={args.res}", file=out)
    else:  # list
        print(json.dumps(cfg, indent=2, sort_keys=True), file=out)
    return 0


# format plugin table: name -> (reader, kind).  Point readers emit lon/lat
# doubles; 'shapefile' emits envelopes (minx..maxy); generic formats need
# --lon-col/--lat-col.
_POINT_FORMATS = ("gdelt", "tdrive", "geolife", "gpx", "twitter")


def _read_source(spark, fmt: str, src: str, args):
    from geowave_spark.sources import formats as FMT

    if fmt in _POINT_FORMATS:
        return getattr(FMT, f"read_{fmt}")(spark, src), "points"
    if fmt == "shapefile":
        from geowave_spark.sources.shapefile import read_shapefile

        return read_shapefile(spark, src), "envelopes"
    if fmt == "avro":
        from geowave_spark.sources.avro import read_avro

        return read_avro(spark, src), "points"
    if fmt == "landsat":
        # Landsat8 scene catalog (scene_list CSV) → scene footprints as
        # an envelope store: the landsat8 VectorIngestRunner story
        from geowave_spark.sources.landsat import read_scene_catalog

        return read_scene_catalog(spark, src), "envelopes"
    if fmt == "geotiff":
        from pyspark.sql import functions as F

        from geowave_spark.sources.tiff import read_geotiff

        df = read_geotiff(spark, src, level=getattr(args, "level", 0) or 0)
        # scenes whose CRS has no closed form carry a null envelope
        # (tiff.py keeps metres out of the degree grid) — excluding them
        # here is the loud-at-read choice; route them through pyproj
        n_null = df.filter(F.col("minx").isNull()).count()
        if n_null:
            print(
                f"warning: skipping {n_null} scene(s) with no EPSG:4326 "
                "envelope (unsupported CRS — install pyproj)",
                file=sys.stderr,
            )
        return df.filter(F.col("minx").isNotNull()), "envelopes"
    if fmt in ("parquet", "csv", "json"):
        r = spark.read
        if fmt == "csv":
            r = r.option("header", "true").option("inferSchema", "true")
        return getattr(r, fmt)(src), "points"
    raise SystemExit(f"unknown ingest format {fmt!r}")


def cmd_ingest(args, spark_injected, out) -> int:
    cfg = _load_config(args)
    path = _store_path(cfg, args.store)
    idx = _index_opts(cfg, args.index)
    spark = _spark(args, spark_injected)
    from geowave_spark.operators import index as OI

    df, kind = _read_source(spark, args.format, args.src, args)
    if getattr(args, "crs", None) and args.crs.upper() != "EPSG:4326":
        # projected source (Landsat-style UTM, Web Mercator, ...): attach
        # lon/lat via the closed forms / pyproj hook, then index on those
        if kind != "points":
            raise SystemExit("--crs applies to point sources (x/y columns)")
        from geowave_spark.functions.crs import with_wgs84

        df = with_wgs84(df, args.lon_col, args.lat_col, args.crs)
        args.lon_col, args.lat_col = "lon", "lat"
    if idx.get("strategy", "tiered") == "s2":
        if kind != "points":
            raise SystemExit(
                "--strategy s2 indexes point sources; envelope sources "
                "(shapefile) need the tiered strategy's multi-cell cover"
            )
        from pyspark.sql import functions as F

        from geowave_spark.operators import s2 as OS2

        if "lon_milli" not in df.columns:
            df = df.withColumn(
                "lon_milli", F.round(F.col(args.lon_col) * 1000).cast("long")
            ).withColumn(
                "lat_milli", F.round(F.col(args.lat_col) * 1000).cast("long")
            )
        OS2.write_s2_store(
            df, path, mode="append" if args.append else "overwrite"
        )
        n = spark.read.parquet(path).count()
        print(f"ingested: store {args.store} now holds {n} rows", file=out)
        return n
    if kind == "points":
        indexed = OI.index_points(
            df,
            lon_col=args.lon_col,
            lat_col=args.lat_col,
            res=idx["res"],
            salt_buckets=idx["salt_buckets"],
            salt_mode=idx["salt_mode"],
            id_col=args.id_col if args.id_col in df.columns else None,
        )
    else:
        indexed = OI.index_envelopes(
            df,
            salt_buckets=idx["salt_buckets"],
            id_col="recno" if "recno" in df.columns else None,
        )
    OI.write_indexed(indexed, path, mode="append" if args.append else "overwrite")
    n = spark.read.parquet(path).count()
    print(f"ingested: store {args.store} now holds {n} rows", file=out)
    return n


def cmd_stat(args, spark_injected, out) -> int:
    cfg = _load_config(args)
    path = _store_path(cfg, args.store)
    spark = _spark(args, spark_injected)
    from geowave_spark import stats as S
    from geowave_spark.operators import index as OI

    if args.stat_cmd == "recalc":
        S.write_stats(OI.read_indexed(spark, path), path)
        print("stats recalculated", file=out)
        return 0
    # liststats
    summ = spark.read.parquet(os.path.join(path, "_stats", "summary")).collect()[0]
    for k in summ.asDict():
        print(f"{k}\t{summ[k]}", file=out)
    tiers = OI.read_stats_tiers(spark, path)
    print(f"tiers\t{tiers}", file=out)
    return 0


def cmd_debug(args, spark_injected, out) -> int:
    """Timed scan/plan diagnostics — the reference's debug operation
    section (extensions/cli/debug: MinimalFullTable fullscanMinimal,
    FullTableScan, BBOXQuery, plus a range-decomposition dump the
    reference buries in logs)."""
    import time

    cfg = _load_config(args)
    path = _store_path(cfg, args.store)
    spark = _spark(args, spark_injected)
    from geowave_spark.operators import index as OI

    if args.debug_cmd == "fullscanMinimal":
        # key-column-only scan: no payload deserialization (column-pruned
        # parquet read — the Spark analogue of scanning keys without
        # iterators, MinimalFullTable.java)
        t0 = time.monotonic()
        n = OI.read_indexed(spark, path).select("cell").count()
        dt = time.monotonic() - t0
        print(f"fullscanMinimal\trows={n}\tseconds={dt:.3f}", file=out)
        return 0
    if args.debug_cmd == "fullscan":
        df = OI.read_indexed(spark, path)
        t0 = time.monotonic()
        # touch every column so the scan deserializes full rows
        n_cols = len(df.columns)
        n = df.count()
        from pyspark.sql import functions as F

        df.agg(*[F.count(c) for c in df.columns]).collect()
        dt = time.monotonic() - t0
        print(f"fullscan\trows={n}\tcols={n_cols}\tseconds={dt:.3f}", file=out)
        return 0
    if args.debug_cmd == "bbox":
        from geowave_spark.operators.bbox import query_bbox
        from geowave_spark.plans import planner as P

        data = OI.read_indexed(spark, path)
        q = P.BoxQuery("debug", args.minx, args.miny, args.maxx, args.maxy)
        t0 = time.monotonic()
        n = query_bbox(data, [q]).count()
        dt = time.monotonic() - t0
        print(f"bbox\trows={n}\tseconds={dt:.3f}", file=out)
        return 0
    if args.debug_cmd == "decomp":
        # dump the SFC cover decomposition a bbox plans to, per tier —
        # the reference logs these ranges inside getQueryRanges; here
        # they are a first-class inspection surface
        from geowave_spark.plans import planner as P

        data = OI.read_indexed(spark, path)
        q = P.BoxQuery("debug", args.minx, args.miny, args.maxx, args.maxy)
        tiers = getattr(data, "_gw_tiers", None) or OI.stats_tiers_for(data) \
            or [r[0] for r in data.select("tier").distinct().collect()]
        r_q = P.cover_resolution(q, args.max_cells)
        print(f"cover_resolution\t{r_q}", file=out)
        pdf = P._cover_rows(q, {min(int(t), r_q) for t in sorted(tiers)})
        for jcell in sorted(pdf["jcell"]):
            print(f"cell\t{jcell}", file=out)
        print(f"n_cells\t{len(pdf)}", file=out)
        return 0
    raise ValueError(f"unknown debug verb {args.debug_cmd!r}")


def cmd_query(args, spark_injected, out) -> int:
    cfg = _load_config(args)
    path = _store_path(cfg, args.store)
    spark = _spark(args, spark_injected)
    from geowave_spark.operators import index as OI
    from geowave_spark.plans.cql import cql_query

    data = OI.read_indexed(spark, path)
    if args.auth_file is not None:
        # JsonFileAuthorizationProvider parity: resolve the user's auth
        # set from the JSON table (unknown user -> empty set, fail closed)
        # and row-filter on the store's visibility expressions
        from geowave_spark.operators import visibility as VIS

        auths = VIS.load_auth_provider(args.auth_file)(args.user or "")
        if "vis" not in data.columns:
            raise ValueError(
                f"store {args.store!r} carries no 'vis' column; "
                "--auth-file needs a visibility-tagged store"
            )
        data = VIS.apply_visibility(data, set(auths))
    if "s2_leaf" in data.columns:
        # store was written with the S2 strategy: same CQL string, the
        # leaf-range planner (pushable scan filter, no cover join)
        from geowave_spark.plans.s2cql import s2_cql_query

        res = s2_cql_query(data, args.cql, id_col=args.id_col, leaf_col="s2_leaf")
    elif "seg_j" in data.columns and "x0" in data.columns:
        # segment-grain LINE store: BBOX/INTERSECTS answer as exact
        # line-geometry predicates (per-track verdicts)
        from geowave_spark.plans.cql import lines_cql_query

        res = lines_cql_query(data, args.cql)
    elif "lon" not in data.columns and "minx" in data.columns:
        # envelope-grain store (shapefile/geotiff ingest): BBOX clauses
        # answer as envelope intersection, not point containment
        from geowave_spark.plans.cql import envelope_cql_query

        res = envelope_cql_query(data, args.cql, id_col=args.id_col)
    else:
        res = cql_query(data, args.cql, id_col=args.id_col)
    return _emit(res, args, out)


def cmd_analytic(args, spark_injected, out) -> int:
    cfg = _load_config(args)
    path = _store_path(cfg, args.store)
    spark = _spark(args, spark_injected)
    from geowave_spark.operators import index as OI

    data = _geo_milli(OI.read_indexed(spark, path))
    if getattr(args, "cql", None):
        # the reference applies an input CQL filter before every analytic
        # (KMeansRunner.java:165-202 setCqlFilter; DBScanCommand/KdeCommand
        # carry the same option) — here it rides the same index-accelerated
        # planner the `query` verb uses, so the prefilter is a cover join.
        from geowave_spark.plans.cql import cql_query

        data = cql_query(data, args.cql, id_col=args.id_col)
    if args.analytic_cmd == "dbscan":
        from geowave_spark.operators.clustering import dbscan

        res = dbscan(data, eps_milli=args.eps_milli, min_pts=args.min_pts,
                     id_col=args.id_col)
        if args.hulls:
            from geowave_spark.operators.clustering import cluster_hulls

            res = cluster_hulls(
                res, data, id_col=args.id_col,
                concave_threshold=args.concave_threshold,
            )
    elif args.analytic_cmd == "kde":
        from geowave_spark.operators.kde import kde_grid, kde_levels

        res = kde_levels(
            kde_grid(data, list(range(args.min_level, args.max_level + 1)))
        )
    elif args.analytic_cmd == "kmeans":
        from geowave_spark.operators.clustering import kmeans

        if args.zoom_levels > 1:
            # Clustering.ZOOM_LEVELS (MultiLevelClusteringJobRunner):
            # cluster within each previous level's groups; --hulls then
            # renders the finest level's clusters.
            from geowave_spark.operators.clustering import kmeans_multilevel

            res = kmeans_multilevel(
                data, k=args.k, zoom_levels=args.zoom_levels,
                id_col=args.id_col,
            )
            if args.hulls:
                from pyspark.sql import functions as F

                res = res.filter(
                    F.col("zoom_level") == args.zoom_levels
                ).drop("zoom_level")
        else:
            res = kmeans(data, k=args.k, id_col=args.id_col)
        if args.hulls:
            # KmeansSparkCommand.java:128-130 setGenerateHulls: emit the
            # per-cluster hull geometries instead of bare labels.
            from geowave_spark.operators.clustering import cluster_hulls

            res = cluster_hulls(
                res, data, id_col=args.id_col,
                concave_threshold=args.concave_threshold,
            )
    else:  # nn
        from geowave_spark.operators.knn import KnnQuery, query_knn

        res = query_knn(
            data,
            [KnnQuery("q0", args.lon, args.lat, args.k)],
            id_col=args.id_col,
        )
    return _emit(res, args, out)


def cmd_sql(args, spark_injected, out) -> int:
    """Free-form Spark SQL over configured stores — the reference's
    ``spark sql`` verb (analytics/spark/.../sparksql/operations/
    SparkSqlCommand.java:67-214 + SqlQueryRunner.java:82-215): store names
    appearing after FROM/JOIN become temp views over the store's table, the
    geometry predicate UDFs (GeomFunctionRegistry.java:29-73 parity) and the
    gw_* cell functions are registered, and the query runs as one Catalyst
    plan (previews bounded by ``--limit``, the command's ``-n`` option)."""
    import re

    cfg = _load_config(args)
    spark = _spark(args, spark_injected)
    from geowave_spark.functions.udfs import (
        register_geom_predicates,
        register_sql_functions,
    )
    from geowave_spark.operators import index as OI

    register_geom_predicates(spark)
    register_sql_functions(spark)
    # The reference rewrites tokens after FROM/JOIN into store loads
    # (SparkSqlCommand.createCommandLineOptions' split walk).  Here any
    # such identifier naming a configured store is materialized as a temp
    # view; other identifiers resolve through Spark's catalog as usual
    # (subqueries/CTEs keep working — '(' is not an identifier).
    for name in set(
        re.findall(r"(?i)\b(?:from|join)\s+([A-Za-z_][A-Za-z0-9_]*)", args.sql)
    ):
        if name in cfg.get("stores", {}):
            OI.read_indexed(spark, cfg["stores"][name]["path"]) \
                .createOrReplaceTempView(name)
    return _emit(spark.sql(args.sql), args, out)


def cmd_remote(args, spark_injected, out) -> int:
    """Store-maintenance verbs — the reference's ``geowave remote`` group
    (docs/content/commands/020-remote-commands.adoc): ``clear`` empties a
    store, ``copy`` duplicates one store's rows into another,
    ``mergedata`` is the KV store's merging compaction (here:
    operators/compact.compact_store's small-file rewrite), ``listadapter``
    prints the store's schema (the adapter's attribute model),
    ``listindex`` the configured index dials."""
    cfg = _load_config(args)
    if args.remote_cmd == "listindex":
        print(json.dumps(cfg.get("indexes", {}), indent=2, sort_keys=True), file=out)
        return 0
    path = _store_path(cfg, args.store)
    if args.remote_cmd == "clear":
        # no Spark session needed — keep `clear` instant
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        print(f"cleared store {args.store}", file=out)
        return 0
    spark = _spark(args, spark_injected)
    from geowave_spark.operators import index as OI
    if args.remote_cmd == "copy":
        dest = _store_path(cfg, args.dest)
        OI.write_indexed(
            OI.read_indexed(spark, path), dest,
            mode="append" if args.append else "overwrite",
        )
        n = spark.read.parquet(dest).count()
        print(f"copied {args.store} -> {args.dest}: {n} rows", file=out)
        return n
    if args.remote_cmd == "mergedata":
        from geowave_spark.operators.compact import compact_store

        stats = compact_store(spark, path)
        print(json.dumps(stats, sort_keys=True), file=out)
        return 0
    # listadapter: the schema the store's rows decode to
    for f in OI.read_indexed(spark, path).schema.fields:
        print(f"{f.name}\t{f.dataType.simpleString()}", file=out)
    return 0


PIPELINE_STAGES = {
    "ingest": ["indexed", "stats_tier_counts"],
    "corpus": ["corpus_prep", "corpus_groups", "corpus_split",
               "corpus_shards"],
    "image": ["image_features", "image_dedup_groups", "image_split",
              "image_batches"],
    "raster": ["raster_tiles", "raster_pyramid", "raster_overviews"],
    "landsat": ["scene_select", "scene_stack", "scene_mask", "scene_ndvi"],
}


def cmd_pipeline(args, spark_injected, out) -> int:
    """Run one of the checkpointed multi-stage DAGs (checkpoint.py):
    ``ingest`` (index → stats), ``corpus`` (prep → dup groups →
    leakage-safe split → train shards), ``image`` (quarantined decode →
    dhash dedup → split → aspect batches), ``raster`` (mosaic → resize
    pyramid → overviews).  Re-running skips green stages; ``--invalidate
    STAGE`` re-runs that stage and its suffix.  The store positional
    resolves through the config registry like every other verb."""
    from geowave_spark import checkpoint as CK

    cfg = _load_config(args)
    path = _store_path(cfg, args.store)
    spark = _spark(args, spark_injected)
    runner = {
        "ingest": CK.ingest_pipeline,
        "corpus": CK.corpus_pipeline,
        "image": CK.image_pipeline,
        "raster": CK.raster_pipeline,
        "landsat": CK.landsat_pipeline,
    }[args.which]
    if args.invalidate:
        stages = PIPELINE_STAGES[args.which]
        if args.invalidate not in stages:
            raise SystemExit(
                f"unknown stage {args.invalidate!r} for the {args.which} "
                f"pipeline (stages: {', '.join(stages)})"
            )
        CK.Pipeline(spark, path).invalidate(args.invalidate)
    kw = {}
    # `is not None`, never truthiness: an explicit 0 must reach the
    # pipeline constructor and fail ITS validation loudly, not silently
    # fall back to the default
    if args.which == "corpus" and args.shard_bytes is not None:
        kw["shard_bytes"] = args.shard_bytes
    if args.which == "image" and args.batch_size is not None:
        kw["batch_size"] = args.batch_size
    if args.which == "raster":
        if args.level is not None:
            kw["level"] = args.level
        if args.min_level is not None:
            kw["min_level"] = args.min_level
    if args.which == "landsat":
        if not args.catalog:
            raise SystemExit("pipeline landsat requires --catalog <scene_list.csv>")
        kw["catalog"] = args.catalog
        if args.n_best is not None:
            kw["n_best"] = args.n_best
    pipe = runner(spark, args.src, path, **kw)
    for s in pipe.stages_run:
        print(f"ran\t{s}", file=out)
    for s in pipe.stages_skipped:
        print(f"skipped\t{s}", file=out)
    return 0


def cmd_export(args, spark_injected, out) -> int:
    cfg = _load_config(args)
    path = _store_path(cfg, args.store)
    spark = _spark(args, spark_injected)
    from geowave_spark.operators import index as OI
    from geowave_spark.sources.export import export_vector

    df = OI.read_indexed(spark, path)
    if args.format == "mvt":
        # vector-tile export: per-tile payloads at --level, laid out as a
        # z/x/y.mvt tree in the engine's TMS-style y-up plate-carrée
        # scheme (see service.py header; slippy consumers must flip rows
        # and reproject) — tile COUNT at the
        # export level bounds the driver-side file write; per-tile payload
        # size is bounded by the operator's never-truncate feature guard
        import os as _os

        from geowave_spark.operators import mvt as OMV

        if "seg_j" in df.columns and "x0" in df.columns:
            # segment-grain line store: LINESTRING layer tiles
            tiles = OMV.mvt_line_tiles(df, level=args.level).collect()
        elif "lon_milli" not in df.columns:
            raise ValueError(
                f"store {args.store!r} is not point-grain (no lon_milli "
                "column) — mvt export needs a point or line store"
            )
        else:
            tiles = OMV.mvt_point_tiles(df, level=args.level).collect()
        for r in tiles:
            d = _os.path.join(args.dest, str(args.level), str(r["tile_ix"]))
            _os.makedirs(d, exist_ok=True)
            with open(_os.path.join(d, f"{r['tile_iy']}.mvt"), "wb") as f:
                f.write(bytes(r["mvt"]))
        print(
            f"exported {args.store} -> {args.dest} ({len(tiles)} mvt tiles "
            f"at level {args.level})",
            file=out,
        )
        return 0
    export_vector(df, args.dest, fmt=args.format)
    print(f"exported {args.store} -> {args.dest} ({args.format})", file=out)
    return 0


def cmd_serve(args, spark_injected, out) -> int:
    """Start the embedded HTTP read service (service.py) over every
    registered store — the reference's REST/GeoServer serving surface."""
    cfg = _load_config(args)
    stores = {n: st["path"] for n, st in cfg.get("stores", {}).items()}
    spark = _spark(args, spark_injected)
    from geowave_spark.service import serve

    server = serve(spark, stores, port=args.port, host=args.host)
    print(
        f"serving {len(stores)} store(s) on "
        f"http://{server.server_address[0]}:{server.server_address[1]}/v0/",
        file=out,
    )
    if args.block:
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
    return 0


def cmd_snapshot(args, spark_injected, out) -> int:
    """Snapshot-store operations (operators/snapshots.py): the Iceberg-
    style table-maintenance surface as CLI verbs."""
    from geowave_spark.operators import snapshots as SNAP

    cfg = _load_config(args)
    path = _store_path(cfg, args.snap_store)
    if args.snap_cmd == "log":
        spark = _spark(args, spark_injected)
        for r in sorted(
            SNAP.history(spark, path).collect(), key=lambda r: r["version"]
        ):
            print(
                f"v{r['version']:<4} {r['operation']:<10} "
                f"commits={r['n_commits']} added={r['added_rows']} "
                f"total={r['total_rows']}",
                file=out,
            )
        return 0
    if args.snap_cmd == "rollback":
        v = SNAP.rollback(path, args.version)
        print(f"rolled back {args.snap_store} to v{args.version} (now v{v})",
              file=out)
        return 0
    if args.snap_cmd == "expire":
        res = SNAP.expire(path, keep_last=args.keep)
        print(
            f"expired versions {res['expired_versions']}, "
            f"removed commits {res['removed_commits']}",
            file=out,
        )
        return 0
    spark = _spark(args, spark_injected)
    if args.snap_cmd == "commit":
        from geowave_spark.operators import index as OI

        df = OI.read_indexed(spark, _store_path(cfg, args.src_store))
        if args.upsert_key:
            v = SNAP.commit_upsert(df, path, key_col=args.upsert_key)
        else:
            v = SNAP.commit(df, path, mode=args.mode)
        print(f"committed {args.src_store} -> {args.snap_store} v{v}", file=out)
        return 0
    if args.snap_cmd == "metrics":
        for r in SNAP.partition_metrics(spark, path, args.version).collect():
            print(f"commit={r['commit']} {r[1]!s:>12} rows={r['n_rows']}",
                  file=out)
        return 0
    if args.snap_cmd == "materialize":
        v = SNAP.materialize(spark, path)
        print(f"materialized {args.snap_store} at v{v}", file=out)
        return 0
    raise ValueError(args.snap_cmd)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="geowave_spark")
    p.add_argument("--config", help=f"config JSON (default {DEFAULT_CONFIG})")
    p.add_argument("--master", help="spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("config")
    cs = c.add_subparsers(dest="config_cmd", required=True)
    a = cs.add_parser("addstore")
    a.add_argument("name")
    a.add_argument("--path", required=True)
    a = cs.add_parser("addindex")
    a.add_argument("name")
    # pluggable index strategy (SpatialDimensionalityTypeProvider presets):
    # 'tiered' = Morton tiered SFC (operators/index.py), 's2' = single
    # leaf-sorted S2-analogue curve (operators/s2.py write_s2_store)
    a.add_argument("--strategy", choices=("tiered", "s2"), default="tiered")
    a.add_argument("--res", type=int, default=29)
    a.add_argument("--salt-buckets", type=int, default=8)
    a.add_argument("--salt-mode", choices=("hash", "round_robin"), default="hash")
    cs.add_parser("list")

    i = sub.add_parser("ingest")  # `ingest localtogw` flattened to one verb
    i.add_argument("src")
    i.add_argument("store")
    i.add_argument("index")
    i.add_argument("--format", required=True)
    i.add_argument("--lon-col", default="lon")
    i.add_argument("--lat-col", default="lat")
    i.add_argument("--id-col", default="event_id")
    i.add_argument("--append", action="store_true")
    # source CRS (AddStoreCommand's CRS plugin option): projected x/y in
    # --lon-col/--lat-col are transformed to WGS84 before indexing
    i.add_argument("--crs", default="EPSG:4326")
    # geotiff only: COG overview level to decode (0 = full resolution)
    i.add_argument("--level", type=int, default=0)

    s = sub.add_parser("stat")
    ss = s.add_subparsers(dest="stat_cmd", required=True)
    for v in ("recalc", "liststats"):
        a = ss.add_parser(v)
        a.add_argument("store")

    q = sub.add_parser("query")
    q.add_argument("store")
    q.add_argument("cql")
    q.add_argument("--id-col", default="event_id")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true")
    q.add_argument("--out")
    q.add_argument("--out-format", default="parquet")
    q.add_argument("--auth-file", default=None,
                   help="JSON user->authorizations table "
                        "(JsonFileAuthorizationProvider shape)")
    q.add_argument("--user", default=None,
                   help="--auth-file: user whose auth set filters rows")

    an = sub.add_parser("analytic")
    ans = an.add_subparsers(dest="analytic_cmd", required=True)
    d = ans.add_parser("dbscan")
    d.add_argument("store")
    d.add_argument("--eps-milli", type=int, required=True)
    d.add_argument("--min-pts", type=int, required=True)
    k = ans.add_parser("kde")
    k.add_argument("store")
    k.add_argument("--min-level", type=int, default=4)
    k.add_argument("--max-level", type=int, default=6)
    m = ans.add_parser("kmeans")
    m.add_argument("store")
    m.add_argument("-k", type=int, default=5)
    m.add_argument("--zoom-levels", type=int, default=1)
    n = ans.add_parser("nn")
    n.add_argument("store")
    n.add_argument("--lon", type=float, required=True)
    n.add_argument("--lat", type=float, required=True)
    n.add_argument("-k", type=int, default=10)
    for sp in (d, k, m, n):
        sp.add_argument("--id-col", default="event_id")
        sp.add_argument("--limit", type=int, default=20)
        sp.add_argument("--out")
        sp.add_argument("--out-format", default="parquet")
        sp.add_argument("--cql", help="input CQL filter (KMeansRunner setCqlFilter)")
    for sp in (d, m):  # dbscan + kmeans emit cluster geometries on demand
        sp.add_argument("--hulls", action="store_true")
        sp.add_argument("--concave-threshold", type=float, default=None)

    r = sub.add_parser("remote")  # remote-commands group (store maintenance)
    rs = r.add_subparsers(dest="remote_cmd", required=True)
    for v in ("clear", "mergedata", "listadapter"):
        a = rs.add_parser(v)
        a.add_argument("store")
    a = rs.add_parser("copy")
    a.add_argument("store")
    a.add_argument("dest")
    a.add_argument("--append", action="store_true")
    rs.add_parser("listindex")

    sq = sub.add_parser("sql")  # analytics/spark SparkSqlCommand
    sq.add_argument("sql")
    sq.add_argument("--limit", type=int, default=20)
    sq.add_argument("--explain", action="store_true")
    sq.add_argument("--out")
    sq.add_argument("--out-format", default="csv")  # SqlResultsWriter default

    e = sub.add_parser("export")
    e.add_argument("store")
    e.add_argument("dest")
    e.add_argument("--format", default="parquet")
    e.add_argument("--level", type=int, default=6,
                   help="--format mvt: tile pyramid level")

    sv = sub.add_parser("serve")  # embedded HTTP read service
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--no-block", dest="block", action="store_false",
                    help="return after binding (tests drive the server)")

    sn = sub.add_parser("snapshot")  # Iceberg-style table maintenance
    sns = sn.add_subparsers(dest="snap_cmd", required=True)
    a = sns.add_parser("commit")
    a.add_argument("src_store")
    a.add_argument("snap_store")
    a.add_argument("--mode", default="append",
                   choices=["append", "overwrite"])
    a.add_argument("--upsert-key", default=None,
                   help="merge-on-read upsert keyed on this column")
    for v in ("log", "materialize"):
        a = sns.add_parser(v)
        a.add_argument("snap_store")
    a = sns.add_parser("rollback")
    a.add_argument("snap_store")
    a.add_argument("version", type=int)
    a = sns.add_parser("expire")
    a.add_argument("snap_store")
    a.add_argument("--keep", type=int, default=2)
    a = sns.add_parser("metrics")
    a.add_argument("snap_store")
    a.add_argument("--version", type=int, default=None)

    pl = sub.add_parser("pipeline")  # checkpointed multi-stage DAG runner
    pl.add_argument(
        "which", choices=["ingest", "corpus", "image", "raster", "landsat"]
    )
    pl.add_argument(
        "src", help="sf_dir (ingest/corpus), images parquet path, or scenes glob"
    )
    pl.add_argument("store", help="registered store name (config addstore)")
    pl.add_argument("--invalidate", default=None,
                    help="drop this stage's manifest first (suffix re-runs)")
    pl.add_argument("--shard-bytes", type=int, default=None,
                    help="corpus pipeline: nominal shard size")
    pl.add_argument("--batch-size", type=int, default=None,
                    help="image pipeline: training batch size")
    pl.add_argument("--level", type=int, default=None,
                    help="raster pipeline: base mosaic level")
    pl.add_argument("--catalog", default=None,
                    help="landsat pipeline: scene_list CSV path")
    pl.add_argument("--n-best", type=int, default=None,
                    help="landsat pipeline: scenes kept per (path,row) cell")
    pl.add_argument("--min-level", type=int, default=None,
                    help="raster pipeline: coarsest pyramid level")

    dbg = sub.add_parser("debug")  # reference extensions/cli/debug section
    dbs = dbg.add_subparsers(dest="debug_cmd", required=True)
    for v in ("fullscanMinimal", "fullscan"):
        a = dbs.add_parser(v)
        a.add_argument("store")
    for v in ("bbox", "decomp"):
        a = dbs.add_parser(v)
        a.add_argument("store")
        a.add_argument("minx", type=float)
        a.add_argument("miny", type=float)
        a.add_argument("maxx", type=float)
        a.add_argument("maxy", type=float)
        a.add_argument("--max-cells", type=int, default=1024)

    sub.add_parser("version")
    return p


def main(argv: list[str] | None = None, spark=None, out=None) -> int:
    """Entry point.  ``spark``/``out`` are injectable for in-process tests
    (the packaged form is ``python -m geowave_spark ...``)."""
    out = out or sys.stdout
    args = _build_parser().parse_args(argv)
    if args.cmd == "version":
        print(__version__, file=out)
        return 0
    if args.cmd == "config":
        cmd_config(args, spark, out)
        return 0
    dispatch = {
        "ingest": cmd_ingest,
        "stat": cmd_stat,
        "query": cmd_query,
        "sql": cmd_sql,
        "remote": cmd_remote,
        "analytic": cmd_analytic,
        "export": cmd_export,
        "snapshot": cmd_snapshot,
        "serve": cmd_serve,
        "pipeline": cmd_pipeline,
        "debug": cmd_debug,
    }
    dispatch[args.cmd](args, spark, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
