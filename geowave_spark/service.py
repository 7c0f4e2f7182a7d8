"""Embedded HTTP read service — the serving surface of the engine.

The reference exposes its stores through a REST services module
(`/root/reference/services/` — rest + grpc) and serves map output
through its GeoServer plugin (`extensions/cli/geoserver/`).  This module
is that read surface re-expressed over the PySpark engine with only the
standard library (no web framework in-sandbox): JSON query endpoints
riding the SAME CQL planner the CLI uses, plus TMS-style vector tiles
computed on demand from the MVT operator.

Tile scheme: the grid is the engine's 2^z × 2^z plate-carrée
(equirectangular) plate with ``y`` counted UPWARD from the south pole —
TMS row order, NOT the slippy/XYZ y-down Web Mercator grid that
MapLibre/deck.gl default to.  A slippy consumer must flip rows
(``y_slippy = 2^z - 1 - y``) AND reproject; the scheme is kept native
because every engine operator (tile cover, KDE, render) shares this
grid and the oracle replays depend on its integer arithmetic.

Reads dominate; the POST write verbs mirror the CLI operation tree the
way the reference's REST module enumerates CLI operations as routes
(services/rest/.../RestRoute.java) — one bounded batch per request,
bulk ingest stays on the CLI/DataFrame surface.  Spark driver access is
serialized with one lock: the
HTTP layer is a thin concierge, the heavy lifting is the distributed
job it triggers (per-request fan-out belongs to Spark, not to HTTP
threads).

Routes::

    GET /v0/version
    GET /v0/stores                               config store map
    GET /v0/stores/<name>/stats                  rows + occupied tiers
    GET /v0/stores/<name>/query?cql=...&limit=N  JSON rows (CQL planner)
    GET /v0/tiles/<name>/<z>/<x>/<y>.mvt         vector tile (points; TMS
                                                 y-up plate-carrée rows)
    POST /v0/stores/<name>/ingest                {rows, mode} indexed write
    POST /v0/stores/<name>/compact               store compaction
    POST /v0/stores/<name>/snapshot/commit       {rows, mode} -> version
    POST /v0/stores/<name>/snapshot/rollback     {version}
    POST /v0/stores/<name>/snapshot/expire       {keep_last}

Tile requests prefilter with the engine's integer tile-bounds inversion
(exact: the half-open milli-degree interval whose grid image is the
requested tile), so a tile read scans only the matching cell partitions
— the serving path inherits the store's pruning."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F

from geowave_spark import __version__

MAX_LIMIT = 10_000  # rows a single JSON response may carry (never a dump)


def _ceil_div(a: int, b: int) -> int:
    return -((-a) // b)


def tile_bounds_milli(z: int, x: int, y: int) -> tuple[int, int, int, int]:
    """EXACT inverse of the engine's tile assignment: the half-open
    milli-degree box whose grid image at level ``z`` is tile (x, y) —
    lon m is in tile x  iff  (m + 180000) * 2^z // 360000 == x, i.e.
    m ∈ [ceil(x·360000 / 2^z) − 180000, ceil((x+1)·360000 / 2^z) − 180000).
    Returns (minx, miny, maxx_excl, maxy_excl)."""
    n = 1 << z
    minx = _ceil_div(x * 360_000, n) - 180_000
    maxx = _ceil_div((x + 1) * 360_000, n) - 180_000
    miny = _ceil_div(y * 180_000, n) - 90_000
    maxy = _ceil_div((y + 1) * 180_000, n) - 90_000
    return minx, miny, maxx, maxy


class GeoWaveService:
    """Request handlers bound to one SparkSession + one store map
    (``stores``: name → indexed-store path).  Transport-agnostic: the
    HTTP layer below and in-process tests call these directly."""

    def __init__(self, spark, stores: dict[str, str]):
        self.spark = spark
        self.stores = dict(stores)
        self.lock = threading.Lock()
        self._cache: dict[str, object] = {}

    def _data(self, name: str):
        if name not in self.stores:
            raise KeyError(f"unknown store {name!r}")
        if name not in self._cache:
            from geowave_spark.operators import index as OI

            self._cache[name] = OI.read_indexed(self.spark, self.stores[name])
        return self._cache[name]

    # ---- endpoint bodies (each returns a JSON-able object or bytes) ----

    def version(self):
        return {"engine": "geowave_spark", "version": __version__}

    def store_list(self):
        return {"stores": sorted(self.stores)}

    def stats(self, name: str):
        from geowave_spark.operators.index import read_stats_tiers

        with self.lock:
            df = self._data(name)
            n = df.count()
            try:
                tiers = read_stats_tiers(self.spark, self.stores[name])
            except Exception:
                tiers = None
        return {"store": name, "rows": n, "tiers": tiers}

    def query(self, name: str, cql: str, limit: int = 100):
        if not cql:
            raise ValueError("missing cql parameter")
        limit = max(1, min(int(limit), MAX_LIMIT))
        from geowave_spark.plans.cql import cql_query

        with self.lock:
            df = self._data(name)
            rows = [
                r.asDict(recursive=True)
                for r in cql_query(df, cql).limit(limit).collect()
            ]
        return {"store": name, "cql": cql, "rows": rows, "n": len(rows)}

    # ---- write surface (the reference's services/rest exposes the CLI
    # operation tree over HTTP — RestRoute.java enumerates operations from
    # the CLI registry; these POST bodies mirror the cli.py verbs:
    # ingest, remote mergedata, snapshot commit/rollback/expire) ----

    MAX_INGEST_ROWS = 100_000  # HTTP ingest is a trickle path; bulk data
    # belongs on the CLI/DataFrame surface (one POST = one bounded batch)

    def _ingest_df(self, rows: list[dict]):
        import pandas as pd

        if not rows:
            raise ValueError("ingest body needs a non-empty 'rows' list")
        if len(rows) > self.MAX_INGEST_ROWS:
            raise ValueError(
                f"ingest batch of {len(rows)} exceeds "
                f"{self.MAX_INGEST_ROWS}; split the batch"
            )
        need = {"id", "lon", "lat"}
        for r in rows:
            if not need <= set(r):
                raise ValueError(f"every row needs {sorted(need)}; got {sorted(r)}")
        pdf = pd.DataFrame(rows)
        # stored under the engine's canonical id column (every query path
        # — CQL dedup, kNN, subsample — keys on event_id)
        pdf = pdf.rename(columns={"id": "event_id"})
        pdf["event_id"] = pdf["event_id"].astype("int64")
        for c in ("lon", "lat"):
            pdf[c] = pdf[c].astype("float64")
        df = self.spark.createDataFrame(pdf)
        return df.withColumn(
            "lon_milli", F.round(F.col("lon") * 1000).cast("long")
        ).withColumn("lat_milli", F.round(F.col("lat") * 1000).cast("long"))

    def ingest(self, name: str, rows: list[dict], mode: str = "append"):
        """POST rows into an indexed point store (cli.py `ingest` over
        HTTP).  Appends must match the stored schema — loud 400, never a
        silent schema drift."""
        from geowave_spark.operators import index as OI

        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, not {mode!r}")
        if name not in self.stores:
            raise KeyError(f"unknown store {name!r}")
        with self.lock:
            df = self._ingest_df(rows)
            indexed = OI.index_points(df, id_col="event_id")
            import os

            path = self.stores[name]
            if mode == "append" and os.path.isdir(path):
                stored = set(self._data(name).columns)
                if set(indexed.columns) != stored:
                    raise ValueError(
                        f"append schema mismatch: stored={sorted(stored)} "
                        f"incoming={sorted(indexed.columns)}"
                    )
            OI.write_indexed(indexed, path, mode=mode)
            self._cache.pop(name, None)
        return {"store": name, "ingested": len(rows), "mode": mode}

    def compact(self, name: str):
        """POST store compaction (cli.py `remote mergedata`)."""
        from geowave_spark.operators.compact import compact_store

        if name not in self.stores:
            raise KeyError(f"unknown store {name!r}")
        with self.lock:
            res = compact_store(self.spark, self.stores[name])
            self._cache.pop(name, None)
        return {"store": name, **({"result": res} if isinstance(res, dict) else {})}

    def snapshot_verb(self, name: str, verb: str, body: dict):
        """POST snapshot table maintenance (cli.py `snapshot` group):
        commit (rows -> new version), rollback {version}, expire
        {keep_last}."""
        from geowave_spark.operators import index as OI
        from geowave_spark.operators import snapshots as SN

        if name not in self.stores:
            raise KeyError(f"unknown store {name!r}")
        path = self.stores[name]
        with self.lock:
            if verb == "commit":
                df = self._ingest_df(body.get("rows", []))
                indexed = OI.index_points(df, id_col="event_id")
                v = SN.commit(indexed, path,
                              mode=body.get("mode", "append"))
                self._cache.pop(name, None)
                return {"store": name, "version": v}
            if verb == "rollback":
                if "version" not in body:
                    raise ValueError("rollback needs {'version': N}")
                v = SN.rollback(path, int(body["version"]))
                self._cache.pop(name, None)
                return {"store": name, "version": v}
            if verb == "expire":
                res = SN.expire(path, keep_last=int(body.get("keep_last", 2)))
                return {"store": name, **res}
            raise ValueError(f"unknown snapshot verb {verb!r}")

    def tile(self, name: str, z: int, x: int, y: int) -> bytes:
        if not (0 <= x < (1 << z) and 0 <= y < (1 << z)):
            raise ValueError(f"tile ({x}, {y}) out of range at level {z}")
        from geowave_spark.operators import mvt as OMV

        minx, miny, maxx, maxy = tile_bounds_milli(z, x, y)
        with self.lock:
            df = self._data(name)
            if "x0" in df.columns and "x1" in df.columns:
                # segment-grain LINE store (operators/lines.py): envelope
                # prefilter on the tile preimage, then the line-tile
                # operator; segments extending past the tile may emit
                # neighbor tiles too — keep only the requested one
                from geowave_spark.operators.lines import SEG_ENV_COLS

                mnx, mny, mxx, mxy = (F.col(c) for c in SEG_ENV_COLS)
                part = df.filter(
                    (mnx < maxx) & (mxx >= minx) & (mny < maxy) & (mxy >= miny)
                )
                rows = [
                    r for r in OMV.mvt_line_tiles(part, level=z).collect()
                    if r["tile_ix"] == x and r["tile_iy"] == y
                ]
                return bytes(rows[0]["mvt"]) if rows else b""
            if "lon_milli" not in df.columns:
                raise ValueError(
                    f"store {name!r} has no point coordinates "
                    "(envelope-grain stores are not tile-servable yet)"
                )
            # exact half-open prefilter = the tile's preimage, so the
            # groupBy sees ONLY this tile's rows (one group)
            part = df.filter(
                (F.col("lon_milli") >= minx) & (F.col("lon_milli") < maxx)
                & (F.col("lat_milli") >= miny) & (F.col("lat_milli") < maxy)
            )
            rows = OMV.mvt_point_tiles(part, level=z).collect()
        if not rows:
            return b""  # empty tile: 204-style zero-byte payload
        assert len(rows) == 1 and rows[0]["tile_ix"] == x and rows[0]["tile_iy"] == y
        return bytes(rows[0]["mvt"])


class _Handler(BaseHTTPRequestHandler):
    service: GeoWaveService  # bound by serve()

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):  # noqa: N802 (stdlib naming)
        try:
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if parts == ["v0", "version"]:
                return self._json(200, self.service.version())
            if parts == ["v0", "stores"]:
                return self._json(200, self.service.store_list())
            if len(parts) == 4 and parts[:2] == ["v0", "stores"]:
                name = parts[2]
                if parts[3] == "stats":
                    return self._json(200, self.service.stats(name))
                if parts[3] == "query":
                    return self._json(
                        200,
                        self.service.query(
                            name, q.get("cql", ""), int(q.get("limit", 100))
                        ),
                    )
            if (
                len(parts) == 6
                and parts[:2] == ["v0", "tiles"]
                and parts[5].endswith(".mvt")
            ):
                body = self.service.tile(
                    parts[2], int(parts[3]), int(parts[4]),
                    int(parts[5][: -len(".mvt")]),
                )
                return self._send(
                    200 if body else 204, body,
                    "application/vnd.mapbox-vector-tile",
                )
            return self._json(404, {"error": f"no route {u.path}"})
        except KeyError as e:
            return self._json(404, {"error": str(e)})
        except (ValueError, TypeError) as e:
            return self._json(400, {"error": str(e)})
        except Exception as e:  # surface, never hang the socket
            return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    MAX_BODY = 32 << 20  # one POST = one bounded batch, never a stream

    def _read_body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        if n > self.MAX_BODY:
            raise ValueError(f"body of {n} bytes exceeds {self.MAX_BODY}")
        raw = self.rfile.read(n) if n else b"{}"
        body = json.loads(raw or b"{}")
        if not isinstance(body, dict):
            raise ValueError("POST body must be a JSON object")
        return body

    def do_POST(self):  # noqa: N802 (stdlib naming)
        try:
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            if len(parts) == 4 and parts[:2] == ["v0", "stores"]:
                name, verb = parts[2], parts[3]
                body = self._read_body()
                if verb == "ingest":
                    return self._json(200, self.service.ingest(
                        name, body.get("rows", []),
                        body.get("mode", "append"),
                    ))
                if verb == "compact":
                    return self._json(200, self.service.compact(name))
            if (
                len(parts) == 5
                and parts[:2] == ["v0", "stores"]
                and parts[3] == "snapshot"
            ):
                return self._json(200, self.service.snapshot_verb(
                    parts[2], parts[4], self._read_body()
                ))
            return self._json(404, {"error": f"no route POST {u.path}"})
        except KeyError as e:
            return self._json(404, {"error": str(e)})
        except (ValueError, TypeError) as e:
            return self._json(400, {"error": str(e)})
        except Exception as e:
            return self._json(500, {"error": f"{type(e).__name__}: {e}"})


def serve(spark, stores: dict[str, str], port: int = 8080,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Build (and return) the HTTP server — caller decides the lifecycle
    (`serve_forever()` on the CLI, a daemon thread in tests).  ``port=0``
    binds an ephemeral port (``server.server_address[1]``)."""
    svc = GeoWaveService(spark, stores)
    handler = type("BoundHandler", (_Handler,), {"service": svc})
    return ThreadingHTTPServer((host, port), handler)
