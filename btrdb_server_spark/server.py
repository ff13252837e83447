"""Wire protocol: the 18 RPCs of btrdb.proto served over JSON/HTTP.

The reference exposes its API as gRPC (grpcinterface/serve.go:63-1011,
btrdb.proto). This environment has no grpc runtime (and installs are not
allowed), so the wire layer speaks the same MESSAGE SHAPES over plain
HTTP/1.1 with Python-stdlib plumbing — a remote client that cannot import
this package can still drive every operation:

    POST /v5/<Method>            body: the proto request message as JSON
                                 (field names exactly as in btrdb.proto;
                                 uuid as a string, not bytes)

- Unary RPCs answer one JSON object shaped like the proto response.
- Streaming RPCs (RawValues, AlignedWindows, Windows, Changes,
  LookupStreams, GenerateCSV — the `returns (stream ...)` set) answer
  `application/x-ndjson`: one response message per line, paged like the
  reference (5000 points / 1000 ranges / 200 descriptors per message;
  CSV one row per message), so a client parses fixed-size messages
  regardless of result size. The server materializes the page list on
  the driver before writing (it has already collected the result to
  serialize it) — deliberate, so the request lock never spans a write
  to a possibly-slow client socket.
- Every response carries `stat`: {"code": 0, "msg": ""} on success, a
  bte/errors.go-mirrored code (constants.py:53-65) on failure — errors
  are a payload, not an HTTP 5xx, matching gRPC semantics.

Scale stance: this is a CONTROL-PLANE door, not the data plane. Results
stream through the driver by design (the reference's gRPC responses do
too — serve.go pages qtree results through one goroutine); bulk analytics
belong on the embedded DataFrame API / SQL surface, where results never
leave the cluster. Requests are serialized with a coarse lock: the
parallelism lives INSIDE each Spark job, and facade mutations (write
buffer, registry CAS) are not concurrency-safe per stream — the reference
holds per-stream mutexes for the same reason (pqm.go).

FaultInject mirrors the reference's default-disabled behavior
(serve.go:797-822 requires BTRDB_ENABLE_FAULT_INJECT): it answers an
error status unless enable_fault_inject=True, and even then only echoes —
there is nothing to corrupt on purpose in a test build.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from btrdb_server_spark.constants import ERR_NO_SUCH_POINT
from btrdb_server_spark.store import BTrDBError

# Response paging mirrors the reference (serve.go:63-68): 5000 raw/stat
# points, 1000 changed ranges, 200 stream descriptors per message.
STREAM_BATCH = 5000
RANGE_BATCH = 1000
LOOKUP_BATCH = 200

_OK = {"code": 0, "msg": ""}


def _kv(d: Optional[dict]) -> list[dict]:
    """map -> repeated KeyValue (proto KeyValue {key, value})."""
    return [{"key": k, "value": v} for k, v in sorted((d or {}).items())]


def _from_kv(rows: Optional[list]) -> dict:
    """repeated KeyValue/KeyOptValue JSON -> python dict.

    KeyOptValue's absent value means "key present, any value" for lookup
    filters and "delete this key" for annotation changes — both map to
    None, matching the facade's convention.
    """
    out = {}
    for r in rows or []:
        if "val" in r:  # KeyOptValue { key, OptValue val { string value } }
            v = r["val"].get("value") if isinstance(r["val"], dict) else r["val"]
        else:
            v = r.get("value")
        out[r["key"]] = v
    return out


def _descriptor(row) -> dict:
    return {
        "uuid": row["uuid"],
        "collection": row["collection"],
        "tags": _kv(row["tags"]),
        "annotations": _kv(row["annotations"]),
        "annotationVersion": row["annotation_version"],
    }


class BTrDBHttpServer:
    """Serve a BTrDB facade over JSON/HTTP. start() binds an ephemeral (or
    given) port and serves on a daemon thread; stop() shuts down."""

    def __init__(self, db, host: str = "127.0.0.1", port: int = 0,
                 enable_fault_inject: bool = False):
        self.db = db
        self._lock = threading.Lock()
        self._enable_fault_inject = enable_fault_inject
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet: tests/benches drive this hard
                pass

            def do_POST(self):
                outer._dispatch(self)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def start(self) -> "BTrDBHttpServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    # ------------------------------------------------------------ dispatch --

    def _dispatch(self, h: BaseHTTPRequestHandler) -> None:
        path = h.path.rstrip("/")
        if not path.startswith("/v5/"):
            h.send_error(404, "endpoint is /v5/<Method>")
            return
        method = path[len("/v5/"):]
        fn = getattr(self, f"rpc_{method}", None)
        if fn is None:
            h.send_error(404, f"no such RPC: {method}")
            return
        n = int(h.headers.get("Content-Length", 0))
        try:
            req = json.loads(h.rfile.read(n) or b"{}")
        except json.JSONDecodeError:
            h.send_error(400, "body must be JSON")
            return
        # The lock covers the RPC call and the DRAINING of any streamed
        # generation (the facade mutation + Spark collect), but NOT the
        # socket writes: a slow or stalled client must never wedge the
        # server by blocking h.wfile.write while holding the lock. Pages
        # are materialized under the lock (the driver has already
        # collected the result to serialize it anyway) and written out
        # afterwards. ANY exception — not just BTrDBError — becomes a
        # coded stat payload: "errors are a payload, not a dead socket"
        # is the wire contract, and a TypeError from a wrong-typed JSON
        # field must not reset the connection.
        msgs: Optional[list] = None
        with self._lock:
            try:
                out = fn(req)
                if hasattr(out, "__next__"):  # streaming RPC -> ndjson
                    msgs = []
                    try:
                        for msg in out:
                            msgs.append(msg)
                    except BTrDBError as e:
                        msgs.append({"stat": {"code": e.code, "msg": str(e)}})
                    except Exception as e:  # noqa: BLE001 — wire boundary
                        msgs.append({"stat": {"code": 500, "msg": repr(e)}})
            except BTrDBError as e:
                out = {"stat": {"code": e.code, "msg": str(e)}}
            except KeyError as e:
                out = {"stat": {"code": 400, "msg": f"missing field {e}"}}
            except Exception as e:  # noqa: BLE001 — wire boundary
                out = {"stat": {"code": 500, "msg": repr(e)}}
        if msgs is not None:
            h.send_response(200)
            h.send_header("Content-Type", "application/x-ndjson")
            h.send_header("Transfer-Encoding", "chunked")
            h.end_headers()
            for msg in msgs:
                line = json.dumps(msg).encode() + b"\n"
                h.wfile.write(f"{len(line):x}\r\n".encode() + line + b"\r\n")
            h.wfile.write(b"0\r\n\r\n")
            return
        body = json.dumps(out).encode()
        h.send_response(200)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    # ------------------------------------------------------- value mappers --

    def _versions(self, uuid: str) -> dict:
        major, minor = self.db.query_version(uuid)
        return {"versionMajor": major, "versionMinor": minor}

    def _stream_df(self, df, uuid: str, row_fn, values_key: str = "values",
                   batch: int = STREAM_BATCH):
        """Yield proto-shaped streamed messages, `batch` values each.
        The DataFrame is collected through Arrow in one driver pass and
        paged out — the same driver-bound shape as the reference's gRPC
        response loop."""
        ver = self._versions(uuid) if uuid is not None else {}
        pdf = df.toPandas()
        rows = [row_fn(r) for r in pdf.itertuples(index=False)]
        del pdf  # one driver copy from here on, not two
        if not rows:
            yield {"stat": _OK, **ver, values_key: []}
            return
        for i in range(0, len(rows), batch):
            yield {"stat": _OK, **ver, values_key: rows[i : i + batch]}

    # ------------------------------------------------------------ the RPCs --

    def rpc_RawValues(self, req):
        df = self.db.raw_values(
            req["uuid"], req["start"], req["end"], req.get("versionMajor") or None
        )
        return self._stream_df(
            df, req["uuid"], lambda r: {"time": int(r.time), "value": float(r.value)}
        )

    def rpc_AlignedWindows(self, req):
        df = self.db.aligned_windows(
            req["uuid"], req["start"], req["end"], req["pointWidth"],
            req.get("versionMajor") or None,
        )
        return self._stream_df(df, req["uuid"], _stat_point)

    def rpc_Windows(self, req):
        df = self.db.windows(
            req["uuid"], req["start"], req["end"], req["width"],
            req.get("depth", 0), req.get("versionMajor") or None,
        )
        return self._stream_df(df, req["uuid"], _stat_point)

    def rpc_StreamInfo(self, req):
        info = self.db.stream_info(req["uuid"])
        out = {"stat": _OK, **self._versions(req["uuid"])}
        if not req.get("omitDescriptor"):
            out["descriptor"] = _descriptor(info)
        return out

    def rpc_SetStreamAnnotations(self, req):
        self.db.set_stream_annotations(
            req["uuid"],
            req["expectedAnnotationVersion"],
            _from_kv(req.get("annotations")),
        )
        return {"stat": _OK}

    def rpc_Create(self, req):
        self.db.create(
            req["uuid"], req["collection"],
            _from_kv(req.get("tags")), _from_kv(req.get("annotations")),
        )
        return {"stat": _OK}

    def rpc_ListCollections(self, req):
        df = self.db.list_collections(
            req.get("prefix", ""), req.get("startWith", ""), req.get("limit") or 1000
        )
        return {
            "stat": _OK,
            "collections": [r.collection for r in df.collect()],
        }

    def rpc_LookupStreams(self, req):
        df = self.db.lookup_streams(
            req.get("collection", ""),
            req.get("isCollectionPrefix", True),
            _from_kv(req.get("tags")) or None,
            _from_kv(req.get("annotations")) or None,
        )
        return self._stream_df(
            df.orderBy("uuid"), None, lambda r: _descriptor(r._asdict()),
            values_key="results", batch=LOOKUP_BATCH,
        )

    def rpc_Nearest(self, req):
        df = self.db.nearest(
            req["uuid"], req["time"], req.get("backward", False),
            req.get("versionMajor") or None,
        )
        rows = df.collect()
        if not rows:
            return {"stat": {"code": ERR_NO_SUCH_POINT, "msg": "no such point"}}
        return {
            "stat": _OK,
            **self._versions(req["uuid"]),
            "value": {"time": rows[0].time, "value": rows[0].value},
        }

    def rpc_Changes(self, req):
        df = self.db.changes(
            req["uuid"], req.get("fromMajor", 0), req["toMajor"],
            req.get("resolution", 0),
        )
        return self._stream_df(
            df, req["uuid"], lambda r: {"start": int(r.start), "end": int(r.end)},
            values_key="ranges", batch=RANGE_BATCH,
        )

    def rpc_Insert(self, req):
        self.db.insert(
            req["uuid"], [(p["time"], p["value"]) for p in req.get("values", [])]
        )
        if req.get("sync"):
            self.db.flush(req["uuid"])
        return {"stat": _OK, **self._versions(req["uuid"])}

    def rpc_Delete(self, req):
        self.db.delete(req["uuid"], req["start"], req["end"])
        return {"stat": _OK, **self._versions(req["uuid"])}

    def rpc_Info(self, req):
        info = self.db.info()
        return {
            "stat": _OK,
            "majorVersion": info["majorVersion"],
            "minorVersion": info["minorVersion"],
            "build": info["build"],
            "proxy": info["proxy"],
        }

    def rpc_FaultInject(self, req):
        if not self._enable_fault_inject:
            # serve.go:797-822: disabled unless explicitly enabled at boot
            return {"stat": {"code": 500, "msg": "fault injection disabled"}}
        return {"stat": _OK, "rv": req.get("params", "")}

    def rpc_Flush(self, req):
        self.db.flush(req["uuid"])
        return {"stat": _OK, **self._versions(req["uuid"])}

    def rpc_Obliterate(self, req):
        self.db.obliterate(req["uuid"])
        return {"stat": _OK}

    def rpc_GetMetadataUsage(self, req):
        tags, anns = self.db.get_metadata_usage(req.get("prefix", ""))
        return {
            "stat": _OK,
            "tags": [{"key": r.key, "count": r.cnt} for r in tags.collect()],
            "annotations": [{"key": r.key, "count": r.cnt} for r in anns.collect()],
        }

    def rpc_GenerateCSV(self, req):
        uuids = req["uuids"]
        df = self.db.generate_csv(
            uuids, req["start"], req["end"], req.get("pointWidth") or None,
            req.get("versionMajor") or None,
        )
        cols = df.columns

        def gen():
            # header message first, then one message per row — the
            # reference's GenerateCSVResponse is likewise one row each
            # (isHeader page + row pages, csv.go)
            yield {"stat": _OK, "isHeader": True, "row": cols}
            pdf = df.toPandas()
            for tup in pdf.itertuples(index=False):
                yield {
                    "stat": _OK,
                    "isHeader": False,
                    "row": ["" if v is None or v != v else str(v) for v in tup],
                }

        return gen()


def _stat_point(r) -> dict:
    return {
        "time": int(r.time),
        "min": float(r.min),
        "mean": float(r.mean),
        "max": float(r.max),
        "count": int(r.count),
    }
