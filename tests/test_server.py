"""Wire-protocol tests: drive every btrdb.proto RPC over JSON/HTTP with a
stdlib urllib client — no package import on the client side of the wire.

Mirrors the reference's gRPC surface (grpcinterface/serve.go:63-1011):
unary RPCs answer one proto-shaped JSON object; streaming RPCs answer
ndjson pages with batched values; errors come back as bte-coded stat
payloads, not HTTP failures.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from btrdb_server_spark.api import BTrDB
from btrdb_server_spark.constants import (
    ERR_ANN_VERSION_MISMATCH,
    ERR_INVALID_POINT_WIDTH,
    ERR_NO_SUCH_POINT,
)
from btrdb_server_spark.server import BTrDBHttpServer


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    db = BTrDB(
        spark,
        str(tmp_path_factory.mktemp("wire")),
        buffer_commit_threshold=1 << 30,  # keep writes buffered: minor versions
    )
    s = BTrDBHttpServer(db).start()
    yield s
    s.stop()


def call(srv, method: str, body: dict):
    req = urllib.request.Request(
        f"{srv.address}/v5/{method}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        ctype = r.headers.get("Content-Type", "")
        raw = r.read().decode()
    if "ndjson" in ctype:
        return [json.loads(line) for line in raw.splitlines() if line]
    return json.loads(raw)


def test_wire_create_insert_read_cycle(srv):
    assert call(srv, "Create", {
        "uuid": "w1", "collection": "wire/a",
        "tags": [{"key": "kind", "value": "sensor"}],
        "annotations": [{"key": "note", "value": "hello"}],
    })["stat"]["code"] == 0

    ins = call(srv, "Insert", {
        "uuid": "w1", "sync": False,
        "values": [{"time": 100 + i, "value": float(i)} for i in range(64)],
    })
    assert ins["stat"]["code"] == 0
    # unflushed points live in the buffer: minor version counts them
    assert (ins["versionMajor"], ins["versionMinor"]) == (0, 64)

    pages = call(srv, "RawValues", {"uuid": "w1", "start": 0, "end": 10_000})
    vals = [v for p in pages for v in p["values"]]
    assert [v["time"] for v in vals] == list(range(100, 164))
    assert all(p["stat"]["code"] == 0 for p in pages)

    fl = call(srv, "Flush", {"uuid": "w1"})
    assert (fl["versionMajor"], fl["versionMinor"]) == (1, 0)


def test_wire_stat_and_nearest(srv):
    pages = call(srv, "AlignedWindows", {
        "uuid": "w1", "start": 0, "end": 1 << 12, "pointWidth": 5,
    })
    vals = [v for p in pages for v in p["values"]]
    assert sum(v["count"] for v in vals) == 64
    assert all(v["min"] <= v["mean"] <= v["max"] for v in vals)

    w = call(srv, "Windows", {
        "uuid": "w1", "start": 100, "end": 164, "width": 32, "depth": 0,
    })
    assert sum(v["count"] for p in w for v in p["values"]) == 64

    # A2 count=0 holes stream cleanly: null stats are OMITTED (proto3
    # JSON absent-equals-default), count present and zero.
    wh = call(srv, "Windows", {
        "uuid": "w1", "start": 100, "end": 228, "width": 32, "depth": 0,
    })
    vals = [v for p in wh for v in p["values"]]
    assert [v["count"] for v in vals] == [32, 32, 0, 0]
    holes = [v for v in vals if v["count"] == 0]
    assert all("min" not in v and "mean" not in v for v in holes)
    assert all(v["time"] in (100, 132, 164, 196) for v in vals)

    near = call(srv, "Nearest", {"uuid": "w1", "time": 150, "backward": True})
    assert near["value"] == {"time": 149, "value": 49.0}
    miss = call(srv, "Nearest", {"uuid": "w1", "time": 50, "backward": True})
    assert miss["stat"]["code"] == ERR_NO_SUCH_POINT


def test_wire_metadata_plane(srv):
    call(srv, "Create", {"uuid": "w2", "collection": "wire/b",
                         "tags": [{"key": "kind", "value": "actuator"}]})
    cols = call(srv, "ListCollections", {"prefix": "wire/"})
    assert cols["collections"] == ["wire/a", "wire/b"]

    found = call(srv, "LookupStreams", {
        "collection": "wire/", "isCollectionPrefix": True,
        "tags": [{"key": "kind", "val": {"value": "sensor"}}],
    })
    descs = [d for p in found for d in p["results"]]
    assert [d["uuid"] for d in descs] == ["w1"]
    assert descs[0]["tags"] == [{"key": "kind", "value": "sensor"}]

    info = call(srv, "StreamInfo", {"uuid": "w1"})
    assert info["descriptor"]["collection"] == "wire/a"
    assert info["descriptor"]["annotationVersion"] == 1

    # CAS annotation write: wrong expected version is a coded error
    bad = call(srv, "SetStreamAnnotations", {
        "uuid": "w1", "expectedAnnotationVersion": 99,
        "annotations": [{"key": "note", "val": {"value": "v2"}}],
    })
    assert bad["stat"]["code"] == ERR_ANN_VERSION_MISMATCH
    ok = call(srv, "SetStreamAnnotations", {
        "uuid": "w1", "expectedAnnotationVersion": 1,
        "annotations": [{"key": "note", "val": {"value": "v2"}}],
    })
    assert ok["stat"]["code"] == 0

    usage = call(srv, "GetMetadataUsage", {"prefix": "wire/"})
    assert {"key": "kind", "count": 2} in usage["tags"]


def test_wire_delete_changes_csv_info(srv):
    call(srv, "Insert", {"uuid": "w2", "sync": True,
                         "values": [{"time": t, "value": 1.0} for t in (5, 6, 7)]})
    d = call(srv, "Delete", {"uuid": "w2", "start": 6, "end": 7})
    assert d["stat"]["code"] == 0
    left = call(srv, "RawValues", {"uuid": "w2", "start": 0, "end": 100})
    assert [v["time"] for p in left for v in p["values"]] == [5, 7]

    ch = call(srv, "Changes", {"uuid": "w2", "fromMajor": 0,
                               "toMajor": d["versionMajor"], "resolution": 0})
    ranges = [r for p in ch for r in p["ranges"]]
    assert ranges and all(r["end"] > r["start"] for r in ranges)

    csv = call(srv, "GenerateCSV", {"uuids": ["w1", "w2"],
                                    "start": 0, "end": 10_000})
    assert csv[0]["isHeader"] and csv[0]["row"][0] == "time"
    body = [m["row"] for m in csv[1:]]
    assert len(body) == 66  # 64 w1 points + (5, 7) from w2

    info = call(srv, "Info", {})
    assert info["build"] == "btrdb_server_spark"

    fi = call(srv, "FaultInject", {"type": 1})
    assert fi["stat"]["code"] != 0  # disabled unless enabled at boot


def test_wire_errors_are_coded_payloads(srv):
    bad_pw = call(srv, "AlignedWindows", {
        "uuid": "w1", "start": 0, "end": 100, "pointWidth": 99,
    })
    # streaming RPC that fails at plan time still answers a coded payload
    first = bad_pw[0] if isinstance(bad_pw, list) else bad_pw
    assert first["stat"]["code"] == ERR_INVALID_POINT_WIDTH

    ob = call(srv, "Obliterate", {"uuid": "w2"})
    assert ob["stat"]["code"] == 0
    gone = call(srv, "LookupStreams", {"collection": "wire/b",
                                       "isCollectionPrefix": False})
    assert [d for p in gone for d in p["results"]] == []


def test_wire_concurrent_requests_are_serialized_safely(srv):
    """8 client threads interleaving inserts and reads on separate streams:
    the coarse request lock must keep facade mutations consistent — every
    thread's final flushed read-back is exactly its own writes."""
    import threading

    call(srv, "Create", {"uuid": "cc-seed", "collection": "wire/cc"})
    errs, results = [], {}

    def worker(i: int) -> None:
        try:
            u = f"cc{i}"
            call(srv, "Create", {"uuid": u, "collection": "wire/cc"})
            for j in range(3):
                call(srv, "Insert", {"uuid": u, "sync": True, "values": [
                    {"time": 10 * j + t, "value": float(i)} for t in range(4)
                ]})
            pages = call(srv, "RawValues", {"uuid": u, "start": 0, "end": 1000})
            results[i] = [v for p in pages for v in p["values"]]
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    for i in range(8):
        vals = results[i]
        assert len(vals) == 12
        assert all(v["value"] == float(i) for v in vals)


def test_wire_streams_pages_without_driver_materialization(srv, monkeypatch):
    """Streaming RPCs page through toLocalIterator — the whole result is
    never materialized on the driver. Proven by poisoning toPandas (the old
    materializing path) and collect for the duration of a multi-page
    RawValues: if any code path tried to gather the full result
    driver-side, the request would answer a coded 500 payload instead of
    clean pages."""
    from pyspark.sql import DataFrame

    call(srv, "Create", {"uuid": "big1", "collection": "wire/big"})
    for lo in range(0, 12_000, 4_000):
        call(srv, "Insert", {"uuid": "big1", "sync": True, "values": [
            {"time": t, "value": float(t)} for t in range(lo, lo + 4_000)
        ]})

    def boom(self, *a, **k):  # pragma: no cover - must never run
        raise AssertionError("driver-side materialization in streaming RPC")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    pages = call(srv, "RawValues", {"uuid": "big1", "start": 0, "end": 10**9})
    assert all(p["stat"]["code"] == 0 for p in pages)
    # 5000 is a MAX batch size (serve.go:63-68): partition-boundary pages
    # may run short, but no page overflows and nothing is lost/reordered.
    sizes = [len(p["values"]) for p in pages]
    assert max(sizes) <= 5000 and len(pages) >= 3
    times = [v["time"] for p in pages for v in p["values"]]
    assert times == list(range(12_000))


def test_wire_slow_client_drain_does_not_block_other_rpcs(srv):
    """The request lock is scoped to planning + the first page: a client
    that stalls mid-drain (response socket open, barely read) must not
    wedge the server — reads AND facade mutations on other connections
    complete while the stalled drain is pending."""
    import http.client
    import time

    host = srv.address.split("//", 1)[1]
    conn = http.client.HTTPConnection(host, timeout=300)
    conn.request(
        "POST", "/v5/RawValues",
        body=json.dumps({"uuid": "big1", "start": 0, "end": 10**9}),
    )
    resp = conn.getresponse()
    assert resp.read(64)  # leave the rest unread: drain is now stalled
    try:
        t0 = time.perf_counter()
        info = call(srv, "Info", {})
        ins = call(srv, "Insert", {"uuid": "big1", "sync": True, "values": [
            {"time": 10**15, "value": 1.0},
        ]})
        assert info["build"] == "btrdb_server_spark"
        assert ins["stat"]["code"] == 0
        assert time.perf_counter() - t0 < 60
    finally:
        resp.read()
        conn.close()


def test_wire_arrow_bulk_lane(srv):
    """The Arrow IPC extension lane: one valid IPC stream per request,
    produced executor-side (driver work O(batches)); values bit-identical
    to the JSON lane; an empty range answers schema-then-EOS (zero
    batches), not an error."""
    import pyarrow as pa

    req = urllib.request.Request(
        f"{srv.address}/v5/ArrowRawValues",
        data=json.dumps({"uuid": "big1", "start": 0, "end": 10**9}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "application/vnd.apache.arrow.stream"
        tbl = pa.ipc.open_stream(r.read()).read_all()
    assert tbl.schema.names == ["time", "value"]
    assert tbl.num_rows == 12_000
    assert sorted(tbl.column("time").to_pylist()) == list(range(12_000))

    stat = urllib.request.Request(
        f"{srv.address}/v5/ArrowAlignedWindows",
        data=json.dumps({"uuid": "big1", "start": 0, "end": 1 << 14,
                         "pointWidth": 12}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(stat, timeout=300) as r:
        stbl = pa.ipc.open_stream(r.read()).read_all()
    assert stbl.schema.names == ["time", "min", "mean", "max", "count"]
    assert sum(stbl.column("count").to_pylist()) == 12_000

    empty = urllib.request.Request(
        f"{srv.address}/v5/ArrowRawValues",
        data=json.dumps({"uuid": "big1", "start": 10**17,
                         "end": 10**17 + 1}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(empty, timeout=300) as r:
        etbl = pa.ipc.open_stream(r.read()).read_all()
    assert etbl.num_rows == 0 and etbl.schema.names == ["time", "value"]


def test_wire_generate_csv_proto_shape(srv):
    """GenerateCSVParams exactly as btrdb.proto:269-282: queryType +
    startTime/endTime + streams[{uuid,label,version}]. Raw merge follows
    serve.go's earliest-time cursor (csv.go headers, %f cells, empty cell
    when a stream has no point at that time)."""
    call(srv, "Create", {"uuid": "pc1", "collection": "wire/csvp"})
    call(srv, "Create", {"uuid": "pc2", "collection": "wire/csvp"})
    call(srv, "Insert", {"uuid": "pc1", "sync": True, "values": [
        {"time": t, "value": float(t)} for t in (10, 20, 30)
    ]})
    call(srv, "Insert", {"uuid": "pc2", "sync": True, "values": [
        {"time": t, "value": 2.5} for t in (20, 40)
    ]})

    msgs = call(srv, "GenerateCSV", {
        "queryType": "RAW_QUERY", "startTime": 0, "endTime": 1000,
        "streams": [{"uuid": "pc1", "label": "left"},
                    {"uuid": "pc2", "label": "right"}],
    })
    assert msgs[0]["isHeader"]
    assert msgs[0]["row"] == [
        "Timestamp (ns)", "Human-Readable Time (UTC)", "left", "right",
    ]
    rows = [m["row"] for m in msgs[1:]]
    assert [r[0] for r in rows] == ["10", "20", "30", "40"]
    assert rows[0][1] == "1970-01-01T00:00:00Z"  # RFC3339 of ns epoch
    assert [r[2] for r in rows] == ["10.000000", "20.000000", "30.000000", ""]
    assert [r[3] for r in rows] == ["", "2.500000", "", "2.500000"]

    # ALIGNED_WINDOWS_QUERY: pointWidth rides in `depth` (serve.go:908),
    # four columns per stream, includeVersions suffixes the label.
    stat = call(srv, "GenerateCSV", {
        "queryType": 0, "startTime": 0, "endTime": 1024, "depth": 5,
        "includeVersions": True,
        "streams": [{"uuid": "pc1", "label": "s"}],
    })
    hdr = stat[0]["row"]
    assert hdr[2].startswith("s, ver. ") and hdr[2].endswith(" (Min)")
    assert [h.rsplit("(", 1)[1] for h in hdr[2:]] == [
        "Min)", "Mean)", "Max)", "Count)",
    ]
    srows = [m["row"] for m in stat[1:]]
    assert [r[0] for r in srows] == ["0"]  # 10, 20, 30 all in bucket 0-31
    assert srows[0][2:] == ["10.000000", "20.000000", "30.000000", "3"]


def test_wire_stat_reads_served_from_rollup_ladder(spark, tmp_path):
    """Composed system over the wire: a ladder-backed facade answers
    AlignedWindows from the materialized rollup tier, and the wire result
    equals the raw aggregation computed client-side from RawValues."""
    import collections

    db = BTrDB(spark, str(tmp_path / "ldb"), rollup_levels=[4])
    srv = BTrDBHttpServer(db).start()
    try:
        call(srv, "Create", {"uuid": "lw", "collection": "wire/l"})
        call(srv, "Insert", {"uuid": "lw", "sync": True, "values": [
            {"time": t, "value": float(t % 7)} for t in range(0, 256, 3)
        ]})
        pages = call(srv, "AlignedWindows", {
            "uuid": "lw", "start": 0, "end": 256, "pointWidth": 5,
        })
        stat = {v["time"]: v for p in pages for v in p["values"]}
        raw = call(srv, "RawValues", {"uuid": "lw", "start": 0, "end": 256})
        buckets = collections.defaultdict(list)
        for p in raw:
            for v in p["values"]:
                buckets[(v["time"] >> 5) << 5].append(v["value"])
        assert set(stat) == set(buckets)
        for b, vals in buckets.items():
            s = stat[b]
            assert (s["min"], s["max"], s["count"]) == (
                min(vals), max(vals), len(vals)
            )
            assert abs(s["mean"] - sum(vals) / len(vals)) < 1e-9
    finally:
        srv.stop()


def test_wire_arrow_middrain_failure_is_loud(srv, monkeypatch):
    """A mid-drain failure on the Arrow lane must NOT fake a clean end of
    stream: every chunk is a complete IPC message, so a truncated body
    that still gets the chunked terminator parses as a valid short table.
    The server withholds the terminator and closes the connection — the
    client's HTTP layer raises instead of returning partial data."""
    import http.client

    from btrdb_server_spark import server as server_mod

    real = server_mod._arrow_ipc_chunks

    def sabotaged(df):
        it = real(df)
        yield next(it)  # schema + maybe a batch arrives fine

        raise RuntimeError("executor lost mid-drain")

    monkeypatch.setattr(server_mod, "_arrow_ipc_chunks", sabotaged)
    host = srv.address.split("//", 1)[1]
    conn = http.client.HTTPConnection(host, timeout=300)
    try:
        conn.request(
            "POST", "/v5/ArrowRawValues",
            body=json.dumps({"uuid": "big1", "start": 0, "end": 10**9}),
        )
        resp = conn.getresponse()
        assert resp.status == 200  # headers were already committed
        with pytest.raises((http.client.IncompleteRead, ConnectionError)):
            resp.read()
    finally:
        conn.close()
