"""Saturation throughput measurement for BASELINE.md comparison.

The per-query wall times in bench.py are fixed-overhead-dominated at sf0.1
(~100k points); this script measures the engine's actual data-plane
throughput at saturation with 50M generated points on the points schema —
the honest comparison against the FAST'16 paper numbers in BASELINE.md
(~53M pts/s insert, ~119M pts/s raw query, 4-node cluster):

    python throughput_bench.py     # prints one JSON line

Measured paths: the insert core (sorted parquet append), raw scan + the
fixed Min/Mean/Max/Count aggregate set, and the full per-stream
aligned-windows aggregation.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

N = int(os.environ.get("SPARK_GRAFT_TP_N", 50_000_000))  # smoke: set ~2M
T0 = 1_704_067_200_000_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from btrdb_server_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("throughput", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pts = spark.range(N).select(
        (F.col("id") % 64).cast("string").alias("uuid"),
        (F.lit(T0) + F.col("id") * 1000).alias("time"),
        F.sin(F.col("id").cast("double")).alias("value"),
    )

    out: dict[str, float] = {}
    d = tempfile.mkdtemp(prefix="btrdb_tp_")
    try:
        # Materialize the synthetic input first so the insert numbers time
        # the write path, not the row generation (sin() etc.) — the
        # reference's insert benchmark is handed its points too.
        pts = pts.persist()
        pts.count()

        from btrdb_server_spark.store import _WRITE_TUNING

        # Write paths are best-of-2 like the read paths: a single shot on a
        # shared box measures that moment's co-tenant I/O phase (observed
        # 2.5 vs 16 Mpts/s on the SAME plan minutes apart), not the plan.
        def write_best_of(fn, reps: int = 2) -> float:
            b = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn()
                b = min(b, time.perf_counter() - t)
            return b

        p = os.path.join(d, "pts")
        b = write_best_of(
            lambda: pts.sortWithinPartitions("time")
            .write.mode("overwrite")
            .options(**_WRITE_TUNING)
            .parquet(p)
        )
        out["insert_mpts_per_sec"] = round(N / b / 1e6, 1)

        # The full engine path: PointStore.insert_many = single write job
        # with validation + touched-uuid collection piggybacked (Observation),
        # partitioned by uuid_bucket, manifest commit.
        from btrdb_server_spark.store import PointStore

        store = PointStore(spark, os.path.join(d, "store"))
        b = write_best_of(lambda: store.insert_many(pts))
        out["store_insert_mpts_per_sec"] = round(N / b / 1e6, 1)

        # Compression vs the raw 16 B/point (time+value) wire size — the
        # BASELINE.md row is the paper's ~2.9x on real telemetry. Two
        # figures: the full-entropy sin() values above are the worst case
        # (every mantissa distinct — nothing for any codec); quantized
        # 2-decimal values are the sensor-like case the paper measures.
        def dir_bytes(p):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
                if f.endswith(".parquet")
            )

        out["compression_fullentropy_vs_16B"] = round(
            16 * N / dir_bytes(os.path.join(d, "store", "points")), 2
        )
        pq = os.path.join(d, "q")
        (
            pts.withColumn("value", F.round("value", 2))
            .sortWithinPartitions("uuid", "time")
            .write.mode("overwrite")
            .options(**_WRITE_TUNING)
            .parquet(pq)
        )
        out["compression_quantized_vs_16B"] = round(16 * N / dir_bytes(pq), 2)

        stored = spark.read.parquet(p)
        stored.count()  # warm footers

        def best_of(fn, reps: int = 3) -> float:
            b = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn()
                b = min(b, time.perf_counter() - t)
            return b

        b = best_of(
            lambda: stored.agg(
                F.count("value"), F.min("value"), F.max("value"), F.avg("value")
            ).collect()
        )
        out["raw_stat_scan_mpts_per_sec"] = round(N / b / 1e6, 1)

        b = best_of(
            lambda: stored.groupBy(
                "uuid", F.shiftleft(F.shiftright("time", 40), 40).alias("b")
            )
            .agg(F.min("value"), F.avg("value"), F.max("value"), F.count("value"))
            .count()
        )
        out["aligned_windows_mpts_per_sec"] = round(N / b / 1e6, 1)

        # Compaction cost ∝ fresh-tail size, not base size (store.py
        # compact(), incremental since r9): the incremental path rewrites
        # ONLY the uuid_bucket partitions the tail touches and hard-links
        # the other 63, so folding a 1% single-uuid tail costs the same
        # whether the base is 50M or 100M points, while the full rewrite
        # doubles. num_buckets=64 is the scale-realistic sharding (at
        # 100 TB you run thousands, making the touched fraction smaller
        # still); at toy scale the incremental time is floored by fixed
        # job/manifest costs, so the honest contract is FLATNESS in base
        # size, not a single ratio.
        cstore = PointStore(spark, os.path.join(d, "cstore"), num_buckets=64)
        tail = spark.range(N // 100).select(
            F.lit("tail-uuid").alias("uuid"),
            (F.lit(T0) + F.col("id") * 1000).alias("time"),
            F.sin(F.col("id").cast("double")).alias("value"),
        ).persist()
        tail.count()
        for label in ("50m", "100m"):
            cstore.insert_many(pts)  # +50M each pass
            t = time.perf_counter()
            cstore.compact(full=True)
            out[f"compact_full_{label}_sec"] = round(time.perf_counter() - t, 2)
            cstore.insert_many(tail)
            t = time.perf_counter()
            cstore.compact()
            out[f"compact_tail_at_{label}_sec"] = round(
                time.perf_counter() - t, 2
            )
        out["compact_incremental_speedup_100m"] = round(
            out["compact_full_100m_sec"] / out["compact_tail_at_100m_sec"], 1
        )

        # Wire data plane: RawValues over JSON/HTTP, paged ndjson from
        # toLocalIterator (server.py _stream_df) — JSON encoding overlaps
        # the scan, the driver never materializes the result.
        import urllib.request

        from btrdb_server_spark.api import BTrDB
        from btrdb_server_spark.server import BTrDBHttpServer

        db = BTrDB(spark, os.path.join(d, "wire"))
        wn = 2_000_000
        db.store.insert_many(
            spark.range(wn).select(
                F.lit("w").alias("uuid"),
                (F.lit(T0) + F.col("id")).alias("time"),
                F.col("id").cast("double").alias("value"),
            )
        )
        srv = BTrDBHttpServer(db).start()
        try:
            req = urllib.request.Request(
                f"{srv.address}/v5/RawValues",
                data=json.dumps(
                    {"uuid": "w", "start": 0, "end": T0 + wn + 1}
                ).encode(),
                method="POST",
            )
            t = time.perf_counter()
            got = 0
            with urllib.request.urlopen(req, timeout=600) as r:
                for line in r:
                    got += line.count(b'"time"')
            wire_s = time.perf_counter() - t
            assert got == wn, f"wire returned {got} of {wn} points"
            out["wire_rawvalues_mpts_per_sec"] = round(wn / wire_s / 1e6, 2)

            # Arrow IPC bulk lane: binary columnar, executor-serialized
            import pyarrow as pa

            areq = urllib.request.Request(
                f"{srv.address}/v5/ArrowRawValues",
                data=json.dumps(
                    {"uuid": "w", "start": 0, "end": T0 + wn + 1}
                ).encode(),
                method="POST",
            )
            t = time.perf_counter()
            with urllib.request.urlopen(areq, timeout=600) as r:
                tbl = pa.ipc.open_stream(r.read()).read_all()
            arrow_s = time.perf_counter() - t
            assert tbl.num_rows == wn
            out["wire_arrow_mpts_per_sec"] = round(wn / arrow_s / 1e6, 2)
        finally:
            srv.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print(json.dumps({"metric": "saturation_throughput", "n_points": N, **out}))


if __name__ == "__main__":
    main()
