"""Local replica of the driver's correctness harness.

Builds its OWN SparkSession (deliberately NOT via btrdb_server_spark.session,
mirroring the driver harness), runs every __spark_entry__.queries() entry and
its oracle_sql() in DuckDB over the same parquet, and compares row count,
schema (column names sorted), and a value hash (columns sorted by name, rows
sorted). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else SF_DIR
    only = [a for a in argv if "/" not in a]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_correctness")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {}
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            rec["spark_rows"] = len(srows)
            if name in oracles:
                ocols = [d[0] for d in con.execute(oracles[name]).description]
                orows = con.execute(oracles[name]).fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = value_hash(scols, srows) == value_hash(ocols, orows)
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else:
                rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
                ok = True
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"
            ok = False
        results[name] = rec
        status = "ok " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status} {name}: {json.dumps(rec)[:300]}", flush=True)

    print(f"\n{len(results) - len(failures)}/{len(results)} green")
    if failures:
        print("failing:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
