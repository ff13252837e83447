"""Local replica of the driver's correctness harness.

Runs every `queries()` entry on a PLAIN SparkSession (deliberately built
without any of this repo's session config — exactly like the driver's own
harness) and compares against `oracle_sql()` run in DuckDB at the same sf.

Usage: python scripts/check_driver.py [--approx] [sf_dir] [query ...]

Floats are compared BIT-EXACT by default (struct.pack of the double — the
same class of comparison as the driver's value hash, so a sub-1e-9
association-order difference that would fail at the driver fails here too).
Pass --approx for the older 9-significant-digit tolerant compare.
"""

from __future__ import annotations

import math
import struct
import sys

sys.path.insert(0, "/root/repo")


def canon(rows, cols, strict=True):
    """Canonicalize a result set: columns sorted by name, rows sorted.
    strict=True (default): floats compared by bit pattern, like the
    driver's value hash. strict=False: rounded to 9 significant digits."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == 0:
                return 0.0
            if strict:
                return struct.pack("<d", v).hex()
            return round(v, 9 - 1 - int(math.floor(math.log10(abs(v)))) if abs(v) > 1e-300 else 9)
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        if isinstance(v, bytes):
            return v.hex()
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    args = [a for a in sys.argv[1:] if a != "--approx"]
    strict = "--approx" not in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    # Plain session: mimic the driver (no repo-side config allowed to matter).
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-driver")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    if not only:
        # t1 smoke: entry() must run on sf0.001 with a stable schema.
        smoke = entry.entry(spark)
        print(f"entry(): rows={smoke.count()} cols={smoke.columns}")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_err = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            n_err += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(rows)} (no oracle — rows-only check)")
            n_pass += 1
            continue
        try:
            # Type audit first: DuckDB types sum(BIGINT) as HUGEINT, which
            # the driver's Arrow/pandas fetch coerces to float64 — the value
            # hash then mismatches Spark's int64 even when every value is
            # identical (root cause of the r02-r04 windows_depth /
            # windows_rollup / repetition_stats reds). fetchall() returns
            # Python ints either way, so without this check the replica
            # can't see the mismatch. Fix in the oracle: CAST(... AS BIGINT).
            rel = con.sql(sql)
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if str(t) in ("HUGEINT", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: HUGEINT output column(s) {huge} — "
                      f"driver coerces to float64; CAST to BIGINT in oracle")
                n_fail += 1
                continue
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name} (oracle): {str(e).splitlines()[0][:160]}")
            n_err += 1
            continue
        scols, srows = canon(rows, cols, strict)
        ocols2, orows2 = canon(orows, ocols, strict)
        if scols != ocols2:
            print(f"FAIL {name}: schema {scols} != {ocols2}")
            n_fail += 1
        elif len(srows) != len(orows2):
            print(f"FAIL {name}: rows {len(srows)} != {len(orows2)}")
            n_fail += 1
        elif srows != orows2:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows2)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"     spark:  {srows[bad]}")
            print(f"     oracle: {orows2[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(srows)}")
            n_pass += 1
    print(f"\n== pass={n_pass} fail={n_fail} err={n_err}")
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
