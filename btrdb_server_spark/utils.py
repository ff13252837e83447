"""Small plan utilities."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def _estimated_scan_partitions(df: DataFrame, files: list[str]) -> int:
    """Estimate how many scan partitions the file source will produce:
    sum over files of ceil(size / maxPartitionBytes). Driver-side metadata
    stats only — never forces physical planning (df.rdd would)."""
    spark = df.sparkSession
    sc = spark.sparkContext
    try:
        mpb = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:  # noqa: BLE001 — private API drift: assume the default
        mpb = 128 * 1024 * 1024
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        try:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
        except Exception:  # noqa: BLE001 — unstat-able file: count it as one
            size = 0
        total += max(1, math.ceil(size / mpb))
    return total


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input would scan with fewer partitions than the
    cluster has cores. Small single-file parquet inputs otherwise serialize
    expensive per-row work (explode/hash/pair-join) onto one task; a
    well-partitioned 100 TB input already exceeds the core count, so this
    is a no-op there and costs nothing in the scale path.

    The partition estimate comes from input-file metadata (count, then
    sizes vs maxPartitionBytes only when the count alone can't decide) —
    cheap driver-side stats, avoiding the full physical-planning pass that
    probing df.rdd.getNumPartitions() would force on every call. Non-file
    sources (in-memory frames) fall back to the rdd probe, which is cheap
    exactly there."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming sources
        files = []
    if files:
        if len(files) >= target:
            return df  # at least one partition per file
        if _estimated_scan_partitions(df, list(files)) < target:
            return df.repartition(target)
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def libm_ln(strict: bool = False):
    """The repo's float-parity device, defined ONCE: natural log as an
    Arrow-batched pandas_udf over SCALAR math.log (glibc libm — matching
    DuckDB's ln() bit-exactly; numpy's np.log is SIMD-vectorized and not
    guaranteed bit-identical to scalar libm). Nonpositive inputs map to
    NaN by default; call sites whose inputs are provably positive (an
    unsmoothed probability, a count ratio) should pass strict=True so a
    future zero/negative input FAILS the job loudly instead of silently
    propagating NaN through the aggregate. Use on post-aggregate,
    metadata-scale rows — never per-point hot paths. A factory (not a
    module-level udf) so importing utils never touches the udf
    machinery."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ln(s):
        import math

        if strict:
            bad = s[s <= 0]
            if len(bad):
                raise ValueError(
                    f"libm_ln(strict): nonpositive input {bad.iloc[0]!r}"
                )
            return s.map(math.log)
        return s.map(lambda v: math.log(v) if v > 0 else float("nan"))

    return _ln


def libm_log2(strict: bool = False):
    """Binary-log twin of libm_ln — matches DuckDB log2() bit-exactly."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _log2(s):
        import math

        if strict:
            bad = s[s <= 0]
            if len(bad):
                raise ValueError(
                    f"libm_log2(strict): nonpositive input {bad.iloc[0]!r}"
                )
            return s.map(math.log2)
        return s.map(lambda v: math.log2(v) if v > 0 else float("nan"))

    return _log2


def libm_exp():
    """exp twin of libm_ln — matches DuckDB exp() bit-exactly."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _exp(s):
        import math

        return s.map(math.exp)

    return _exp
