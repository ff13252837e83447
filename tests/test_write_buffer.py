"""Write-buffer (PQM) semantics — mirrors pqm_test/main_test.go:
TestInsertWithFlush (:53), TestInsertWithNoFlush (:84),
TestQueryReturnsBothResults (:112), plus threshold auto-commit and
explicit-version isolation.
"""

from __future__ import annotations

import math

import pytest

from btrdb_server_spark.api import BTrDB
from btrdb_server_spark.store import BTrDBError


@pytest.fixture()
def db(spark, tmp_path):
    return BTrDB(spark, str(tmp_path / "b"), buffer_commit_threshold=10)


def times(df):
    return [r.time for r in df.collect()]


def test_insert_with_flush(db):
    """Insert below threshold -> buffered (major unchanged, minor grows);
    flush -> one committed generation; query sees the data."""
    assert db.insert("s", [(1, 1.0), (2, 2.0)]) == 0  # still version 0
    assert db.query_version("s") == (0, 2)
    v = db.flush("s")
    assert v == 1
    assert db.query_version("s") == (1, 0)
    assert times(db.raw_values("s", 0, 10)) == [1, 2]


def test_insert_with_no_flush_read_your_writes(db):
    """Uncommitted buffer is visible at the latest version (ST5): raw,
    nearest, and stat reads all merge it."""
    db.insert("s", [(5, 50.0)])
    assert db.query_version("s") == (0, 1)
    assert times(db.raw_values("s", 0, 10)) == [5]
    near = db.nearest("s", 10, backward=True).collect()
    assert near[0].time == 5
    aw = db.aligned_windows("s", 0, 16, 4).collect()
    assert len(aw) == 1 and aw[0]["count"] == 1 and aw[0]["min"] == 50.0


def test_query_returns_both_results(db):
    """Committed + buffered points merge in time order (pqm_test :112)."""
    db.insert("s", [(1, 1.0)])
    db.flush("s")
    db.insert("s", [(3, 3.0)])  # buffered only
    assert db.query_version("s") == (1, 1)
    assert times(db.raw_values("s", 0, 10)) == [1, 3]
    # explicit version: committed data only
    assert times(db.raw_values("s", 0, 10, version=1)) == [1]


def test_threshold_auto_commit(db):
    """Crossing the threshold commits buffer + batch as ONE generation
    (pqm.go:608-630)."""
    db.insert("s", [(i, float(i)) for i in range(6)])       # buffered (6 < 10)
    v = db.insert("s", [(i, float(i)) for i in range(6, 12)])  # 12 >= 10 -> commit
    assert v == 1
    assert db.query_version("s") == (1, 0)
    assert times(db.raw_values("s", 0, 100)) == list(range(12))


def test_buffered_validation_and_delete_flush(db):
    """Buffered inserts reject NaN/Inf and out-of-range eagerly; delete
    commits the buffer first so the tombstone covers buffered points."""
    with pytest.raises(BTrDBError):
        db.insert("s", [(1, math.nan)])
    with pytest.raises(BTrDBError):
        db.insert("s", [((48 << 56) - 1, 1.0)])
    db.insert("s", [(1, 1.0), (7, 7.0)])
    db.delete("s", 5, 10)
    assert times(db.raw_values("s", 0, 100)) == [1]
    assert db.query_version("s")[1] == 0


def test_generate_csv_merges_buffers(db):
    """Latest-generation CSV output includes uncommitted buffered points
    (the PQM merge applies to ALL latest reads, GenerateCSV included)."""
    db.insert("a", [(1, 1.0), (3, 3.0)])
    db.flush("a")
    db.insert("a", [(5, 5.0)])  # buffered, uncommitted
    db.insert("b", [(3, 30.0)])  # buffered, uncommitted
    out = db.generate_csv(["a", "b"], 0, 10)
    rows = {r.time: (r["a"], r["b"]) for r in out.collect()}
    assert set(rows) == {1, 3, 5}
    assert rows[5] == (5.0, None)
    assert rows[3] == (3.0, 30.0)
    # explicit-version read stays committed-only
    committed = db.generate_csv(["a", "b"], 0, 10, version=1)
    assert {r.time for r in committed.collect()} == {1, 3}


def test_age_based_flush(db):
    """A buffer older than max_buffer_age_seconds commits on the next
    insert (inline check) or via flush_aged() (the background-scan analog,
    pqm.go:39-41, 213-241)."""
    import time

    db.max_buffer_age_seconds = 0.05
    db.insert("s", [(1, 1.0)])
    assert db.query_version("s") == (0, 1)
    time.sleep(0.1)
    db.insert("s", [(2, 2.0)])          # aged buffer commits first
    assert db.query_version("s") == (1, 1)  # old committed, new buffered
    time.sleep(0.1)
    flushed = db.flush_aged()
    assert flushed == {"s": 2}
    assert db.query_version("s") == (2, 0)
    assert times(db.raw_values("s", 0, 10)) == [1, 2]
