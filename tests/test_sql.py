"""SQL surface (sql.py): registered views + rewrite-aware BTrDB.sql.

The reference's query surface is gRPC (grpcinterface/serve.go); ours adds
SQL text over temp views with the same transparent stored-aggregate serving
(qtree/qtree.go:925-947) and the same exactness guards as the facade's
DataFrame paths."""

from __future__ import annotations

from btrdb_server_spark.api import BTrDB

CANON = """
SELECT shiftleft(shiftright(time, {pw}), {pw}) AS t,
       min(value) AS vmin, avg(value) AS vmean,
       max(value) AS vmax, count(value) AS cnt
FROM btrdb_points
WHERE uuid = '{u}' AND time >= {s} AND time < {e}
GROUP BY shiftleft(shiftright(time, {pw}), {pw})
ORDER BY t
"""


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_sql_raw_range_scan_matches_facade(spark, tmp_path):
    db = BTrDB(spark, str(tmp_path / "db"))
    db.insert("s1", [(i * 3, float(i % 7)) for i in range(500)])
    db.insert("s2", [(i * 5, 1.0) for i in range(100)])
    db.register_sql()
    got = _rows(
        db.sql(
            "SELECT time, value FROM btrdb_points "
            "WHERE uuid = 's1' AND time >= 30 AND time < 900 ORDER BY time"
        )
    )
    want = [(r.time, r.value) for r in db.raw_values("s1", 30, 900).collect()]
    assert got == want and len(got) > 0


def test_sql_canonical_served_from_ladder(spark, tmp_path):
    """Canonical aligned-stat SQL is answered from the rollup level (plan
    reads vsum, not raw value rows) with identical results."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("s1", [(i, float(i % 10)) for i in range(4096)])
    db.register_sql()
    text = CANON.format(pw=6, u="s1", s=0, e=4096)
    routed = db.sql(text)
    plan = _executed(routed)
    assert "vsum" in plan and "value" not in plan
    plain = spark.sql(text)
    assert "vsum" not in _executed(plain)
    r, p = _rows(routed), _rows(plain)
    assert len(r) == 64 and [x[0] for x in r] == [x[0] for x in p]
    for a, b in zip(r, p):
        assert a[1] == b[1] and a[3] == b[3] and a[4] == b[4]
        assert abs(a[2] - b[2]) < 1e-9


def test_sql_windows_shape_served_from_ladder(spark, tmp_path):
    """Tumbling-window SQL — GROUP BY (time - s) DIV w — is served from the
    ladder when the width and origin are level-aligned, with identical
    results; an unaligned width passes through to the raw view."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("s1", [(i, float(i % 10)) for i in range(4096)])
    db.register_sql()
    text = (
        "SELECT (time - 0) DIV 64 AS widx, min(value) AS vmin,"
        " avg(value) AS vmean, max(value) AS vmax, count(value) AS cnt"
        " FROM btrdb_points WHERE uuid = 's1' AND time >= 0 AND time < 4096"
        " GROUP BY (time - 0) DIV 64 ORDER BY widx"
    )
    routed = db.sql(text)
    plan = _executed(routed)
    assert "vsum" in plan and "value" not in plan
    plain = spark.sql(text)
    r, p = _rows(routed), _rows(plain)
    assert len(r) == 64 and [x[0] for x in r] == [x[0] for x in p]
    for a, b in zip(r, p):
        assert a[1] == b[1] and a[3] == b[3] and a[4] == b[4]
        assert abs(a[2] - b[2]) < 1e-9
    # width 60 is not a multiple of 2**4 -> raw view answers
    bad = db.sql(text.replace("64", "60"))
    assert "vsum" not in _executed(bad)


def test_sql_between_bounds_served(spark, tmp_path):
    """`time BETWEEN s AND e-1` (inclusive upper bound, the natural SQL
    phrasing) rewrites exactly like `time >= s AND time < e`."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("s1", [(i, float(i % 10)) for i in range(4096)])
    db.register_sql()
    text = (
        "SELECT shiftleft(shiftright(time, 6), 6) AS t, count(value) AS cnt"
        " FROM btrdb_points WHERE uuid = 's1' AND time BETWEEN 0 AND 4095"
        " GROUP BY shiftleft(shiftright(time, 6), 6) ORDER BY t"
    )
    routed = db.sql(text)
    plan = _executed(routed)
    # Ladder scan (bucket/cnt columns; vsum pruned — no avg requested),
    # never the raw value rows.
    assert "bucket" in plan and "value" not in plan
    assert [r.cnt for r in routed.collect()] == [64] * 64


def test_sql_rewrite_skipped_for_buffered_stream(spark, tmp_path):
    """Uncommitted buffer -> the ladder would under-count; SQL answers from
    the raw view (which merges the buffer) exactly like BTrDB.aligned_windows
    routes to the J2 merge."""
    db = BTrDB(
        spark, str(tmp_path / "db"), rollup_levels=[4], buffer_commit_threshold=10
    )
    db.insert("s1", [(i, 1.0) for i in range(64)])  # >= threshold: commits
    db.insert("s1", [(100, 5.0)])  # buffered
    db.register_sql()
    routed = db.sql(CANON.format(pw=6, u="s1", s=0, e=128))
    assert "vsum" not in _executed(routed)  # stayed on the raw view
    rows = {r[0]: r for r in _rows(routed)}
    assert rows[64][4] == 1 and rows[64][3] == 5.0  # buffered point visible


def test_sql_rewrite_skipped_when_view_is_stale(spark, tmp_path):
    """A commit after register_sql advances the ladder past the pinned view;
    rewriting would change answers, so SQL stays on the (pinned) view until
    views are re-registered."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("s1", [(i, 1.0) for i in range(64)])
    db.register_sql()
    text = CANON.format(pw=6, u="s1", s=0, e=128)
    assert "vsum" in _executed(db.sql(text))
    db.insert("s1", [(70, 2.0)])  # new committed version; view still pinned
    assert "vsum" not in _executed(db.sql(text))
    db.register_sql()  # re-pin -> rewrite active again, new point served
    routed = db.sql(text)
    assert "vsum" in _executed(routed)
    rows = {r[0]: r for r in _rows(routed)}
    assert rows[64][4] == 1 and rows[64][3] == 2.0


def test_sql_rewrite_matches_any_conjunct_order(spark, tmp_path):
    """Users write WHERE clauses in any order; the matcher flattens the
    condition tree and matches conjuncts as a set."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("s1", [(i, float(i % 10)) for i in range(4096)])
    db.register_sql()
    base = (
        "SELECT shiftleft(shiftright(time, 6), 6) AS t, min(value) AS vmin, "
        "avg(value) AS vmean, max(value) AS vmax, count(value) AS cnt "
        "FROM btrdb_points WHERE {w} "
        "GROUP BY shiftleft(shiftright(time, 6), 6)"
    )
    wheres = [
        "time >= 0 AND time < 4096 AND uuid = 's1'",
        "time < 4096 AND uuid = 's1' AND time >= 0",
        "uuid IN ('s1') AND time >= 0 AND time < 4096",
    ]
    ref = None
    for w in wheres:
        routed = db.sql(base.format(w=w))
        assert "vsum" in _executed(routed), w
        rows = sorted(_rows(routed))
        if ref is None:
            ref = rows
        else:
            assert rows == ref
    # a stray extra conjunct must NOT match (semantics would change)
    strict = db.sql(base.format(w="uuid = 's1' AND time >= 0 AND time < 4096 AND value > 1"))
    assert "vsum" not in _executed(strict)


def test_sql_non_canonical_untouched(spark, tmp_path):
    """Anything not provably canonical (unaligned bounds, extra aggregate
    kinds) passes through Spark untouched."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("s1", [(i, float(i)) for i in range(256)])
    db.register_sql()
    unaligned = db.sql(CANON.format(pw=6, u="s1", s=1, e=129))
    assert "vsum" not in _executed(unaligned)
    other_agg = db.sql(
        "SELECT shiftleft(shiftright(time, 6), 6) AS t, sum(value) AS s "
        "FROM btrdb_points WHERE uuid = 's1' AND time >= 0 AND time < 256 "
        "GROUP BY shiftleft(shiftright(time, 6), 6)"
    )
    assert "vsum" not in _executed(other_agg)
    assert len(_rows(other_agg)) == 4


FLEET = """
SELECT uuid, shiftleft(shiftright(time, {pw}), {pw}) AS t,
       min(value) AS vmin, avg(value) AS vmean,
       max(value) AS vmax, count(value) AS cnt
FROM btrdb_points
WHERE {where}time >= {s} AND time < {e}
GROUP BY uuid, shiftleft(shiftright(time, {pw}), {pw})
ORDER BY uuid, t
"""


def test_sql_fleet_shape_served_from_ladder(spark, tmp_path):
    """The dashboard shape — per-stream stats for every stream, or a uuid
    IN-list — is recognized and served from the level scan (the
    serve_aligned_all path), results identical to the raw aggregation."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("a", [(i, float(i % 5)) for i in range(1024)])
    db.insert("b", [(i * 2, float(i % 3)) for i in range(512)])
    db.insert("c", [(i, 1.0) for i in range(256)])
    db.register_sql()
    for where in ["", "uuid IN ('a', 'b') AND "]:
        text = FLEET.format(pw=6, u="a", s=0, e=1024, where=where)
        routed, plain = db.sql(text), spark.sql(text)
        assert "vsum" in _executed(routed)
        assert "vsum" not in _executed(plain)
        r, p = _rows(routed), _rows(plain)
        assert len(r) == len(p) > 16
        for x, y in zip(r, p):
            assert x[0] == y[0] and x[1] == y[1]
            assert (x[2], x[4], x[5]) == (y[2], y[4], y[5])
            assert abs(x[3] - y[3]) < 1e-9


def test_sql_fleet_rewrite_skipped_when_any_stream_buffered(spark, tmp_path):
    """A fleet query over every stream cannot be served from the ladder
    while ANY stream holds an uncommitted buffer."""
    db = BTrDB(
        spark, str(tmp_path / "db"), rollup_levels=[4], buffer_commit_threshold=10
    )
    db.insert("a", [(i, 1.0) for i in range(64)])
    db.insert("b", [(5, 9.0)])  # buffered
    db.register_sql()
    routed = db.sql(FLEET.format(pw=6, u="a", s=0, e=64, where=""))
    assert "vsum" not in _executed(routed)
    rows = {(r[0], r[1]): r for r in _rows(routed)}
    assert rows[("b", 0)][4] == 9.0  # buffered point served from the view
    # ...but an IN-list that avoids the buffered stream still rewrites
    routed2 = db.sql(FLEET.format(pw=6, u="a", s=0, e=64, where="uuid IN ('a') AND "))
    assert "vsum" in _executed(routed2)


def test_sql_streams_and_rollup_views(spark, tmp_path):
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.create("u1", "plant/a", tags={"unit": "V"})
    db.create("u2", "plant/b", tags={"unit": "A"})
    db.insert("u1", [(i, 1.0) for i in range(32)])
    names = db.register_sql()
    assert "btrdb_streams" in names and "btrdb_rollup_pw4" in names
    cols = _rows(
        db.sql(
            "SELECT collection FROM btrdb_streams "
            "WHERE tags['unit'] = 'V' ORDER BY collection"
        )
    )
    assert cols == [("plant/a",)]
    agg = _rows(
        db.sql(
            "SELECT sum(cnt) AS n FROM btrdb_rollup_pw4 WHERE uuid = 'u1'"
        )
    )
    assert agg == [(32,)]


def test_sql_count_star_matches(spark, tmp_path):
    """count(*) (analyzed as count(1)) rewrites like count(value): the
    points plane's value column is validated non-null, so they are equal;
    min/avg/max of anything but value must not match."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("s1", [(i, float(i % 10)) for i in range(4096)])
    db.register_sql()
    routed = db.sql(
        "SELECT shiftleft(shiftright(time, 6), 6) AS t, count(*) AS cnt, "
        "avg(value) AS vmean FROM btrdb_points "
        "WHERE uuid = 's1' AND time >= 0 AND time < 4096 "
        "GROUP BY shiftleft(shiftright(time, 6), 6) ORDER BY t"
    )
    assert "vsum" in _executed(routed)
    assert all(r[1] == 64 for r in _rows(routed))
    bogus = db.sql(
        "SELECT shiftleft(shiftright(time, 6), 6) AS t, min(time) AS m "
        "FROM btrdb_points WHERE uuid = 's1' AND time >= 0 AND time < 4096 "
        "GROUP BY shiftleft(shiftright(time, 6), 6)"
    )
    assert "vsum" not in _executed(bogus)


def test_sql_hook_serves_plain_spark_sql_from_ladder(spark, tmp_path):
    """db.hook_sql() wraps the session's PLAIN sql entry point (the
    injectOptimizerRule analog): canonical stat text over btrdb_points is
    served from the ladder, non-canonical text passes through untouched,
    results equal the raw aggregation, and unhook restores the session."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("h1", [(i, float(i % 10)) for i in range(4096)])
    db.hook_sql()
    try:
        routed = spark.sql(CANON.format(pw=6, u="h1", s=0, e=4096))
        assert "vsum" in _executed(routed), "hooked spark.sql missed ladder"
        assert any("rollups" in f for f in routed.inputFiles())
        raw = spark._btrdb_sql_orig(CANON.format(pw=6, u="h1", s=0, e=4096))
        assert _rows(routed) == _rows(raw)
        other = spark.sql("SELECT 1 AS one")
        assert _rows(other) == [(1,)]
    finally:
        db.unhook_sql()
    unrouted = spark.sql(CANON.format(pw=6, u="h1", s=0, e=4096))
    assert "vsum" not in _executed(unrouted), "unhook did not restore sql"
    assert _rows(unrouted) == _rows(routed)


def test_sql_hook_is_idempotent_and_version_guarded(spark, tmp_path):
    """Re-installing rebinds (no wrapper-on-wrapper chains); a write after
    installation un-pins the views, so the hook falls back to raw until
    views are refreshed — the same exactness guard as db.sql()."""
    db = BTrDB(spark, str(tmp_path / "db"), rollup_levels=[4])
    db.insert("h2", [(i, 1.0) for i in range(256)])
    db.hook_sql()
    try:
        db.hook_sql()  # idempotent: orig stays the REAL method
        assert spark._btrdb_sql_orig.__name__ == "sql"
        q = CANON.format(pw=6, u="h2", s=0, e=256)
        assert "vsum" in _executed(spark.sql(q))
        db.insert("h2", [(1000, 2.0)])  # version moves; view now stale
        assert "vsum" not in _executed(spark.sql(q))
        db.hook_sql()  # refresh views -> rewrite engages again
        assert "vsum" in _executed(spark.sql(q))
    finally:
        db.unhook_sql()
