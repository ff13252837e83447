"""Detect banked-then-changed driver entries (implementation drift).

A green CORRECTNESS row proves the entry was correct AT BANKING TIME; if
the implementation changed afterwards the row is silently stale evidence
(round-8 example: `containment_pairs` banked r07, then r8 changed its
df_cap default — the green driver row predated current behavior).

This tool makes staleness executable. For each banked entry it compares,
between the commit that recorded the banking round's CORRECTNESS file and
the current working tree:

- the entry's `q_<name>` function source in ``__spark_entry__.py``
  (regex-extracted from the old blob, so window rotations — which only
  reorder the queries() dict — do NOT count as drift), and
- every ``btrdb_server_spark`` module the function imports (module-file
  granularity: any change to the module marks its entries stale, a
  deliberate over-approximation — re-validating a still-correct entry is
  cheap; trusting a stale row is not).

Consumers:
- ``tools/rotation_ledger.py`` reports ``stale_banked`` (a PROBLEM unless
  the entry is ALSO in the current driver window or re-verified locally
  on/after the drift).
- ``scripts/rotate_window.py`` gives stale entries re-validation priority
  when filling leftover window slots.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
from functools import lru_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")

_IMPORT_RE = re.compile(r"from\s+(btrdb_server_spark[\w.]*)\s+import")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


@lru_cache(maxsize=None)
def banking_commit(rnd: int) -> str | None:
    """Commit that added CORRECTNESS_r{N}.json — the code state the driver
    checked that round (the driver commit adds result files only)."""
    out = _git(
        "log", "--diff-filter=A", "--format=%H", "--",
        f"CORRECTNESS_r{rnd:02d}.json",
    ).strip()
    return out.splitlines()[-1] if out else None


@lru_cache(maxsize=None)
def _file_at(commit: str, path: str) -> str | None:
    try:
        return _git("show", f"{commit}:{path}")
    except subprocess.CalledProcessError:
        return None  # file did not exist at that commit


def _extract_fn(src: str, fn_name: str) -> str | None:
    """Extract a top-level `def fn_name(...)` block (ends at the next
    top-level statement). Whitespace-normalized so reformatting-only
    rewrites don't count as drift."""
    # \Z alternative: a function that is the LAST top-level def in the
    # file has no following top-level statement — without it the lookahead
    # never matches and the function silently extracts as None on both the
    # old and new blob, making its body changes invisible to drift.
    m = re.search(
        rf"^def {re.escape(fn_name)}\(.*?(?=^\S|\Z)", src, re.S | re.M
    )
    if not m:
        return None
    return re.sub(r"\s+", " ", m.group(0)).strip()


def _module_path(mod: str) -> str | None:
    base = mod.replace(".", "/")
    for cand in (f"{base}.py", f"{base}/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


def entry_deps(fn_src: str) -> list[str]:
    """Repo-relative paths of btrdb_server_spark modules the entry's
    q_ function imports (module-file granularity)."""
    paths = []
    for mod in sorted(set(_IMPORT_RE.findall(fn_src))):
        p = _module_path(mod)
        if p and p not in paths:
            paths.append(p)
    return paths


@lru_cache(maxsize=None)
def _worktree_hash(path: str) -> str | None:
    full = os.path.join(REPO, path)
    if not os.path.exists(full):
        return None
    return _git("hash-object", full).strip()


@lru_cache(maxsize=None)
def _blob_hash(commit: str, path: str) -> str | None:
    try:
        return _git("rev-parse", f"{commit}:{path}").strip()
    except subprocess.CalledProcessError:
        return None


def latest_banked() -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a driver row, green?) — same reading of
    CORRECTNESS_r*.json as rotation_ledger."""
    import json

    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, green)
    return latest


def fingerprint(fn_name: str, entry_src: str) -> dict[str, str]:
    """Current-worktree implementation fingerprint for one entry: the
    sha1 of its whitespace-normalized q_ function source plus the git
    blob hash of every engine module that source imports. Stamped into
    tools/local_verified.json at verification time; a banked-then-changed
    entry is considered re-proven only while its live fingerprint still
    matches the one recorded when the local bit-exact check ran."""
    import hashlib

    fn_src = _extract_fn(entry_src, fn_name) or ""
    fp = {"__fn__": hashlib.sha1(fn_src.encode()).hexdigest()}
    for path in entry_deps(fn_src):
        fp[path] = _worktree_hash(path) or "missing"
    return fp


def stale_banked(local: dict | None = None) -> dict[str, dict]:
    """Banked entries whose q_ source or any imported engine module
    changed since their banking commit: name -> {round, changed: [...]}.

    `local` (tools/local_verified.json contents) clears an entry: a
    passing local verification whose recorded `impl` fingerprint matches
    the current worktree means the changed implementation has been
    re-proven bit-exact since the drift."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    cur_entry_src = open(ENTRY).read()
    stale: dict[str, dict] = {}
    for name, (rnd, green) in sorted(latest_banked().items()):
        if not green or name not in qs:
            continue
        commit = banking_commit(rnd)
        if commit is None:
            continue
        fn_name = qs[name].__name__
        cur_fn = _extract_fn(cur_entry_src, fn_name)
        old_entry_src = _file_at(commit, "__spark_entry__.py") or ""
        old_fn = _extract_fn(old_entry_src, fn_name)
        changed = []
        if cur_fn != old_fn:
            changed.append(f"__spark_entry__.py:{fn_name}")
        for path in entry_deps(cur_fn or ""):
            if _worktree_hash(path) != _blob_hash(commit, path):
                changed.append(path)
        if not changed:
            continue
        rec = (local or {}).get(name) or {}
        if rec.get("pass") and rec.get("impl") == fingerprint(
            fn_name, cur_entry_src
        ):
            continue  # drifted, but re-proven locally at the current impl
        stale[name] = {"banked_round": rnd, "changed": changed}
    return stale


def main() -> int:
    import json

    lv_path = os.path.join(REPO, "tools", "local_verified.json")
    local = json.load(open(lv_path)) if os.path.exists(lv_path) else {}
    stale = stale_banked(local)
    print(json.dumps(stale, indent=1, sort_keys=True))
    print(f"stale_banked: {len(stale)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
