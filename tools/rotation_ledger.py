"""Rotation ledger: one machine-checkable status per `queries()` entry.

The external driver checks only the FIRST 50 entries of `queries()` per
round, so correctness evidence accumulates across rounds ("banked" rows).
Round 6 showed the failure mode: window bookkeeping drifted silently and
23 entries the rotation plan believed were checked never were.  This tool
makes the coverage invariant executable (tests/test_window.py runs it):

    python tools/rotation_ledger.py          # writes ledger, exit 1 on gaps
    python tools/rotation_ledger.py --json   # print ledger to stdout

Status for each entry, in precedence order:
- ``banked rN``  — green row in CORRECTNESS_r{N}.json at its LATEST driver
  check (a later red overrides an earlier green).
- ``window``     — in the current round's 50-slot window (DRIVER_WINDOW), i.e.
  being checked by the driver this round; must ALSO be locally verified.
- ``local``      — never driver-checked, but verified bit-exact against
  its DuckDB oracle by scripts/check_driver.py (the driver-replica
  compare); evidence recorded in tools/local_verified.json.

The invariant: every entry has an oracle AND a status; an entry with no
banked row, not in the window, and absent from local_verified.json is a
hard failure.  So is a banked-red row anywhere.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_VERIFIED = os.path.join(REPO, "tools", "local_verified.json")
LEDGER_OUT = os.path.join(REPO, "tools", "rotation_ledger.json")


def build_ledger() -> dict:
    import __spark_entry__ as entry_mod

    qs = list(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    window = list(entry_mod.DRIVER_WINDOW)

    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only checks pass
                and not row.get("err")
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, green)

    local = {}
    if os.path.exists(LOCAL_VERIFIED):
        local = json.load(open(LOCAL_VERIFIED))

    ledger, problems = {}, []
    for name in qs:
        rec: dict = {"oracle": name in oracles, "position": qs.index(name) + 1}
        if name in latest:
            rnd, green = latest[name]
            rec["status"] = f"banked r{rnd:02d}"
            rec["green"] = green
            if not green:
                problems.append(f"{name}: RED at latest driver check (r{rnd})")
        elif name in window:
            rec["status"] = "window"
            rec["green"] = bool(local.get(name, {}).get("pass"))
            if not rec["green"]:
                problems.append(f"{name}: in window but not locally verified")
        elif name in local:
            rec["status"] = "local"
            rec["green"] = bool(local[name].get("pass"))
            if not rec["green"]:
                problems.append(f"{name}: local verification FAILED")
        else:
            rec["status"] = "unchecked"
            rec["green"] = False
            problems.append(f"{name}: no banked row, not in window, no local record")
        if not rec["oracle"]:
            problems.append(f"{name}: no oracle_sql() entry")
        ledger[name] = rec

    # Banked-then-changed detection (round-8 verdict): a green driver row
    # is stale evidence once the entry's implementation changes. Stale
    # entries must be re-proven — either a local bit-exact re-verification
    # at the CURRENT implementation (fingerprint match clears it inside
    # stale_banked) or a slot in the current driver window.
    from tools import impl_drift

    stale = impl_drift.stale_banked(local)
    for name, info in stale.items():
        if name in ledger:
            ledger[name]["stale"] = info["changed"]
        if name in window:
            continue  # being re-validated by the driver this round
        problems.append(
            f"{name}: banked r{info['banked_round']:02d} but implementation "
            f"changed since ({', '.join(info['changed'])}) and no "
            "fingerprint-matching local re-verification"
        )

    counts: dict[str, int] = {}
    for rec in ledger.values():
        key = rec["status"].split()[0]
        counts[key] = counts.get(key, 0) + 1
    return {
        "entries": ledger,
        "counts": counts,
        "window_size": len(window),
        "stale_banked": sorted(n for n in stale if n not in window),
        "problems": problems,
    }


def main() -> int:
    out = build_ledger()
    with open(LEDGER_OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if "--json" in sys.argv:
        print(json.dumps(out, indent=1, sort_keys=True))
    else:
        print(f"entries: {len(out['entries'])}  counts: {out['counts']}")
        for p in out["problems"]:
            print("PROBLEM:", p)
        print("OK" if not out["problems"] else "FAIL")
    return 0 if not out["problems"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
