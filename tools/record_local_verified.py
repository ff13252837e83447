"""Record scripts/check_driver.py results into tools/local_verified.json.

Usage: python tools/record_local_verified.py <check_driver_log> [sf_dir]

Parses the PASS/FAIL lines of a check_driver.py run (the driver-replica
bit-exact compare) and merges them into the local-verification evidence
file that tools/rotation_ledger.py reads.  Only PASS rows are recorded as
pass=true; FAIL/ERROR rows are recorded pass=false so the ledger flags
them loudly instead of forgetting them.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "local_verified.json")


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod
    from tools import impl_drift

    qs = entry_mod.queries()
    entry_src = open(os.path.join(REPO, "__spark_entry__.py")).read()

    log_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    existing = json.load(open(OUT)) if os.path.exists(OUT) else {}
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d")
    n = 0
    for line in open(log_path):
        m = re.match(r"(PASS|FAIL|ERROR)\s+(\w+)", line)
        if not m:
            continue
        verdict, name = m.group(1), m.group(2)
        existing[name] = {
            "pass": verdict == "PASS",
            "sf_dir": sf_dir,
            "checked": stamp,
            "via": "scripts/check_driver.py (bit-exact driver-replica)",
        }
        # Bind the verification to the implementation it proved: the
        # fingerprint (q_ fn source sha + engine-module blob hashes) lets
        # impl_drift clear banked-then-changed staleness only while the
        # implementation is still the one this check ran against.
        if name in qs:
            existing[name]["impl"] = impl_drift.fingerprint(
                qs[name].__name__, entry_src
            )
        n += 1
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    print(f"recorded {n} results -> {OUT} (total {len(existing)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
