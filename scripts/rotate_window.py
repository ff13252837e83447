"""Regenerate the driver rotation window for the next round.

The external driver checks the FIRST 50 entries of `queries()` each
round. This tool mechanizes the standing policy (see the queries()
docstring) so the window can never again be hand-maintained into a
silent overflow (the round-6 failure):

    python scripts/rotate_window.py            # dry run: print the plan
    python scripts/rotate_window.py --apply    # rewrite __spark_entry__.py

Policy:
1. 4 slots re-validate the OLDEST-banked core section-2 anchors
   (round-robin over CORE_ANCHORS by their latest banked round).
2. The remaining 46 slots take never-driver-checked entries, oldest
   registration first — except PRIORITY entries, which jump the queue
   (used to bank semantically-novel ops like the streaming batch-parity
   twins ahead of warehouse cards, per the round-7 verdict).
3. If fewer than 46 remain, leftover slots re-validate the next
   oldest-banked entries of the whole registry.

After --apply, run: pytest tests/test_window.py, scripts/check_driver.py
on the new window, and tools/rotation_ledger.py — the rewrite is only
done when all three are green.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENTRY = os.path.join(REPO, "__spark_entry__.py")
WINDOW_SIZE = 50
N_ANCHORS = 4

# Core section-2 anchor pool (SURVEY.md 2.13): one driver entry per core
# behavior family, re-validated oldest-first a few per round.
CORE_ANCHORS = [
    "raw_values",
    "aligned_windows",
    "align_windowed",
    "windows_holes",
    "windows_depth",
    "aligned_windows_rollup",
    "windows_rollup",
    "rollup_rewrite",
    "csv_export",
    "multistream_align",
    "nearest_before",
    "nearest_after",
    "nearest_asof",
    "changed_ranges",
    "buffer_read_your_writes",
    "buffer_stat_merge",
    "insert_cap",
    "streaming_ingest",
    "store_version_travel",
    "store_compact",
    "delete_range",
    "registry_obliterate",
    "list_collections",
    "lookup_streams",
    "metadata_usage",
]

# Never-checked entries pulled to the FRONT of the fill regardless of
# registration order (r7 verdict task 6: streaming twins carry
# bit-equal-to-batch claims and deserve driver proof first).
PRIORITY = [
    "streaming_quantile",
    "streaming_coverage",
    "streaming_hll",
]


def banked() -> dict[str, tuple[int, bool]]:
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


def dict_entries(src: str) -> tuple[re.Match, list[tuple[str, str]]]:
    m = re.search(
        r'(def queries\(\).*?""".*?"""\n)(    return \{\n)(.*?)(\n    \}\n)', src, re.S
    )
    assert m, "queries() dict not found"
    entries = []
    for line in m.group(3).split("\n"):
        lm = re.match(r'\s*"([^"]+)":\s*(.+?),\s*$', line)
        if lm:
            entries.append((lm.group(1), lm.group(2)))
    return m, entries


def plan() -> tuple[list[str], list[str], list[str]]:
    src = open(ENTRY).read()
    _, entries = dict_entries(src)
    names = [k for k, _ in entries]
    assert len(names) == len(set(names)), "duplicate keys in queries()"
    lat = banked()
    red = [n for n, (_, g) in lat.items() if not g and n in names]
    assert not red, f"banked-RED entries need fixing, not rotation: {red}"
    anchors = sorted(
        (a for a in CORE_ANCHORS if a in lat),
        key=lambda a: lat[a][0],
    )[:N_ANCHORS]
    never = [n for n in names if n not in lat]
    never.sort(key=lambda n: (n not in PRIORITY, names.index(n)))
    fill = never[: WINDOW_SIZE - len(anchors)]
    window = anchors + fill
    if len(window) < WINDOW_SIZE:
        # Re-validation slots: banked-then-changed entries first (their
        # green rows are stale evidence — tools/impl_drift.py; round-8
        # verdict task), then oldest-banked. Within each group, oldest
        # banking round first.
        from tools import impl_drift

        lv_path = os.path.join(REPO, "tools", "local_verified.json")
        local = json.load(open(lv_path)) if os.path.exists(lv_path) else {}
        stale = set(impl_drift.stale_banked(local))
        oldest = sorted(
            (n for n in names if n in lat and n not in window),
            key=lambda n: (n not in stale, lat[n][0]),
        )
        window += oldest[: WINDOW_SIZE - len(window)]
    assert len(window) == WINDOW_SIZE
    return window, never, anchors


def apply(window: list[str]) -> None:
    src = open(ENTRY).read()
    m, entries = dict_entries(src)
    vals = dict(entries)
    tail = [k for k, _ in entries if k not in set(window)]
    lines = ["        # ---- DRIVER WINDOW: positions 1-50 (driver checks first 50;"]
    lines.append("        # regenerated by scripts/rotate_window.py) ----")
    lines += [f'        "{k}": {vals[k]},' for k in window]
    lines.append("        # ---- position 51+: banked green or locally verified ----")
    lines += [f'        "{k}": {vals[k]},' for k in tail]
    new_src = src[: m.start(3)] + "\n".join(lines) + src[m.end(3) :]
    const = "DRIVER_WINDOW: list[str] = " + json.dumps(window, indent=4).replace(
        "\n]", ",\n]"
    )
    new_src = re.sub(
        r"DRIVER_WINDOW: list\[str\] = \[.*?\n\]", const, new_src, count=1, flags=re.S
    )
    open(ENTRY, "w").write(new_src)


def main() -> int:
    window, never, anchors = plan()
    print(f"anchors ({len(anchors)}): {anchors}")
    print(f"never-checked remaining before rotation: {len(never)}")
    print(f"new window ({len(window)}): {window}")
    if "--apply" in sys.argv:
        apply(window)
        print("applied — now run tests/test_window.py, check_driver.py on the "
              "window, and tools/rotation_ledger.py")
    else:
        print("(dry run — pass --apply to rewrite __spark_entry__.py)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
