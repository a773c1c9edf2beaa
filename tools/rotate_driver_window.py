"""Rotate the driver-verification window for the next round.

The grading driver checks the FIRST ~50 registered queries each round;
`catalog.DRIVER_PRIORITY` pins that window. This tool regenerates the
tuple mechanically from the verification residue (VERDICT r3 "Next
round" #2: keep the rotation discipline for rounds 5-6):

1. queries whose latest driver status is a FAIL (must re-verify first),
2. never-driver-checked queries, whole modules first (ascending by the
   module's unchecked count, so small modules clear completely before
   big ones start), registration order within a module,
3. then the least-recently-checked passes (freshness rotation).

Usage:
    python tools/rotate_driver_window.py          # print the new block
    python tools/rotate_driver_window.py --write  # rewrite catalog.py

--write replaces the block between the ``DRIVER_PRIORITY: tuple`` line
and its closing ``)`` in simplemapreduce_spark/catalog.py, keeping the
hand-written policy comment above it intact.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50
CATALOG_PATH = os.path.join(REPO, "simplemapreduce_spark", "catalog.py")

# Judge-prescribed module order for the current window, if any (VERDICT
# r7 "Next round" #3 pins window 8 as windows + timeseries + the first
# relational_ext queries). Modules listed here come first, in this
# order; remaining unchecked modules follow under the default
# smallest-pocket-first policy. Cleared when empty. Keys are the LAST
# TWO dotted components of the defining module (e.g. "plans.windows",
# "streaming.windows") — ADVICE r8 flagged that single-tail keys
# conflate plans/windows with streaming/windows.
MODULE_PRIORITY: tuple[str, ...] = ()

# Judge-prescribed re-checks for the current window (VERDICT r8 "Next
# round" #1: the r7/r8 fix classes). These slot in right after the
# never-checked residue, before the generic freshness rotation.
RECHECKS: tuple[str, ...] = (
    "q_graph_label_propagation",
    "q_stream_sessionize_stateful",
    "q_ts_ewma",
    "q_window_rolling_corr",
    "q_drift_psi",
    "q_histogram_equiwidth",
)


def build_window() -> list[tuple[str, str]]:
    from simplemapreduce_spark import catalog
    from tools.gen_driver_coverage import latest_driver_status

    catalog.load_all()
    status = latest_driver_status()

    fails = [
        n for n in catalog.QUERIES if n in status and status[n][1].startswith("FAIL")
    ]
    unchecked_by_mod: dict[str, list[str]] = defaultdict(list)
    for n, fn in catalog.QUERIES.items():
        if n not in status:
            mod = ".".join(fn.__module__.rsplit(".", 2)[-2:])
            unchecked_by_mod[mod].append(n)
    checked = sorted(
        (n for n in catalog.QUERIES if n in status and n not in fails),
        key=lambda n: status[n][0],  # oldest driver round first
    )

    window: list[tuple[str, str]] = [(n, "re-verify: latest driver status FAIL") for n in fails]

    def mod_key(m: str):
        pri = MODULE_PRIORITY.index(m) if m in MODULE_PRIORITY else len(MODULE_PRIORITY)
        return (pri, len(unchecked_by_mod[m]), m)

    for mod in sorted(unchecked_by_mod, key=mod_key):
        for n in unchecked_by_mod[mod]:
            window.append((n, f"never driver-checked ({mod})"))
    seen = {n for n, _ in window}
    for n in RECHECKS:
        if n in catalog.QUERIES and n not in seen:
            window.append((n, "judge-prescribed re-check (VERDICT r8 fix classes)"))
            seen.add(n)
    for n in checked:
        if n not in seen:
            window.append((n, f"freshness: last checked r{status[n][0]}"))
    return window[:WINDOW]


def render(window: list[tuple[str, str]]) -> str:
    lines = ["DRIVER_PRIORITY: tuple[str, ...] = ("]
    last_reason = None
    for name, reason in window:
        if reason != last_reason:
            lines.append(f"    # -- {reason} --")
            last_reason = reason
        lines.append(f'    "{name}",')
    lines.append(")")
    return "\n".join(lines)


def main() -> None:
    window = build_window()
    block = render(window)
    if "--write" in sys.argv:
        src = open(CATALOG_PATH).read()
        new, n = re.subn(
            r"DRIVER_PRIORITY: tuple\[str, \.\.\.\] = \(.*?\n\)",
            block,
            src,
            count=1,
            flags=re.S,
        )
        if n != 1:
            raise RuntimeError("DRIVER_PRIORITY block not found in catalog.py")
        open(CATALOG_PATH, "w").write(new)
        print(f"catalog.py rewritten: window of {len(window)}")
    else:
        print(block)


if __name__ == "__main__":
    main()
