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

# Judge-prescribed re-checks for the current window. These slot in
# right after the never-checked residue, before the generic freshness
# rotation. Window 11 (VERDICT r10 "Next round" #1): every operator
# REWRITTEN in the round-10/11 optimization rounds, so each gets a
# ground-truth driver verdict POST-change — the 17 streaming drains +
# q_source_python_stream (r10 kept #1 + r11 state sizing/projection),
# the 11 r10 batch rewrites, and the 3 r11-only rewrites
# (q_sim_mmr_rerank, q_source_binary_files, q_approx_count_distinct).
RECHECKS: tuple[str, ...] = (
    # streaming drains + stateful + python stream source
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_global_agg",
    "q_stream_session_window",
    "q_stream_chained_agg",
    "q_stream_static_join",
    "q_stream_dedup",
    "q_stream_dedup_watermarked",
    "q_stream_late_drop",
    "q_stream_update_mode",
    "q_stream_foreach_batch_sink",
    "q_stream_stream_join",
    "q_stream_stream_left_outer",
    "q_stream_stream_full_outer",
    "q_stream_stream_semi",
    "q_source_python_stream",
    "q_stream_stateful_counts",
    "q_stream_sessionize_stateful",
    # round-10 batch rewrites
    "q_multimodal_block_dedup",
    "q_sim_margin_mining",
    "q_bootstrap_poisson_se",
    "q_cogroup_reconcile",
    "q_rank_corr_spearman",
    "q_jackknife_ratio_se",
    "q_split_cluster_aware",
    "q_profile_columns",
    "q_scalar_try",
    "q_sketch_count_min",
    "q_grouping_sets",
    # round-11-only rewrites
    "q_sim_mmr_rerank",
    "q_source_binary_files",
    "q_approx_count_distinct",
    "q_events_gini",
    "q_text_perplexity_buckets",
    "q_text_heaps_law",
    "q_agg_weighted_median",
    "q_agg_trimmed_mean",
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
            window.append((n, "judge-prescribed re-check (VERDICT r10 #1: post-rewrite ground truth)"))
            seen.add(n)
    for n in checked:
        if n not in seen:
            window.append((n, f"freshness: last checked r{status[n][0]}"))
    # ADVICE r9 #1: RECHECKS are appended after the never-checked
    # residue; if the pre-truncation window overflows WINDOW, a
    # judge-prescribed re-check could silently fall off the end.
    # Error loudly instead of dropping it.
    if len(window) > WINDOW:
        head = {n for n, _ in window[:WINDOW]}
        dropped = [n for n in RECHECKS if n in catalog.QUERIES and n not in head]
        if dropped:
            raise RuntimeError(
                f"window overflow ({len(window)} > {WINDOW}) would drop "
                f"judge-prescribed RECHECKS {dropped}; shrink MODULE_PRIORITY "
                "or raise WINDOW"
            )
        print(
            f"note: {len(window) - WINDOW} freshness candidates beyond the "
            f"{WINDOW}-slot window (no RECHECKS dropped)",
            file=sys.stderr,
        )
    return window[:WINDOW]


def render(window: list[tuple[str, str]]) -> str:
    # ADVICE r9 #2: the hand-written policy comment above DRIVER_PRIORITY
    # went stale across rounds; regenerate it here so --write keeps the
    # annotation in sync with the tuple it annotates.
    from simplemapreduce_spark import catalog
    from tools.gen_driver_coverage import latest_driver_status

    status = latest_driver_status()
    latest_round = max((r for r, _ in status.values()), default=0)
    n_reasons = defaultdict(int)
    for _, reason in window:
        n_reasons[reason.split(":")[0].split(" (")[0]] += 1
    mix = ", ".join(f"{v} {k}" for k, v in n_reasons.items())
    lines = [
        "# The grading driver verifies the FIRST ~50 registered queries.",
        "# GENERATED by tools/rotate_driver_window.py --write; do not edit",
        f"# by hand. Window composed after round {latest_round} "
        f"({len(status)}/{len(catalog.QUERIES)} driver-checked): {mix}.",
        "# Full manifest + per-query verdict history: DRIVER_COVERAGE.md.",
        "DRIVER_PRIORITY: tuple[str, ...] = (",
    ]
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
        # Consume the contiguous comment block directly above the tuple
        # too, so the annotation is regenerated together with the window
        # (ADVICE r9 #2 — the hand-written comment had gone stale).
        new, n = re.subn(
            r"(?:^#[^\n]*\n)*DRIVER_PRIORITY: tuple\[str, \.\.\.\] = \(.*?\n\)",
            block,
            src,
            count=1,
            flags=re.S | re.M,
        )
        if n != 1:
            raise RuntimeError("DRIVER_PRIORITY block not found in catalog.py")
        open(CATALOG_PATH, "w").write(new)
        print(f"catalog.py rewritten: window of {len(window)}")
    else:
        print(block)


if __name__ == "__main__":
    main()
