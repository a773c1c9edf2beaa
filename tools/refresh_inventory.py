"""Regenerate SURVEY.md §2.3 (the auto-generated catalog inventory)
and the README catalog counts from the live registry.

Run from the repo root: ``python tools/refresh_inventory.py``.
"""

from __future__ import annotations

import collections
import inspect
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from simplemapreduce_spark import catalog  # noqa: E402


def main() -> None:
    catalog.load_all()
    mods = collections.defaultdict(list)
    for name, fn in catalog.QUERIES.items():
        f = inspect.unwrap(fn)
        mod = inspect.getmodule(f).__name__.replace("simplemapreduce_spark.", "")
        line = inspect.getsourcelines(f)[1]
        mods[mod.replace(".", "/") + ".py"].append((line, name))
    n_q, n_o = len(catalog.QUERIES), len(catalog.ORACLES)
    rows_only = sorted(set(catalog.QUERIES) - set(catalog.ORACLES))

    lines = [
        "### 2.3 Implemented catalog (round-4 snapshot, auto-generated)\n",
        f"""{n_q} registered queries, {n_o} with DuckDB oracles (the {n_q - n_o} rows-only
entries are the seeded pyspark.ml LSH wrappers — JVM-internal hash
families, genuinely not oracle-able; the iterative k-means/PQ queries
gained exact unrolled-SQL oracles in round 4, and the HLL sketches are
oracled via an exact-count + bounds-witness contract). Every entry
below is a `queries()` key; the driver-priority front 50 (catalog.py)
rotates never-driver-checked modules each round — see
DRIVER_COVERAGE.md (tools/gen_driver_coverage.py) for the live
per-query driver-verdict residue.

| Module (`simplemapreduce_spark/`) | # | Queries (`name`:line) |
|---|---|---|""",
    ]
    for mod in sorted(mods):
        entries = sorted(mods[mod])
        cell = ", ".join(
            f"`{n}`:{l}" + (" ᴿ" if n in rows_only else "") for l, n in entries
        )
        lines.append(f"| `{mod}` | {len(entries)} | {cell} |")
    lines.append(
        "\nᴿ = rows-only (no exact SQL oracle; recall/error bounds asserted in"
        " `tests/test_quality_bounds.py`).\n"
    )
    section = "\n".join(lines)

    survey_path = os.path.join(REPO, "SURVEY.md")
    text = open(survey_path).read()
    start = text.index("### 2.3 Implemented catalog")
    end = text.index("## 3. Query lifecycle")
    open(survey_path, "w").write(text[:start] + section + "\n" + text[end:])

    readme_path = os.path.join(REPO, "README.md")
    rd = open(readme_path).read()
    rd = re.sub(
        r"\d+ catalog queries; \d+ verified",
        f"{n_q} catalog queries; {n_o} verified",
        rd,
    )
    open(readme_path, "w").write(rd)
    print(f"inventory refreshed: {n_q} queries / {n_o} oracled")


if __name__ == "__main__":
    main()
