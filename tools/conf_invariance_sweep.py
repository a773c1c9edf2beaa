"""Generic full-catalog SQL-conf invariance sweep.

Generalizes the per-axis sweep scripts (shuffle fan-in, AQE, codegen,
Arrow batching, broadcast, ANSI): every catalog query runs twice in one
session under two values of ONE runtime SQL conf, memo cleared between
runs, and the sorted stringified rows must match. New axes run through
this tool instead of another near-copy script.

Round-7 axes driven through it:

* ``spark.sql.parquet.enableVectorizedReader true false`` — the
  vectorized columnar decoder vs the row-at-a-time parquet-mr path: a
  genuinely different decode surface (dictionary handling, timestamp
  logical-type resolution) the driver's session could flip.
* ``spark.sql.shuffle.partitions 32 1`` — the degenerate single-reducer
  layout: every shuffle collapses to one task, the strongest ordering
  stress for order-sensitive aggregation state (the 5-vs-32 sweep keeps
  multiple reducers; 1 removes reduce-side parallelism entirely).

Usage:
    cd /tmp && python /root/repo/tools/conf_invariance_sweep.py \
        <conf_key> <value_a> <value_b> [sf_dir]

Do NOT run concurrently with the pytest suite or another sweep (shared
/tmp/smr_scratch staging — see invariance_sweep.py).
"""

import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)
import os

os.environ["PYTHONPATH"] = REPO

ONLY: list[str] = []
if "--only" in sys.argv:  # comma-separated substrings to subset the catalog
    k = sys.argv.index("--only")
    if k + 1 >= len(sys.argv):
        raise SystemExit("--only requires a comma-separated substring list")
    # drop empty substrings: a trailing comma would otherwise match
    # every query and silently widen the subset to the full catalog
    ONLY = [s for s in sys.argv[k + 1].split(",") if s]
    del sys.argv[k : k + 2]
if len(sys.argv) < 4:
    raise SystemExit(__doc__)
KEY, VAL_A, VAL_B = sys.argv[1], sys.argv[2], sys.argv[3]
SF = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001"

from simplemapreduce_spark import catalog
from simplemapreduce_spark.cache import clear_memo
from simplemapreduce_spark.session import get_spark

catalog.load_all()
spark = get_spark(f"smr-conf-invariance-{KEY.rsplit('.', 1)[-1]}")


def run(fn, value):
    old = spark.conf.get(KEY, None)
    spark.conf.set(KEY, value)
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        if old is None:
            spark.conf.unset(KEY)
        else:
            spark.conf.set(KEY, old)


queries = {
    n: f
    for n, f in catalog.QUERIES.items()
    if not ONLY or any(s in n for s in ONLY)
}
if ONLY and not queries:
    raise SystemExit(
        f"--only {','.join(ONLY)!r} matched zero catalog queries — an empty "
        "sweep would report green over nothing (typo in the substring?)"
    )
print(f"axis: {KEY} = {VAL_A} vs {VAL_B} @ {SF} ({len(queries)} queries)",
      flush=True)
bad = []
for i, (name, fn) in enumerate(queries.items()):
    try:
        if run(fn, VAL_A) != run(fn, VAL_B):
            bad.append(name)
            print("MISMATCH", name, flush=True)
    except Exception as e:
        bad.append(name)
        print("ERROR", name, repr(e)[:200], flush=True)
    if (i + 1) % 50 == 0:
        print(f"...{i + 1} done", flush=True)
print("BAD:", bad)
print("TOTAL:", len(queries), "BAD_COUNT:", len(bad))
