"""Full-catalog shuffle-partition invariance sweep.

Every query runs twice in one session — spark.sql.shuffle.partitions=5,
then 32 — with the memo layer cleared between runs so BOTH executions
pay the full pipeline under their own partitioning. Sorted stringified
rows must match: the property that makes the DuckDB oracle gate
meaningful on a cluster whose partitioning the driver does not control
(tests/test_properties.py pins 16 hand-picked representatives; this is
the exhaustive version, run per-round from a scratch cwd).

Usage: cd /tmp && python /root/repo/tools/invariance_sweep.py [sf_dir]


Do NOT run concurrently with the pytest suite or another sweep:
queries stage artifacts under /tmp/smr_scratch keyed by table stamp,
and a concurrent process overwriting a staged dir mid-read produces
false mismatches (observed: q_source_text_lines / q_join_bucketed).
"""

import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)
import os

os.environ["PYTHONPATH"] = REPO

from simplemapreduce_spark import catalog
from simplemapreduce_spark.cache import clear_memo
from simplemapreduce_spark.session import get_spark

catalog.load_all()
spark = get_spark("smr-invariance")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def run(fn, n):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


bad = []
for i, (name, fn) in enumerate(catalog.QUERIES.items()):
    try:
        if run(fn, 5) != run(fn, 32):
            bad.append(name)
            print("MISMATCH", name, flush=True)
    except Exception as e:
        bad.append(name)
        print("ERROR", name, repr(e)[:200], flush=True)
    if (i + 1) % 50 == 0:
        print(f"...{i + 1} done", flush=True)
print("BAD:", bad)
print("TOTAL:", len(catalog.QUERIES), "BAD_COUNT:", len(bad))
