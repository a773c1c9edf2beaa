"""Full-catalog join-strategy invariance sweep.

Every query runs with spark.sql.autoBroadcastJoinThreshold=-1 (no
broadcast joins anywhere — every equi-join becomes shuffle sort-merge,
every cross/range join a cartesian or BNLJ variant) and again at the
session's 64 MB default. Results must be join-algorithm independent:
SMJ-vs-BHJ discrepancies (null-key handling, duplicate-key expansion
order feeding a non-total-ordered window) would surface here.

Usage: cd /tmp && python /root/repo/tools/bcast_invariance_sweep.py [sf_dir]

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
spark = get_spark("smr-bcast-invariance")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def run(fn, v):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(v))
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


bad = []
for i, (name, fn) in enumerate(catalog.QUERIES.items()):
    try:
        if run(fn, -1) != run(fn, 64 * 1024 * 1024):
            bad.append(name)
            print("MISMATCH", name, flush=True)
    except Exception as e:
        bad.append(name)
        print("ERROR", name, repr(e)[:200], flush=True)
    if (i + 1) % 50 == 0:
        print(f"...{i + 1} done", flush=True)
print("BAD:", bad)
print("TOTAL:", len(catalog.QUERIES), "BAD_COUNT:", len(bad))
