"""Full-catalog AQE on/off invariance sweep.

Every query runs with spark.sql.adaptive.enabled=true and again with
false, memo cleared between runs. AQE perturbs physical execution a
third way (runtime partition coalescing, skew-join splitting, join
strategy re-planning): results must be plan-independent. First run
caught a genuine Spark-side crash that AQE coalescing masks —
ApproxTopKCombine.serialize MatchError on empty partial partitions
(fixed by coalescing the tiny sketch table before the global combine).

Usage: cd /tmp && python /root/repo/tools/aqe_invariance_sweep.py [sf_dir]


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
spark = get_spark("smr-aqe-invariance")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def run(fn, v):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", str(v).lower())
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


bad = []
for i, (name, fn) in enumerate(catalog.QUERIES.items()):
    try:
        if run(fn, True) != run(fn, False):
            bad.append(name)
            print("MISMATCH", name, flush=True)
    except Exception as e:
        bad.append(name)
        print("ERROR", name, repr(e)[:200], flush=True)
    if (i + 1) % 50 == 0:
        print(f"...{i + 1} done", flush=True)
print("BAD:", bad)
print("TOTAL:", len(catalog.QUERIES), "BAD_COUNT:", len(bad))
