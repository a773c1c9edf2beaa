"""Full-catalog Arrow-conversion on/off invariance sweep (axis #21).

Every query runs with spark.sql.execution.arrow.pyspark.enabled=true
(the session default) and again with false, memo cleared between runs.
The flag governs the Arrow fast path for driver<->JVM pandas
conversion (toPandas / createDataFrame-from-pandas); off forces the
row-at-a-time pickle fallback, which exercises different type coercion
(e.g. datetime64 vs Row timestamps, NaN vs None) anywhere a query or
its fixture staging round-trips through pandas. Arrow-batched
executor-side paths (pandas_udf / mapInPandas / applyInPandasWithState)
always use Arrow regardless of this flag — for those the axis is a
deliberate no-op and invariance holds trivially; the interesting
coverage is the staging/collect edges. VERDICT r8 "Next round" #7.

Usage: cd /tmp && python /root/repo/tools/arrow_off_invariance_sweep.py [sf_dir]

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
spark = get_spark("smr-arrow-off-invariance")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

FLAG = "spark.sql.execution.arrow.pyspark.enabled"


def run(fn, v):
    old = spark.conf.get(FLAG)
    spark.conf.set(FLAG, str(v).lower())
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set(FLAG, old)


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
