"""Full-catalog session-timezone invariance sweep.

Every query runs under spark.sql.session.timeZone=UTC and again under
America/New_York (DST-observing, the round-5 ADVICE scenario: the
grading driver builds its own session and may not pin UTC). Sorted
stringified rows must match — the exhaustive version of the targeted
non-UTC pins in tests/test_advice_r6.py, catching any session-zone
dependence the grep audit (unix_micros / casts / unix_timestamp)
missed.

Usage: cd /tmp && python /root/repo/tools/tz_invariance_sweep.py [sf_dir]
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
spark = get_spark("smr-tz-invariance")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def run(fn, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


bad = []
for i, (name, fn) in enumerate(catalog.QUERIES.items()):
    try:
        if run(fn, "UTC") != run(fn, "America/New_York"):
            bad.append(name)
            print("MISMATCH", name, flush=True)
    except Exception as e:
        bad.append(name)
        print("ERROR", name, repr(e)[:200], flush=True)
    if (i + 1) % 50 == 0:
        print(f"...{i + 1} done", flush=True)
print("BAD:", bad)
print("TOTAL:", len(catalog.QUERIES), "BAD_COUNT:", len(bad))
