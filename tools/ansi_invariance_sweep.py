"""Full-catalog ANSI-mode invariance sweep.

Every query runs with spark.sql.ansi.enabled=true (the Spark 4 default
and the session's setting) and again with false — no query may depend
on ANSI error-vs-wrap semantics: a result that differs under non-ANSI
silent wrapping means an arithmetic path is overflowing (the
LPA-checksum advice class), and a query that ERRORS only under ANSI
means an invalid-index/cast path is firing (the bigram element_at
class). Both families were fixed this round; this sweep keeps them
fixed.

Usage: cd /tmp && python /root/repo/tools/ansi_invariance_sweep.py [sf_dir]

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
spark = get_spark("smr-ansi-invariance")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def run(fn, v):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", str(v))
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


bad = []
for i, (name, fn) in enumerate(catalog.QUERIES.items()):
    try:
        if run(fn, "true") != run(fn, "false"):
            bad.append(name)
            print("MISMATCH", name, flush=True)
    except Exception as e:
        bad.append(name)
        print("ERROR", name, repr(e)[:200], flush=True)
    if (i + 1) % 50 == 0:
        print(f"...{i + 1} done", flush=True)
print("BAD:", bad)
print("TOTAL:", len(catalog.QUERIES), "BAD_COUNT:", len(bad))
