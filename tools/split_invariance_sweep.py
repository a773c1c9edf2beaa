"""Full-catalog input-split invariance sweep.

Every query runs under spark.sql.files.maxPartitionBytes=64k (many tiny
scan splits) and again at the 128m default, memo cleared between runs.
This perturbs SCAN partitioning — the axis the shuffle-partition sweep
cannot reach — and stresses every per-partition code path: mapInPandas
batch boundaries, Arrow chunking, whole-file text sources, posexplode
pipelines, and the MapReduce-compat per-partition reducers.

Usage: cd /tmp && python /root/repo/tools/split_invariance_sweep.py [sf_dir]


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
spark = get_spark("smr-split-invariance")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def run(fn, nbytes):
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(nbytes))
    clear_memo()
    try:
        return sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


bad = []
for i, (name, fn) in enumerate(catalog.QUERIES.items()):
    try:
        if run(fn, 64 * 1024) != run(fn, 128 * 1024 * 1024):
            bad.append(name)
            print("MISMATCH", name, flush=True)
    except Exception as e:
        bad.append(name)
        print("ERROR", name, repr(e)[:200], flush=True)
    if (i + 1) % 50 == 0:
        print(f"...{i + 1} done", flush=True)
print("BAD:", bad)
print("TOTAL:", len(catalog.QUERIES), "BAD_COUNT:", len(bad))
