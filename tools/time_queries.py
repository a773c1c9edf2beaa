"""Steady-state timer for arbitrary catalog queries (round-11 A/B tool).

Times each named query through the noop sink in ONE session: one cold
run, then N (default 6) interleaved warm passes; reports cold, per-pass
times, min and tail-min (min of the last half). Mirrors bench.py's
methodology so isolated A/B numbers are comparable to the bench.

Usage:
    python tools/time_queries.py q_rank_corr_spearman q_sim_mmr_rerank \
        [--passes 6] [--sf-dir /root/testdata/sf0.1] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from simplemapreduce_spark import catalog
    from simplemapreduce_spark.session import get_spark

    catalog.load_all()
    unknown = [q for q in args.queries if q not in catalog.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("smr-time-queries")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm the session on a cheap query first (JVM/codegen startup).
    materialize(catalog.QUERIES["q6_forecast_revenue"](spark, args.sf_dir))

    cold: dict[str, float] = {}
    runs: dict[str, list[float]] = {q: [] for q in args.queries}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"cold:{name}")
        t0 = time.perf_counter()
        materialize(catalog.QUERIES[name](spark, args.sf_dir))
        cold[name] = round(time.perf_counter() - t0, 3)
    for p in range(args.passes):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"warm{p}:{name}")
            t0 = time.perf_counter()
            materialize(catalog.QUERIES[name](spark, args.sf_dir))
            runs[name].append(round(time.perf_counter() - t0, 3))

    out = {}
    for name in args.queries:
        r = runs[name]
        tail = r[len(r) // 2 :] or r
        out[name] = {
            "cold": cold[name],
            "runs": r,
            "min": min(r) if r else None,
            "tail_min": min(tail) if tail else None,
        }
        print(f"{name}: cold={cold[name]} runs={r} min={out[name]['min']} tail_min={out[name]['tail_min']}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
