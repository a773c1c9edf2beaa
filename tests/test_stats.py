"""Property and plan-shape tests for the statistical operators in
plans/stats.py and the bigram LM in plans/llm_text.py. Value-level
correctness is covered by the DuckDB oracle parity suite; these tests
pin the REWRITE guarantees (sweep ≡ dominance spec on adversarial
inputs) and the physical-plan promises the docstrings make.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simplemapreduce_spark import catalog
from simplemapreduce_spark.sources.tables import load_table

catalog.load_all()


def test_pareto_sweep_equals_bruteforce_on_ties(spark, tmp_path):
    """The O(n log n) sweep must agree with the O(n²) dominance spec on
    a hand-built table dense in the tricky cases: duplicate points
    (both kept), equal price / different size, equal size / different
    price, and a strictly dominated interior."""
    rows = [
        # (partkey, price, size)
        (1, 10.0, 5),   # dominated by 4 (cheaper, same size)
        (2, 10.0, 5),   # exact duplicate of 1 — dominated the same way
        (3, 10.0, 3),   # same price as 1, smaller size — dominated
        (4, 8.0, 5),    # cheaper at size 5 — frontier
        (5, 12.0, 9),   # pricier but bigger — frontier
        (6, 12.0, 9),   # duplicate of 5 — equal points keep BOTH
        (7, 11.0, 4),   # interior — dominated by 4 (cheaper, bigger)
        (8, 7.0, 1),    # cheapest — frontier by price
    ]
    df = spark.createDataFrame(rows, ["p_partkey", "p_retailprice", "p_size"])
    sf = str(tmp_path / "mini")
    df.write.parquet(sf + "/part.parquet")

    got = {
        r["p_partkey"]
        for r in catalog.QUERIES["q_pareto_frontier"](spark, sf).collect()
    }

    def dominated(r):
        return any(
            s[1] <= r[1] and s[2] >= r[2] and (s[1] < r[1] or s[2] > r[2])
            for s in rows
        )

    want = {r[0] for r in rows if not dominated(r)}
    assert got == want
    # equal frontier points survive together; dominated rows are out
    assert want == {4, 5, 6, 8}


def test_entropy_bounds_and_extremes(spark, sf_dir):
    """0 <= H <= log2(#event types); single-type users hit exactly 0."""
    res = catalog.QUERIES["q_event_entropy"](spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    k = e.select("event_type").distinct().count()
    rows = res.collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy"] <= math.log2(k) + 1e-9, r
    types_per_user = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n"))
        .collect()
    }
    for r in rows:
        if types_per_user[r["user_id"]] == 1:
            assert r["entropy"] == 0.0


def test_regression_matches_closed_form(spark, sf_dir):
    """regr_slope/intercept agree with the closed-form normal equations
    computed from plain SUM aggregates (independent arithmetic path)."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
    ).first()
    n, sx, sy, sxy, sxx = (float(stats[c]) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = sy / n - slope * sx / n
    got = (
        li.agg(
            F.regr_slope("l_extendedprice", "l_quantity").alias("s"),
            F.regr_intercept("l_extendedprice", "l_quantity").alias("i"),
        ).first()
    )
    assert abs(got["s"] - slope) < 1e-6 * max(1.0, abs(slope))
    assert abs(got["i"] - intercept) < 1e-6 * max(1.0, abs(intercept))


def test_fuzzy_join_broadcasts_lexicon(spark, sf_dir):
    """The lexicon side must broadcast — a shuffle of the token side
    keyed for a nested-loop join would be the wrong plan."""
    plan = catalog.QUERIES["q_join_fuzzy"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_bigram_lm_scores_are_finite_and_positive(spark, sf_dir):
    """Unsmoothed self-scoring: every bigram exists in the counts, so
    cross-entropy is finite; probabilities <= 1 make it >= 0; docs
    with < 2 tokens are excluded."""
    res = catalog.QUERIES["q_text_bigram_lm"](spark, sf_dir).collect()
    assert res
    for r in res:
        assert r["n_bigrams"] >= 1
        assert r["cross_entropy"] is not None
        assert r["cross_entropy"] >= -1e-9
        assert math.isfinite(r["cross_entropy"])


def test_fuzzy_join_is_not_vacuous(spark, sf_dir):
    """Fixture-regeneration guard (the ADVICE r2 lesson): the typo
    lexicon must actually match part-name tokens — an empty result
    would make the oracle comparison pass while verifying nothing."""
    rows = catalog.QUERIES["q_join_fuzzy"](spark, sf_dir).collect()
    assert rows, "fuzzy lexicon matched nothing — update _LEXICON for the new fixture vocabulary"
    assert sum(r["n_parts"] for r in rows) >= 3


def test_bm25_terms_match_fixture_vocabulary(spark, sf_dir):
    """Same fixture-regeneration guard as the fuzzy lexicon: the BM25
    query terms must keep hitting documents, and longer documents with
    the same term count must score lower (length normalization)."""
    from collections import defaultdict

    from simplemapreduce_spark.plans.llm_text import _BM25_TERMS
    from simplemapreduce_spark.sources.tables import load_table

    rows = catalog.QUERIES["q_text_bm25"](spark, sf_dir).collect()
    assert rows, "BM25 query terms missing from fixture vocabulary — update _BM25_TERMS"
    assert all(r["bm25"] > 0 for r in rows)
    # Length normalization, asserted for real: among documents with an
    # IDENTICAL query-term tf vector, bm25 must be strictly decreasing
    # in document length (the b-term is the only remaining variable).
    score = {r["doc_id"]: r["bm25"] for r in rows}
    by_tf = defaultdict(list)
    for doc_id, text in load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect():
        toks = text.split()
        tf = tuple(toks.count(t) for t in _BM25_TERMS)
        if any(tf):
            by_tf[tf].append((len(toks), doc_id))
    checked = 0
    for tf, docs in by_tf.items():
        docs.sort()
        for (len_a, a), (len_b, b) in zip(docs, docs[1:]):
            if len_a < len_b:
                assert score[a] > score[b], (tf, a, b)
                checked += 1
    assert checked > 0, "no equal-tf doc pairs — length normalization unverified"


def test_jackknife_sufficient_statistics_algebra():
    """The q_jackknife_ratio_se trick — leave-one-out ratios from group
    sufficient statistics, moments over 1e-6-scaled integers — must
    agree with a brute-force jackknife (explicitly recompute the ratio
    N times with one row deleted) on random integer data. Validates
    the algebra independently of both engines."""
    import math
    import random

    rng = random.Random(7)
    for _ in range(25):
        n = rng.randint(3, 40)
        r = [rng.randint(1, 10_000_00) for _ in range(n)]  # cents
        q = [rng.randint(1, 50) for _ in range(n)]
        sr, sq = sum(r), sum(q)
        # brute force: recompute each leave-one-out ratio from scratch
        loo_brute = [
            sum(rv for j, rv in enumerate(r) if j != i)
            / sum(qv for j, qv in enumerate(q) if j != i)
            for i in range(n)
        ]
        # sufficient-statistics form, scaled-integer rounding as in the plan
        loo6 = [round((sr - r[i]) / (sq - q[i]) * 1_000_000) for i in range(n)]
        s1, s2 = sum(loo6), sum(v * v for v in loo6)
        se_plan = math.sqrt((n - 1) / n * (s2 - s1 * s1 / n)) / 1_000_000
        mean_b = sum(loo_brute) / n
        se_brute = math.sqrt((n - 1) / n * sum((v - mean_b) ** 2 for v in loo_brute))
        # the only divergence allowed is the 1e-6 quantization of each loo
        assert abs(se_plan - se_brute) <= 1e-4 * max(1.0, se_brute), (
            n,
            se_plan,
            se_brute,
        )
