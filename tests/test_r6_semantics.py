"""Independent semantic pins for the round-6 operators.

The oracle parity suite proves Spark == DuckDB; these tests guard the other
failure mode — both engines computing the same WRONG thing — by checking
each new operator against an independent derivation (brute force in Python,
a mathematical identity, or a statistical target).
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from hackatonbigdata_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_roc_auc_matches_bruteforce_pair_probability(spark):
    """AUC == P(score_pos > score_neg) + 0.5·P(tie), checked by direct pair
    enumeration for the three largest stores."""
    from pyspark.sql import functions as F

    from hackatonbigdata_spark.operators.forecast import _with_forecast
    from hackatonbigdata_spark.catalog import Catalog

    got = {
        r.l_suppkey: r.auc
        for r in QUERIES["eval_roc_auc"](spark, SF_DIR).collect()
    }
    f = _with_forecast(Catalog(spark, SF_DIR)).filter(
        F.col("forecast").isNotNull()
    )
    top = [
        r.l_suppkey
        for r in f.groupBy("l_suppkey")
        .count()
        .orderBy(F.desc("count"), "l_suppkey")
        .limit(3)
        .collect()
    ]
    med = {
        r.l_suppkey: r.med
        for r in f.groupBy("l_suppkey")
        .agg(F.percentile("actual", F.lit(0.5)).alias("med"))
        .collect()
    }
    rows = f.filter(F.col("l_suppkey").isin(top)).collect()
    by_store = defaultdict(list)
    for r in rows:
        by_store[r.l_suppkey].append((r.actual > med[r.l_suppkey], r.forecast))
    for sk in top:
        pos = [s for y, s in by_store[sk] if y]
        neg = [s for y, s in by_store[sk] if not y]
        wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
        brute = wins / (len(pos) * len(neg))
        assert abs(got[sk] - brute) < 1e-4, (sk, got[sk], brute)


def test_triangle_count_matches_bruteforce(spark):
    """Per-node triangle counts equal brute-force enumeration over the same
    >=2-basket edge set."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct().collect()
    baskets = defaultdict(set)
    for r in items:
        baskets[r.l_orderkey].add(r.l_partkey)
    pair_n = defaultdict(int)
    for parts in baskets.values():
        for u, v in combinations(sorted(parts), 2):
            pair_n[(u, v)] += 1
    edges = {p for p, n in pair_n.items() if n >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = defaultdict(int)
    for u, v in edges:  # u < v by construction
        for w in adj[u] & adj[v]:
            if w > v:  # count each triangle once, attribute to all 3 nodes
                tri[u] += 1
                tri[v] += 1
                tri[w] += 1
    got = QUERIES["graph_triangle_count"](spark, SF_DIR).collect()
    assert len(got) == len(adj)
    for r in got:
        assert r.n_triangles == tri.get(r.part, 0), r.part
        assert r.degree == len(adj[r.part]), r.part


def test_association_rule_identities(spark):
    """Every returned rule's three measures must reproduce from its integer
    columns and an independently counted basket total; support is symmetric
    and both rule directions exist."""
    from pyspark.sql import functions as F

    rows = QUERIES["basket_association_rules"](spark, SF_DIR).collect()
    assert rows
    n_baskets = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(F.countDistinct("l_orderkey"))
        .collect()[0][0]
    )
    sup = {}
    for r in rows:
        assert abs(r.support - r.n_ab / n_baskets) < 1e-4
        assert abs(r.confidence - r.n_ab / r.n_antecedent) < 1e-4
        assert (
            abs(r.lift - r.n_ab * n_baskets / (r.n_antecedent * r.n_consequent))
            < 1e-4
        )
        sup[(r.antecedent, r.consequent)] = r.support
    for (a, b), s in sup.items():
        assert sup[(b, a)] == s  # support is symmetric, both directions exist


def test_brier_murphy_identity(spark):
    """brier_binned must equal reliability - resolution + uncertainty, and
    the raw Brier must sit within the within-bin variance of the binned one."""
    r = QUERIES["eval_brier_decomposition"](spark, SF_DIR).collect()[0]
    assert abs(r.brier_binned - (r.reliability - r.resolution + r.uncertainty)) < 3e-4
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-9
    assert r.brier >= r.brier_binned - 3e-4  # raw >= binned (Jensen)


def test_quantile_fit_coverage_near_targets(spark):
    """The fitted pinball regressors must achieve empirical coverage close
    to their tau targets — the statistical point of the fit."""
    rows = {r.tau_x10: r for r in QUERIES["calibration_quantile_fit"](spark, SF_DIR).collect()}
    for tq, tol in [(1, 0.03), (5, 0.03), (9, 0.03)]:
        assert abs(rows[tq].coverage - tq / 10.0) < tol, (tq, rows[tq].coverage)
    # pinball loss is minimized at the true quantile: the tails must not
    # cost more than the median fit
    assert rows[1].mean_pinball < rows[5].mean_pinball
    assert rows[9].mean_pinball < rows[5].mean_pinball


def test_containment_dominates_jaccard(spark):
    """Containment >= Jaccard always (the denominator can only grow), and
    every returned pair clears the 0.8 threshold."""
    rows = QUERIES["dedup_containment_pairs"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.containment >= 0.8 - 1e-9
        assert r.containment >= r.jaccard - 1e-9
        assert r.n_common <= r.sz_a


def test_softdedup_weight_conservation(spark):
    """Effective docs <= raw docs; sources with zero duplicates keep
    efficiency exactly 1."""
    rows = QUERIES["corpus_softdedup_weights"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.effective_docs <= r.n_docs + 1e-9
        if r.n_duplicated == 0:
            assert r.dedup_efficiency == 1.0


def test_pii_scrub_injection_and_detection_agree(spark):
    """Docs with an injected contact block (doc_id % 3 != 0) must report
    exactly one email and one phone; uninjected docs report zero."""
    rows = QUERIES["text_pii_scrub"](spark, SF_DIR).collect()
    for r in rows:
        if r.doc_id % 3 == 0:
            assert (r.n_emails, r.n_phones, r.has_pii) == (0, 0, False), r.doc_id
        else:
            assert (r.n_emails, r.n_phones, r.has_pii) == (1, 1, True), r.doc_id


def test_purged_cv_budget_partitions_rows(spark):
    """Per fold: test + train + purged == total rows, folds tile the span
    without overlap, and the purge never bleeds into the test window."""
    rows = sorted(
        QUERIES["cv_purged_embargo"](spark, SF_DIR).collect(),
        key=lambda r: r.fold,
    )
    li_n = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert [r.fold for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert r.n_test + r.n_train + r.n_purged == li_n, r.fold
        assert r.n_test > 0 and r.n_train > 0
    for a, b in zip(rows, rows[1:]):
        assert b.test_start_day == a.test_end_day + 1  # contiguous tiling
