"""Independent semantic pins for the round-7 operators.

The oracle parity suite proves Spark == DuckDB; these tests guard the other
failure mode — both engines computing the same WRONG thing — by checking
each new operator against an independent derivation (brute force in Python
or a set-algebra identity over the member queries' own outputs).
"""

from __future__ import annotations

from hackatonbigdata_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_session_gaps_custom_close_matches_bruteforce(spark):
    """Rebuild every user's sessions with a plain Python loop over the raw
    (ts, event_id, value) stream — same >= 30 min end-exclusive close, same
    1e-4 value quantization — and require the query to reproduce every
    session exactly."""
    import math

    from hackatonbigdata_spark.catalog import Catalog

    ev = (
        Catalog(spark, SF_DIR)
        .events.select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    want = {}
    gap_us = 1800 * 1_000_000
    for uid, g in ev.groupby("user_id"):
        start = last = None
        n = sv4 = 0
        for ts, val in zip(g["ts"], g["value"]):
            ts_us = int(ts.value // 1_000)
            if start is None:
                start, last, n, sv4 = ts_us, ts_us, 0, 0
            elif ts_us - last >= gap_us:
                want[(uid, start)] = (last, n, sv4)
                start, last, n, sv4 = ts_us, ts_us, 0, 0
            last = ts_us
            n += 1
            sv4 += math.floor(float(val) * 10000 + 0.5)
        if start is not None:
            want[(uid, start)] = (last, n, sv4)

    import pandas as pd

    def us(dt):
        return int(pd.Timestamp(dt).value // 1_000)

    got = QUERIES["session_gaps_custom_close"](spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        key = (r.user_id, us(r.session_start))
        assert key in want, key
        last, n, sv4 = want[key]
        assert us(r.session_end) == last, key
        assert r.n_events == n, key
        assert r.sum_v4 == sv4, key


def test_dedup_pipeline_report_reproduces_member_cardinalities(spark):
    """Set-algebra identity: each method's marginal over the combination
    matrix must equal the member query's own (undirected, distinct) pair
    count — the report may not invent or lose a single pair."""
    rep = QUERIES["dedup_pipeline_report"](spark, SF_DIR).collect()
    marg = {m: 0 for m in ["exact", "jaccard", "lsh", "containment"]}
    total = 0
    for r in rep:
        total += r.n_pairs
        for m in marg:
            if r[f"in_{m}"]:
                marg[m] += r.n_pairs
        # every emitted combination must contain at least one method
        assert any(r[f"in_{m}"] for m in marg)

    jacc = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    assert marg["jaccard"] == len({(r.doc_a, r.doc_b) for r in jacc})
    lsh = QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    assert marg["lsh"] == len({(r.doc_a, r.doc_b) for r in lsh})
    cont = QUERIES["dedup_containment_pairs"](spark, SF_DIR).collect()
    cont_undirected = {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in cont}
    assert marg["containment"] == len(cont_undirected)
    # exact marginal: derive cluster pair counts from the dedup summary
    exact = QUERIES["dedup_exact_docs"](spark, SF_DIR).collect()
    n_exact_pairs = sum(r.n_copies * (r.n_copies - 1) // 2 for r in exact)
    assert marg["exact"] == n_exact_pairs
    # the union over methods is the matrix total (rows partition the union)
    union = set(cont_undirected)
    union |= {(r.doc_a, r.doc_b) for r in jacc}
    union |= {(r.doc_a, r.doc_b) for r in lsh}
    assert total >= len(union)  # exact pairs may add more
