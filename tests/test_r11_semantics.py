"""Independent semantic pins for the round-11 operators.

Same contract as test_r7..r10_semantics: the oracle parity suite proves
Spark == DuckDB; these tests guard against both engines computing the
same WRONG thing by re-deriving each operator's result independently
(pure Python, with inputs pulled through DuckDB — never through the
Spark code under test).
"""

from __future__ import annotations

import math

from hackatonbigdata_spark.registry import all_queries
from tests.test_r10_semantics import (
    K,
    M,
    NC,
    _h32,
    _load_embeddings,
    _pq,
    _r4,
    _seq_dot,
)

QUERIES = all_queries()

NPROBES = (1, 2, 4)


def _ivfpq_nprobe_python():
    """Pure-Python rederivation of similarity_ivfpq_nprobe: centroid
    ranking, exact top-3, the pooled ADC candidate ranking per probe
    level, and the two floor-quantized summary figures."""
    emb = _load_embeddings()
    ids = sorted(emb)
    nv = len(ids)
    nrm = {v: math.sqrt(_seq_dot(e, e)) for v, e in emb.items()}
    qq = {v: _seq_dot(e, e) for v, e in emb.items()}
    seeds = sorted(emb, key=lambda v: (_h32(str(v)), v))[:K]
    rec = _pq(emb, seeds)
    rr = {v: _seq_dot(rec[v], rec[v]) for v in emb}
    # full centroid ranking per vector (r4 cosine desc, centroid-id tie)
    ranks = {}
    for vid in ids:
        order = sorted(
            (-_r4(_seq_dot(emb[vid], emb[c]) / (nrm[vid] * nrm[c])), c)
            for c in range(NC)
        )
        ranks[vid] = {c: i + 1 for i, (_, c) in enumerate(order)}
    bucket = {
        vid: min(ranks[vid], key=lambda c: ranks[vid][c]) for vid in ids
    }
    ex3 = {}
    for a in ids:
        co = sorted(
            (-_r4(_seq_dot(emb[a], emb[b]) / (nrm[a] * nrm[b])), b)
            for b in ids
            if b != a
        )
        ex3[a] = {b for _, b in co[:3]}
    out = {}
    for np_ in NPROBES:
        sh = sc = 0
        for a in ids:
            cand = [
                (_r4(qq[a] - 2 * _seq_dot(emb[a], rec[b]) + rr[b]), b)
                for b in ids
                if b != a and ranks[a][bucket[b]] <= np_
            ]
            sc += len(cand)
            top3 = {b for _, b in sorted(cand)[:3]}
            sh += len(top3 & ex3[a])
        out[np_] = (
            math.floor(sh * 10000.0 / (3 * nv) + 0.5) / 10000.0,
            math.floor(sc * 10000.0 / nv + 0.5) / 10000.0,
        )
    return out


def test_similarity_ivfpq_nprobe_matches_python(spark):
    """Full rederivation of the multi-probe composed IVF-PQ search: the
    shared centroid ranking, the hash-seeded PQ codes, the pooled ADC
    candidate ranking at each probe level, and both floor-quantized
    summary figures."""
    want = _ivfpq_nprobe_python()
    from tests.conftest import SF_DIR

    got = {
        r.nprobe: r
        for r in QUERIES["similarity_ivfpq_nprobe"](spark, SF_DIR).collect()
    }
    assert set(got) == set(NPROBES)
    for np_ in NPROBES:
        assert got[np_].recall3_adc == want[np_][0], np_
        assert got[np_].mean_candidates == want[np_][1], np_


def test_hll_intersection_identity_and_accuracy_m16():
    """Kernel-level pin of the inclusion-exclusion set operation in the
    forced-raw m=16 regime: (a) the union estimate from the elementwise
    MAX merge equals the estimate of the concatenated tape EXACTLY (the
    max-fold mergeability the daily rollup proves, reused as a set op);
    (b) est(A) + est(B) − est(merge) lands within the combined 3-sigma
    HLL error band of the true intersection (sigma = 1.04/sqrt(16) per
    estimate)."""
    from hackatonbigdata_spark.streaming import jobs

    m = 16
    a_users = [f"u{i}" for i in range(200)]
    b_users = [f"u{i}" for i in range(120, 420)]  # true overlap = 80
    ra = jobs.hll_update([0] * m, a_users, m)
    rb = jobs.hll_update([0] * m, b_users, m)
    merged = [max(x, y) for x, y in zip(ra, rb)]
    assert merged == jobs.hll_update([0] * m, a_users + b_users, m)
    est_a = jobs.hll_estimate(ra, m)
    est_b = jobs.hll_estimate(rb, m)
    est_u = jobs.hll_estimate(merged, m)
    est_inter = est_a + est_b - est_u
    true_union = len(set(a_users) | set(b_users))
    sigma = 1.04 / math.sqrt(m)
    assert abs(est_inter - 80) <= 3 * sigma * (len(a_users) + len(b_users) + true_union)


def test_stream_hll_returning_users_matches_python(spark):
    """Full rederivation of the HLL intersection query: per-hour
    registers under the shared md5 rule (via the streaming kernel's own
    hll_reg/hll_update, themselves pinned against the batch twin),
    elementwise-max merged registers per consecutive-hour pair, the
    three estimates, the inclusion-exclusion combination, and both
    exact counts."""
    import duckdb

    from hackatonbigdata_spark.registry import all_queries
    from hackatonbigdata_spark.sketch_params import HLL_M
    from hackatonbigdata_spark.streaming import jobs
    from tests.conftest import SF_DIR

    rows = duckdb.connect().execute(
        "SELECT date_trunc('hour', ts), user_id FROM read_parquet(?)",
        [f"{SF_DIR}/events.parquet"],
    ).fetchall()
    by_hour = {}
    users = {}
    for hour, uid in rows:
        by_hour.setdefault(hour, []).append(uid)
        users.setdefault(hour, set()).add(uid)
    regs = {
        h: jobs.hll_update([0] * HLL_M, us, HLL_M)
        for h, us in by_hour.items()
    }
    import datetime

    one_h = datetime.timedelta(hours=1)
    got = {
        r.hour: r
        for r in all_queries()["stream_hll_returning_users"](
            spark, SF_DIR
        ).collect()
    }
    want_hours = {h for h in regs if h - one_h in regs}
    assert set(got) == want_hours and len(want_hours) > 0
    for h in want_hours:
        prev = h - one_h
        merged = [max(x, y) for x, y in zip(regs[prev], regs[h])]
        est_prev = jobs.hll_estimate(regs[prev], HLL_M)
        est_curr = jobs.hll_estimate(regs[h], HLL_M)
        est_union = jobs.hll_estimate(merged, HLL_M)
        r = got[h]
        assert r.est_prev == est_prev, h
        assert r.est_curr == est_curr, h
        assert r.est_union == est_union, h
        assert r.est_returning == est_prev + est_curr - est_union, h
        assert r.n_returning == len(users[prev] & users[h]), h
        assert r.n_users == len(users[h]), h


def test_search_mmr_rerank_matches_python(spark):
    """Full rederivation of the greedy MMR re-rank: the r4 cosine pair
    grid, each query's top-10 pool, and the 5 greedy selections with
    score λ·rel − (1−λ)·max sim(d, selected) — where the redundancy max
    is the TRUE max over the selected set (it can be negative for
    anti-correlated candidates; a zero-seeded running max would floor it
    — exactly the bug this independent pin exists to catch)."""
    from tests.conftest import SF_DIR

    emb = _load_embeddings()
    ids = sorted(emb)
    nrm = {v: math.sqrt(_seq_dot(e, e)) for v, e in emb.items()}
    sim = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            s = _r4(_seq_dot(emb[a], emb[b]) / (nrm[a] * nrm[b]))
            sim[(a, b)] = s
            sim[(b, a)] = s
    lam, mu = 0.7, 0.3
    want = {}
    for q in ids:
        pool = sorted(((-sim[(q, b)], b) for b in ids if b != q))[:10]
        rels = {b: -negs for negs, b in pool}
        remaining = sorted(rels)
        maxsel: dict = {b: None for b in remaining}
        for k in range(1, 6):
            scored = sorted(
                (
                    -(lam * rels[b] - mu * (maxsel[b] or 0.0)),
                    b,
                )
                for b in remaining
            )
            negsc, bb = scored[0]
            want[(q, k)] = (bb, rels[bb], _r4(-negsc))
            remaining.remove(bb)
            for b in remaining:
                s = sim[(b, bb)]
                maxsel[b] = s if maxsel[b] is None else max(maxsel[b], s)
    got = QUERIES["search_mmr_rerank"](spark, SF_DIR).collect()
    assert len(got) == len(ids) * 5
    for r in got:
        bb, rel, sc = want[(r.vec_id, r.mmr_rank)]
        assert (r.nb, r.rel, r.score) == (bb, rel, sc), (r.vec_id, r.mmr_rank)
    # greedy invariant: from rank 2 on, each step picks the argmax over
    # a subset with weakly larger penalties (maxsel is a max over a
    # growing set), so the selected score never increases with rank.
    # Rank 1 is excluded: its penalty term is 0 by definition while a
    # NEGATIVE sim to the first pick can lift rank 2's score above it.
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.vec_id, []).append((r.mmr_rank, r.score))
    for q, pairs in by_q.items():
        scores = [s for _, s in sorted(pairs)][1:]
        assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:])), q


def test_kmv_overlap_algebra_fuzzed():
    """Hypothesis fuzz of the bottom-k overlap algebra on arbitrary hash
    sets: (a) the union sketch (bottom-k of the two sketches' union)
    equals the bottom-k of the TRUE union — set-of-minima merge loses
    nothing; (b) every union-sketch member present in both input
    sketches is a true intersection element and vice versa under the
    kth-min bound (the certification rule); (c) under budget the match
    count IS the exact intersection size."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    K = 8
    hashes = st.sets(st.integers(min_value=0, max_value=10**6), max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(hashes, hashes)
    def check(a_full, b_full):
        sk_a = set(sorted(a_full)[:K])
        sk_b = set(sorted(b_full)[:K])
        merged = set(sorted(sk_a | sk_b)[:K])
        assert merged == set(sorted(a_full | b_full)[:K])  # (a)
        matches = merged & sk_a & sk_b
        true_inter = a_full & b_full
        # (b): certified members are true intersection elements...
        assert matches <= true_inter
        # ...and every true intersection element under the union's
        # kth-min is certified
        if merged:
            bound = max(merged)
            assert {h for h in true_inter if h <= bound} == matches
            if len(merged) < K:  # (c) under budget: exact
                assert matches == true_inter

    check()


def test_sketch_kmv_overlap_matches_python(spark):
    """Full rederivation of the bottom-k overlap sketch: 52-bit md5
    hashes, per-hour bottom-32 sketches, set-of-minima union merge,
    certified-intersection matches, the at-budget estimator, and the
    exact-under-budget guarantee (est_returning == n_returning wherever
    is_exact, barring md5-prefix collisions — none in this corpus)."""
    import duckdb
    import hashlib

    from hackatonbigdata_spark.registry import all_queries
    from tests.conftest import SF_DIR

    K = 32
    rows = duckdb.connect().execute(
        "SELECT DISTINCT date_trunc('hour', ts), user_id"
        " FROM read_parquet(?)",
        [f"{SF_DIR}/events.parquet"],
    ).fetchall()
    users: dict = {}
    for hour, uid in rows:
        users.setdefault(hour, set()).add(uid)

    def h52(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16)

    sk = {
        h: set(sorted({h52(u) for u in us})[:K]) for h, us in users.items()
    }
    import datetime

    one_h = datetime.timedelta(hours=1)
    got = {
        r.hour: r
        for r in all_queries()["sketch_kmv_overlap"](spark, SF_DIR).collect()
    }
    want_hours = {h for h in users if h - one_h in users}
    assert set(got) == want_hours and len(want_hours) > 0
    for h in want_hours:
        a, b = sk[h - one_h], sk[h]
        merged = set(sorted(a | b)[:K])
        n_merged = len(merged)
        matches = len(merged & a & b)
        if n_merged < K:
            est_union = n_merged
        else:
            est_union = math.floor(
                (K - 1) * float(1 << 52) / (max(merged) + 1) + 0.5
            )
        est_ret = math.floor(matches * float(est_union) / n_merged + 0.5)
        r = got[h]
        assert r.n_merged == n_merged, h
        assert r.n_matches == matches, h
        assert r.est_union == est_union, h
        assert r.est_returning == est_ret, h
        assert r.is_exact == (n_merged < K), h
        true_ret = len(users[h - one_h] & users[h])
        assert r.n_returning == true_ret, h
        if r.is_exact:
            assert r.est_returning == true_ret, h


def test_io_zorder_prune_wide_domains(spark, tmp_path):
    """The z-order layout must keep BOTH dimensions' per-file extents
    tight on domains that exceed the 12-bit budget — a 23-year date span
    (>4096 days) and a 200k part-key domain.  The pre-r11 fixed-epoch
    date mapping silently dropped high bits past day 4095, aliasing
    early and late years into the same z-range and degrading the
    skipping to one dimension; domain scaling (the same 1-row ANALYZE as
    the part key) keeps the interleave balanced at any width."""
    import datetime

    from pyspark.sql import functions as F

    from hackatonbigdata_spark.operators.io_queries import (
        _scratch,
        io_zorder_prune,
        zorder_file_stats,
    )

    sf = str(tmp_path / "wide_sf")
    n = 40000
    base = datetime.date(1992, 1, 1)
    (
        spark.range(n)
        .select(
            F.date_add(
                F.lit(base), ((F.col("id") * 2654435761) % 8400).cast("int")
            )
            .cast("timestamp")
            .alias("l_shipdate"),
            ((F.col("id") * 40503) % 200000).alias("l_partkey"),
            (F.col("id") % 50 + 1).cast("double").alias("l_quantity"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{sf}/lineitem.parquet")
    )
    io_zorder_prune(spark, sf).collect()
    stats = zorder_file_stats(spark, _scratch(sf, "zorder_shipdate_partkey"))
    assert len(stats) == 16
    span_d = (max(x[2] for x in stats) - min(x[1] for x in stats)).days
    mean_d = sum((x[2] - x[1]).days for x in stats) / len(stats)
    span_k = max(x[4] for x in stats) - min(x[3] for x in stats)
    mean_k = sum(x[4] - x[3] for x in stats) / len(stats)
    # balanced 2-D interleave over 16 files: each dimension's mean
    # per-file extent sits well below its span (a wrapped dimension
    # would show mean ≈ span)
    assert span_d > 4096  # the domain actually exceeds the bit budget
    assert mean_d < span_d / 2
    assert mean_k < span_k / 2


def test_io_mor_deletes_layout(spark):
    """The merge-on-read LAYOUT contract (losslessness is what the
    oracle parity proves): the delete file holds ONLY (file_id, pos) row
    identities — never data columns or a predicate; its row count is
    exactly the delete predicate's match count; and the base files still
    hold every source row — nothing was rewritten."""
    import duckdb

    from hackatonbigdata_spark.operators.io_queries import (
        _MOR_DEL_QTY,
        _scratch,
        io_mor_deletes,
    )
    from hackatonbigdata_spark.registry import all_queries
    from tests.conftest import SF_DIR

    all_queries()  # ensure registration
    io_mor_deletes(spark, SF_DIR).collect()
    con = duckdb.connect()
    n_src, n_del_true = con.execute(
        f"SELECT count(*), sum(CASE WHEN l_quantity >= {_MOR_DEL_QTY}"
        " THEN 1 ELSE 0 END) FROM read_parquet(?)",
        [f"{SF_DIR}/lineitem.parquet"],
    ).fetchone()
    base = spark.read.parquet(_scratch(SF_DIR, "mor_base"))
    dels = spark.read.parquet(_scratch(SF_DIR, "mor_deletes"))
    assert sorted(dels.columns) == ["file_id", "pos"]
    assert dels.count() == n_del_true > 0
    assert base.count() == n_src  # base untouched by the delete
    # row identity is unique — a positional delete can never over-delete
    assert (
        dels.distinct().count() == dels.count()
        and base.select("file_id", "pos").distinct().count() == n_src
    )


def test_search_mmr_rerank_partial_pool(spark, tmp_path):
    """A query whose candidate pool is exhausted before K=5 picks must
    keep its PARTIAL selection (the greedy loop's state join is a left
    join — an inner join would silently erase the already-ranked rows of
    any query with no pick left).  4 vectors → every pool has 3
    candidates → exactly 3 ranked rows per query, matching the oracle's
    partial-selection semantics and the pure-Python greedy."""
    import duckdb

    sf = str(tmp_path / "tiny_sf")
    import os

    os.makedirs(sf, exist_ok=True)
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0] * 16),
        (1, [0.9, 0.1, 0.0, 0.0] * 16),
        (2, [0.0, 1.0, 0.0, 0.0] * 16),
        (3, [-0.5, 0.2, 0.7, 0.0] * 16),
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    got = QUERIES["search_mmr_rerank"](spark, sf).collect()
    assert len(got) == 4 * 3
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.vec_id, []).append(r.mmr_rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
    # and the oracle agrees on the tiny corpus too
    import __spark_entry__ as E

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; glob the part files for DuckDB
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    oro = con.execute(E.oracle_sql()["search_mmr_rerank"]).fetchall()
    want = {
        (r[0], int(r[1])): (r[2], r[3], r[4]) for r in oro
    }
    assert len(want) == 12
    for r in got:
        assert want[(r.vec_id, r.mmr_rank)] == (r.nb, r.rel, r.score)


def test_ivfpq_nprobe_pins_against_sweep_and_topk(spark):
    """Cross-operator consistency for the retrieval-ladder closers:

    - at nprobe=1 the pooled ADC search IS the composed index's raw-code
      bucket search, so recall3_adc(1) == similarity_ivfpq_topk's
      mean_recall3 exactly;
    - an exact neighbor the ADC ranking returns must live in a probed
      bucket, so recall3_adc(np) <= the sweep's ceiling recall3(np);
    - the candidate pool is the same probed-bucket mass the sweep
      prices, so mean_candidates matches the sweep's column exactly;
    - on this corpus the pooled search is monotone in nprobe (more
      candidates never hid a neighbor here — empirical, asserted to
      keep the published curve honest)."""
    from tests.conftest import SF_DIR

    got = {
        r.nprobe: r
        for r in QUERIES["similarity_ivfpq_nprobe"](spark, SF_DIR).collect()
    }
    sweep = {
        r.nprobe: r
        for r in QUERIES["similarity_ivf_nprobe_sweep"](
            spark, SF_DIR
        ).collect()
    }
    topk = QUERIES["similarity_ivfpq_topk"](spark, SF_DIR).collect()[0]
    assert got[1].recall3_adc == topk.mean_recall3
    for np_ in NPROBES:
        assert got[np_].recall3_adc <= sweep[np_].recall3, np_
        assert got[np_].mean_candidates == sweep[np_].mean_candidates, np_
    assert (
        got[1].recall3_adc <= got[2].recall3_adc <= got[4].recall3_adc
    )
