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
