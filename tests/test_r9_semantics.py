"""Independent semantic pins for the round-9 operators.

Same contract as test_r7/r8_semantics: the oracle parity suite proves
Spark == DuckDB; these tests guard against both engines computing the same
WRONG thing by re-deriving each operator's result independently (pure
Python, with inputs pulled through DuckDB — never through the Spark code
under test).
"""

from __future__ import annotations

import hashlib
import math

from hackatonbigdata_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()

LINE_LEN = 16


def _doc_words(con):
    """(doc_id, filtered word list) via DuckDB — the engine's shared
    normalization, but never through the Spark code under test."""
    rows = con.execute(
        """
        SELECT doc_id, string_split(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g')), ' ') AS w
        FROM read_parquet(?)
        ORDER BY doc_id
        """,
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()
    return [(d, [x for x in w if x != ""]) for d, w in rows]


def _python_lines(con):
    """(doc_id, line_idx, n_toks, md5) instances — a plain Python tiling."""
    inst = []
    for doc_id, w in _doc_words(con):
        if not w:
            continue
        for li in range((len(w) - 1) // LINE_LEN + 1):
            toks = w[li * LINE_LEN : (li + 1) * LINE_LEN]
            h = hashlib.md5(" ".join(toks).encode()).hexdigest()
            inst.append((doc_id, li, len(toks), h))
    return inst


def test_dedup_lines_ccnet_matches_python_walk(spark):
    """Re-tile every document into 16-word lines with a plain Python loop,
    walk the corpus in (doc_id, line_idx) order keeping the first
    occurrence of each line hash, and rebuild the per-doc removal report
    from first principles."""
    import duckdb

    con = duckdb.connect()
    inst = _python_lines(con)
    seen: set = set()
    per: dict = {}
    for doc_id, li, n_toks, h in sorted(inst):
        n_lines, n_removed, n_tok, kept = per.get(doc_id, (0, 0, 0, 0))
        if h in seen:
            n_removed += 1
        else:
            seen.add(h)
            kept += n_toks
        per[doc_id] = (n_lines + 1, n_removed, n_tok + n_toks, kept)

    got = QUERIES["dedup_lines_ccnet"](spark, SF_DIR).collect()
    assert len(got) == len(per)
    removed_any = 0
    for row in got:
        n_lines, n_removed, n_tok, kept = per[row.doc_id]
        assert row.n_lines == n_lines, row.doc_id
        assert row.n_removed_lines == n_removed, row.doc_id
        assert row.n_tokens == n_tok, row.doc_id
        assert row.tokens_kept == kept, row.doc_id
        assert row.removed_line_frac == (
            math.floor(n_removed * 10000.0 / n_lines + 0.5) / 10000.0
        ), row.doc_id
        removed_any += n_removed > 0
    # the scenario must actually exercise removal (planted dups exist)
    assert removed_any > 0


def test_dedup_savings_line_row_matches_python(spark):
    """The savings report's line_first_seen policy row must equal the
    pure-Python keep-first walk's corpus totals."""
    import duckdb

    con = duckdb.connect()
    inst = _python_lines(con)
    seen: set = set()
    n_removed = removed_toks = 0
    for _doc_id, _li, n_toks, h in sorted(inst):
        if h in seen:
            n_removed += 1
            removed_toks += n_toks
        else:
            seen.add(h)
    total_toks = sum(len(w) for _, w in _doc_words(con))

    rows = {
        r.policy: r
        for r in QUERIES["dedup_savings_report"](spark, SF_DIR).collect()
    }
    row = rows["line_first_seen"]
    assert row.unit == "lines"
    assert row.n_removed == n_removed
    assert row.tokens_removed == removed_toks
    assert row.tokens_total == total_toks
    assert row.savings_frac == (
        math.floor(removed_toks * 10000.0 / total_toks + 0.5) / 10000.0
    )


def _seq_dot(a, b):
    """Sequential left-to-right fold — the exact IEEE addition order both
    engines use (llm._dot / DuckDB list_dot_product)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _r4(x):
    return math.copysign(math.floor(abs(x) * 10000.0 + 0.5) / 10000.0, x)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_embedding_pq_eval_matches_python(spark):
    """Full product-quantization reimplementation in plain Python: hash-
    seeded codebook, per-subspace L2 argmin encode (dot-product identity,
    the engines' sequential fold), asymmetric-distance and cosine top-5
    rankings with (value, id) tie-breaks, recall@5, frac_perfect, and the
    quantized reconstruction MSE."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM read_parquet(?)"
        " ORDER BY vec_id",
        [f"{SF_DIR}/embeddings.parquet"],
    ).fetchall()
    emb = {vid: list(e) for vid, e in rows}
    M, D, K = 8, 8, 16
    seeds = sorted(emb, key=lambda v: (_h32(str(v)), v))[:K]
    cb = {
        (k, s): emb[k][s * D : (s + 1) * D] for k in seeds for s in range(M)
    }

    def l2(a, b):
        return _seq_dot(a, a) - 2 * _seq_dot(a, b) + _seq_dot(b, b)

    rec, qq, rr = {}, {}, {}
    for vid, e in emb.items():
        out = []
        for s in range(M):
            sub = e[s * D : (s + 1) * D]
            best = min((l2(sub, cb[(k, s)]), k) for k in seeds)
            out.extend(cb[(best[1], s)])
        rec[vid] = out
        qq[vid] = _seq_dot(e, e)
        rr[vid] = _seq_dot(out, out)
    mseq = {
        v: math.floor((qq[v] - 2 * _seq_dot(emb[v], rec[v]) + rr[v]) / 64
                      * 10000 + 0.5)
        for v in emb
    }
    nrm = {v: math.sqrt(qq[v]) for v in emb}
    ids = sorted(emb)
    hits_by_vec = {}
    for a in ids:
        co = sorted(
            (-_r4(_seq_dot(emb[a], emb[b]) / (nrm[a] * nrm[b])), b)
            for b in ids
            if b != a
        )
        adc = sorted(
            (_r4(qq[a] - 2 * _seq_dot(emb[a], rec[b]) + rr[b]), b)
            for b in ids
            if b != a
        )
        top_co = {b for _, b in co[:5]}
        top_adc = {b for _, b in adc[:5]}
        hits_by_vec[a] = len(top_co & top_adc)
    n = len(ids)
    want_recall = math.floor(
        sum(hits_by_vec.values()) * 10000.0 / (5 * n) + 0.5
    ) / 10000.0
    want_perfect = math.floor(
        sum(1 for h in hits_by_vec.values() if h == 5) * 10000.0 / n + 0.5
    ) / 10000.0
    want_mse = math.floor(sum(mseq.values()) * 1.0 / n + 0.5) / 10000.0

    got = QUERIES["embedding_pq_eval"](spark, SF_DIR).collect()[0]
    assert got.n_vectors == n
    assert got.mean_recall5 == want_recall
    assert got.frac_perfect == want_perfect
    assert got.mean_sq_err == want_mse
    # the eval must be non-degenerate: some but not all neighbors survive
    assert 0.0 < got.mean_recall5 < 1.0


def test_stream_hourly_bloom_matches_python_fold(spark):
    """Rebuild every hour's Bloom filter with the plain Python fold from
    streaming/jobs.py semantics (md5 positions, set union) and re-derive
    lit-bit counts and the fill-rate estimate from first principles."""
    import duckdb

    from hackatonbigdata_spark.streaming.jobs import (
        bloom_estimate,
        bloom_update,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(date_trunc('hour', ts) AS VARCHAR), user_id"
        " FROM read_parquet(?)",
        [f"{SF_DIR}/events.parquet"],
    ).fetchall()
    hours: dict = {}
    for hour, uid in rows:
        hours.setdefault(hour, []).append(int(uid))

    got = QUERIES["stream_hourly_bloom"](spark, SF_DIR).collect()
    assert len(got) == len(hours)
    for row in got:
        key = str(row.hour)
        users = hours[key]
        bits = bloom_update(set(), users)
        assert row.n_total == len(users), key
        assert row.n_bits_set == len(bits), key
        assert row.n_users == len(set(users)), key
        want_est = bloom_estimate(bits)
        if want_est is None:
            assert row.est_users is None, key
        else:
            assert row.est_users == want_est, key
            # estimate quality in the sparse regime: within 25% + 1 of truth
            assert abs(row.est_users - row.n_users) <= 0.25 * row.n_users + 1


N_MINHASH = 8


def test_dedup_lsh_calibration_matches_python(spark):
    """Full banded-MinHash calibration reimplementation in plain Python:
    3-gram shingles, 8 md5-prefix signature minima, 4 bands of 2,
    candidate pairs from band-bucket equality, true Jaccard from the raw
    shingle sets, and the 9-level report — proving the r9 candidates-only
    rework changed the plan, not the answer."""
    import duckdb

    con = duckdb.connect()
    sh: dict = {}
    for doc_id, w in _doc_words(con):
        if len(w) < 3:
            continue
        sh[doc_id] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
    sig = {
        d: [min(_h32(f"{s}|{g}") for g in gs) for s in range(N_MINHASH)]
        for d, gs in sh.items()
    }
    buckets: dict = {}
    for d, ms in sig.items():
        for band in range(N_MINHASH // 2):
            key = (band, f"{ms[2 * band]}|{ms[2 * band + 1]}")
            buckets.setdefault(key, []).append(d)
    cand = {}
    for key, ds in buckets.items():
        ds = sorted(set(ds))
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                n_eq = sum(1 for s in range(N_MINHASH) if sig[a][s] == sig[b][s])
                cand[(a, b)] = _r4(n_eq / float(N_MINHASH))
    levels: dict = {}
    for (a, b), est in cand.items():
        inter = len(sh[a] & sh[b])
        jac = inter * 1.0 / (len(sh[a]) + len(sh[b]) - inter)
        n, ssum, dups = levels.get(est, (0, 0, 0))
        levels[est] = (
            n + 1,
            ssum + math.floor(jac * 10000 + 0.5),
            dups + (jac >= 0.5),
        )

    got = QUERIES["dedup_lsh_calibration"](spark, SF_DIR).collect()
    assert {r.est_jaccard for r in got} == set(levels)
    for row in got:
        n, ssum, dups = levels[row.est_jaccard]
        assert row.n_pairs == n, row.est_jaccard
        assert row.mean_true_jaccard == (
            math.floor(ssum * 1.0 / n + 0.5) / 10000.0
        ), row.est_jaccard
        assert row.n_true_dups == dups, row.est_jaccard
    # the calibration must span estimate levels (planted near-dups exist)
    assert len(got) >= 2


def test_similarity_ivfpq_recall_bounded_by_bucket_ceiling(spark):
    """Structural invariants of the composed index: PQ candidates come
    only from the query's own bucket, so the composed recall can never
    exceed the bucket ceiling; with 8 buckets over random embeddings and
    nprobe=1 both losses must actually show (ceiling < 1, recall <
    ceiling), and every rate lives on the 1e-4 grid."""
    row = QUERIES["similarity_ivfpq_topk"](spark, SF_DIR).collect()[0]
    assert row.n_vectors > 0
    assert 0.0 < row.mean_recall3 <= row.bucket_ceiling3 < 1.0
    assert row.frac_perfect <= row.mean_recall3


def test_similarity_ivfpq_matches_python(spark):
    """Full composed-index reimplementation in plain Python: the hash-
    seeded PQ codebook and codes, the 8-centroid cosine bucket
    assignment with (cosine desc, id) tie-break, exact whole-corpus
    top-3, within-bucket ADC top-3, and the three summary rates."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM read_parquet(?)"
        " ORDER BY vec_id",
        [f"{SF_DIR}/embeddings.parquet"],
    ).fetchall()
    emb = {vid: list(e) for vid, e in rows}
    M, D, K, NC = 8, 8, 16, 8
    seeds = sorted(emb, key=lambda v: (_h32(str(v)), v))[:K]
    cb = {
        (k, s): emb[k][s * D : (s + 1) * D] for k in seeds for s in range(M)
    }

    def l2(a, b):
        return _seq_dot(a, a) - 2 * _seq_dot(a, b) + _seq_dot(b, b)

    rec, qq, rr, nrm = {}, {}, {}, {}
    for vid, e in emb.items():
        out = []
        for s in range(M):
            sub = e[s * D : (s + 1) * D]
            best = min((l2(sub, cb[(k, s)]), k) for k in seeds)
            out.extend(cb[(best[1], s)])
        rec[vid], qq[vid] = out, _seq_dot(e, e)
        rr[vid], nrm[vid] = _seq_dot(out, out), math.sqrt(_seq_dot(e, e))
    bucket = {}
    for vid, e in emb.items():
        best = min(
            (-_r4(_seq_dot(e, emb[c]) / (nrm[vid] * nrm[c])), c)
            for c in range(NC)
        )
        bucket[vid] = best[1]
    ids = sorted(emb)
    hits = ceil_hits = perfect = 0
    for a in ids:
        co = sorted(
            (-_r4(_seq_dot(emb[a], emb[b]) / (nrm[a] * nrm[b])), b)
            for b in ids
            if b != a
        )
        ex3 = [b for _, b in co[:3]]
        mates = [b for b in ids if b != a and bucket[b] == bucket[a]]
        adc = sorted(
            (_r4(qq[a] - 2 * _seq_dot(emb[a], rec[b]) + rr[b]), b)
            for b in mates
        )
        pq3 = {b for _, b in adc[:3]}
        h = sum(1 for b in ex3 if b in pq3)
        hits += h
        ceil_hits += sum(1 for b in ex3 if bucket[b] == bucket[a])
        perfect += h == 3
    n = len(ids)
    got = QUERIES["similarity_ivfpq_topk"](spark, SF_DIR).collect()[0]
    assert got.n_vectors == n
    assert got.mean_recall3 == math.floor(
        hits * 10000.0 / (3 * n) + 0.5
    ) / 10000.0
    assert got.bucket_ceiling3 == math.floor(
        ceil_hits * 10000.0 / (3 * n) + 0.5
    ) / 10000.0
    assert got.frac_perfect == math.floor(
        perfect * 10000.0 / n + 0.5
    ) / 10000.0
