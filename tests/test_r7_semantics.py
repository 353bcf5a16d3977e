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


def _q4(x: float) -> float:
    """The engine's shared quantization: half away from zero at 1e-4."""
    import math

    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 10000 + 0.5) / 10000


def test_dedup_substring_spans_matches_bruteforce(spark):
    """Recompute the 40-char cross-doc duplicated spans with plain Python
    string slicing and interval merging — no hashing, no SQL — and require
    identical (n_spans, dup_chars) per doc."""
    from collections import defaultdict

    from hackatonbigdata_spark.catalog import Catalog

    docs = Catalog(spark, SF_DIR).documents.select("doc_id", "text").toPandas()
    K = 40
    owners = defaultdict(set)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for p in range(len(text) - K + 1):
            owners[text[p : p + K]].add(doc_id)
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        marks = [
            p
            for p in range(len(text) - K + 1)
            if len(owners[text[p : p + K]]) > 1
        ]
        if not marks:
            continue
        spans = []
        start = end = None
        for p in marks:
            if start is None:
                start, end = p, p + K - 1
            elif p > end + 1:
                spans.append((start, end))
                start, end = p, p + K - 1
            else:
                end = max(end, p + K - 1)
        spans.append((start, end))
        want[doc_id] = (len(spans), sum(e - s + 1 for s, e in spans))

    got = QUERIES["dedup_substring_spans"](spark, SF_DIR).collect()
    assert {r.doc_id for r in got} == set(want)
    for r in got:
        assert (r.n_spans, r.dup_chars) == want[r.doc_id], r.doc_id


def test_text_bm25_topk_matches_bruteforce(spark):
    """Brute-force Okapi BM25 in pure Python over the same normalized
    tokenization, same per-term 1e-4 integer quantization, and require the
    identical top-10 (doc_id, dl, score, rnk)."""
    import math
    import re

    from hackatonbigdata_spark.catalog import Catalog

    docs = Catalog(spark, SF_DIR).documents.select("doc_id", "text").toPandas()
    toks = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
        words = [w for w in norm.split(" ") if w]
        if words:
            toks[doc_id] = words
    n_docs = len(toks)
    avgdl = float(sum(len(w) for w in toks.values())) / n_docs
    terms = ("spark", "window", "merge")
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    scored = []
    for doc_id, words in toks.items():
        dl = len(words)
        s4 = 0
        hit = False
        for t in terms:
            tf = words.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
            s4 += math.floor(s * 10000 + 0.5)
        if hit:
            scored.append((doc_id, dl, s4 / 10000.0))
    scored.sort(key=lambda r: (-r[2], r[0]))
    want = scored[:10]

    got = sorted(
        QUERIES["text_bm25_topk"](spark, SF_DIR).collect(), key=lambda r: r.rnk
    )
    assert len(got) == 10
    for rnk, (r, (doc_id, dl, score)) in enumerate(zip(got, want), start=1):
        assert (r.doc_id, r.dl, r.score, r.rnk) == (doc_id, dl, score, rnk)


def test_dedup_semdedup_ivf_matches_bruteforce(spark):
    """Brute-force SemDeDup in pure Python: sequential-fold cosines (the
    engine's IEEE addition order), 1e-4 quantization, nearest-of-8 bucket
    assignment, and the keep-farthest-from-centroid drop rule.  Every
    (bucket_id, ccos, n_near, is_kept) must match, and two structural
    invariants hold: isolated vectors are always kept, and every bucket
    with at least one near-dup pair keeps at least one member of that
    pair."""
    import math

    from hackatonbigdata_spark.catalog import Catalog

    emb = (
        Catalog(spark, SF_DIR)
        .embeddings.select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    vecs = {
        int(vid): [float(x) for x in v]
        for vid, v in zip(emb["vec_id"], emb["embedding"])
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    nrm = {i: math.sqrt(dot(v, v)) for i, v in vecs.items()}
    cents = [i for i in sorted(vecs) if i < 8]
    assign = {}
    for i, v in vecs.items():
        best = max(
            ((_q4(dot(v, vecs[c]) / (nrm[i] * nrm[c])), -c) for c in cents)
        )
        assign[i] = (-best[1], best[0])  # (bucket_id, ccos)
    buckets = {}
    for i, (b, _) in assign.items():
        buckets.setdefault(b, []).append(i)
    want = {}
    for i, (b, ci) in assign.items():
        near = [
            j
            for j in buckets[b]
            if j != i
            and _q4(dot(vecs[i], vecs[j]) / (nrm[i] * nrm[j])) >= 0.30
        ]
        dropped = any(
            (assign[j][1] < ci) or (assign[j][1] == ci and j < i) for j in near
        )
        want[i] = (b, ci, len(near), 0 if dropped else 1)

    got = QUERIES["dedup_semdedup_ivf"](spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r.bucket_id, r.ccos, r.n_near, r.is_kept) == want[r.vec_id], (
            r.vec_id
        )
    # structural invariants
    for r in got:
        if r.n_near == 0:
            assert r.is_kept == 1
    kept_by_bucket = {}
    for r in got:
        if r.n_near > 0:
            kept_by_bucket.setdefault(r.bucket_id, []).append(r.is_kept)
    for b, flags in kept_by_bucket.items():
        assert any(flags), f"bucket {b} dropped every near-dup member"


def test_corpus_bpe_merges_matches_bruteforce(spark):
    """Pure-Python greedy BPE over the identical (word, count) vocabulary
    (derived independently through DuckDB, not Spark) must reproduce the
    full 10-row merge table: same pairs, same order, same weighted
    counts."""
    import duckdb

    con = duckdb.connect()
    vocab = con.execute(
        """
        WITH w AS (SELECT unnest(string_split(trim(regexp_replace(
                     regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                     ' +', ' ', 'g')), ' ')) AS w
                   FROM read_parquet(?))
        SELECT w, count(*) FROM w WHERE w <> '' GROUP BY w
        """,
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()
    words = {w: (list(w), int(c)) for w, c in vocab}
    want = []
    for rank in range(1, 11):
        counts = {}
        for syms, cnt in words.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        (l, r), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, l, r, l + r, pc))
        for key, (syms, cnt) in words.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            words[key] = (out, cnt)

    got = sorted(
        QUERIES["corpus_bpe_merges"](spark, SF_DIR).collect(),
        key=lambda row: row.rank,
    )
    assert [
        (row.rank, row.left, row.right, row.merged, row.pair_count) for row in got
    ] == want


def test_text_chunk_windows_matches_bruteforce(spark):
    """Rebuild the 64/48 overlap chunking with plain Python list slicing
    and require identical (chunk_idx, start_tok, n_toks) sets per doc,
    plus full coverage: every token index falls inside >= 1 chunk."""
    import re

    from hackatonbigdata_spark.catalog import Catalog

    docs = Catalog(spark, SF_DIR).documents.select("doc_id", "text").toPandas()
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
        words = [w for w in norm.split(" ") if w]
        n = len(words)
        if n < 1:
            continue
        for ci in range((n - 1) // 48 + 1):
            start = ci * 48
            ln = min(64, n - start)
            if ci == 0 or ln > 16:
                want[(doc_id, ci)] = (start, ln)

    got = QUERIES["text_chunk_windows"](spark, SF_DIR).collect()
    assert {(r.doc_id, r.chunk_idx): (r.start_tok, r.n_toks) for r in got} == want
    # coverage: chunks tile every token of every doc
    by_doc = {}
    for (doc_id, _), (start, ln) in want.items():
        by_doc.setdefault(doc_id, []).append((start, start + ln))
    for doc_id, spans in by_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        hi = 0
        for s, e in spans:
            assert s <= hi  # no gap
            hi = max(hi, e)
