"""Independent semantic pins for the round-8 operators.

Same contract as test_r7_semantics: the oracle parity suite proves
Spark == DuckDB; these tests guard against both engines computing the same
WRONG thing by re-deriving each operator's result independently (pure
Python, with inputs pulled through DuckDB — never through the Spark code
under test).
"""

from __future__ import annotations

from hackatonbigdata_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def _python_bpe(vocab: dict, n_merges: int):
    """Greedy BPE: learn ``n_merges`` merges over a (word -> count)
    vocabulary, returning (merge list, final word -> symbol-array map).
    Identical semantics to the engine: weighted pair counts, argmax with
    (count desc, pair asc) tie-break, one left-to-right merge pass per
    round in which a just-merged token can serve as the left element of
    the next match."""
    words = {w: (list(w), c) for w, c in vocab.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for syms, cnt in words.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        (l, r), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, pc))
        for key, (syms, cnt) in words.items():
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            words[key] = (out, cnt)
    return merges, {w: syms for w, (syms, _) in words.items()}


def test_corpus_bpe_encode_matches_python_learn_then_encode(spark):
    """Learn the 10 merges AND encode every document in pure Python (word
    stream pulled through DuckDB), then require the Spark query to
    reproduce every per-doc (n_words, n_bpe_tokens, pieces_per_word)
    exactly."""
    import math

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        """
        WITH t AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(
                     regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                     ' +', ' ', 'g')), ' ')) AS w
                   FROM read_parquet(?))
        SELECT doc_id, w FROM t WHERE w <> ''
        """,
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()
    vocab: dict = {}
    for _, w in rows:
        vocab[w] = vocab.get(w, 0) + 1
    _, encoded = _python_bpe(vocab, 10)
    want: dict = {}
    for doc_id, w in rows:
        n_words, n_pieces = want.get(doc_id, (0, 0))
        want[doc_id] = (n_words + 1, n_pieces + len(encoded[w]))
    got = QUERIES["corpus_bpe_encode"](spark, SF_DIR).collect()
    assert len(got) == len(want)
    for row in got:
        n_words, n_pieces = want[row.doc_id]
        assert row.n_words == n_words, row.doc_id
        assert row.n_bpe_tokens == n_pieces, row.doc_id
        assert row.pieces_per_word == (
            math.floor(n_pieces * 10000.0 / n_words + 0.5) / 10000.0
        ), row.doc_id


def test_dedup_chunk_hashes_matches_bruteforce_chunking(spark):
    """Re-chunk every document with a plain Python loop (64-token windows
    on a 48 stride, tail windows dropped unless they add tokens), hash
    chunk text with the same md5-prefix construction, and rebuild the
    per-doc dup/partner report from first principles."""
    import hashlib

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT doc_id, string_split(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g')), ' ') AS w
        FROM read_parquet(?)
        """,
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()
    L, S = 64, 48
    inst = []  # (doc_id, chunk_hash)
    for doc_id, w in rows:
        w = [x for x in w if x != ""]
        if not w:
            continue
        for ci in range((len(w) - 1) // S + 1):
            toks = w[ci * S : ci * S + L]
            if ci > 0 and len(toks) <= L - S:
                continue
            h = int(hashlib.md5(" ".join(toks).encode()).hexdigest()[:8], 16)
            inst.append((doc_id, h))
    freq: dict = {}
    for _, h in inst:
        freq[h] = freq.get(h, 0) + 1
    bydoc: dict = {}
    for doc_id, h in inst:
        bydoc.setdefault(doc_id, []).append(h)
    docs_by_hash: dict = {}
    for doc_id, h in inst:
        docs_by_hash.setdefault(h, set()).add(doc_id)
    import math

    got = QUERIES["dedup_chunk_hashes"](spark, SF_DIR).collect()
    assert len(got) == len(bydoc)
    n_docs_with_dups = 0
    for row in got:
        hashes = bydoc[row.doc_id]
        n_dup = sum(1 for h in hashes if freq[h] >= 2)
        partners = set().union(*(docs_by_hash[h] for h in hashes)) - {
            row.doc_id
        }
        assert row.n_chunks == len(hashes), row.doc_id
        assert row.n_dup_chunks == n_dup, row.doc_id
        assert row.n_partner_docs == len(partners), row.doc_id
        assert row.dup_chunk_frac == (
            math.floor(n_dup * 10000.0 / len(hashes) + 0.5) / 10000.0
        ), row.doc_id
        n_docs_with_dups += n_dup > 0
    # the scenario must actually exercise duplication (planted dups exist)
    assert n_docs_with_dups > 0


def _seq_dot(a, b):
    """Sequential left-to-right fold — the exact IEEE addition order both
    engines use (llm._dot / DuckDB list_dot_product)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _r4(x):
    import math

    return math.copysign(math.floor(abs(x) * 10000.0 + 0.5) / 10000.0, x)


def _load_embeddings():
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM read_parquet(?)"
        " ORDER BY vec_id",
        [f"{SF_DIR}/embeddings.parquet"],
    ).fetchall()
    return {vid: list(emb) for vid, emb in rows}


def test_similarity_matryoshka_eval_matches_bruteforce(spark):
    """Recompute the whole truncation ablation in pure Python with the
    same sequential-fold dot products, 4dp quantization, and id
    tie-breaks, and require identical aggregate rows."""
    import math

    embs = _load_embeddings()
    ids = sorted(embs)
    dims = [8, 16, 32, 64]
    norms = {
        d: {i: math.sqrt(_seq_dot(embs[i][:d], embs[i][:d])) for i in ids}
        for d in dims
    }
    ranks = {}
    for d in dims:
        per = {}
        for i in ids:
            cos = [
                (
                    -_r4(
                        _seq_dot(embs[i][:d], embs[j][:d])
                        / (norms[d][i] * norms[d][j])
                    ),
                    j,
                )
                for j in ids
                if j != i
            ]
            cos.sort()
            per[i] = {j: r + 1 for r, (_, j) in enumerate(cos)}
        ranks[d] = per
    want = {}
    for d in (8, 16, 32):
        hits = {
            i: sum(
                1
                for j in ids
                if j != i and ranks[d][i][j] <= 5 and ranks[64][i][j] <= 5
            )
            for i in ids
        }
        n = len(ids)
        want[d] = (
            n,
            math.floor(sum(hits.values()) * 10000.0 / (5 * n) + 0.5) / 10000.0,
            math.floor(
                sum(1 for h in hits.values() if h == 5) * 10000.0 / n + 0.5
            )
            / 10000.0,
        )
    got = QUERIES["similarity_matryoshka_eval"](spark, SF_DIR).collect()
    assert len(got) == 3
    for row in got:
        n, mr, fp = want[row.trunc_dim]
        assert (row.n_vectors, row.mean_recall5, row.frac_perfect) == (n, mr, fp)


def test_similarity_hamming_binary_matches_bruteforce(spark):
    """Pure-Python sign-bit Hamming + cosine rankings must reproduce the
    aggregate row exactly (Hamming distances are pure integers)."""
    import math

    embs = _load_embeddings()
    ids = sorted(embs)
    norms = {i: math.sqrt(_seq_dot(embs[i], embs[i])) for i in ids}
    bits = {i: [x > 0 for x in embs[i]] for i in ids}
    hits = {}
    ham5 = {}
    for i in ids:
        hams = sorted(
            (sum(a != b for a, b in zip(bits[i], bits[j])), j)
            for j in ids
            if j != i
        )
        rh = {j: r + 1 for r, (_, j) in enumerate(hams)}
        cos = sorted(
            (-_r4(_seq_dot(embs[i], embs[j]) / (norms[i] * norms[j])), j)
            for j in ids
            if j != i
        )
        rc = {j: r + 1 for r, (_, j) in enumerate(cos)}
        hits[i] = sum(1 for j in rh if rh[j] <= 5 and rc[j] <= 5)
        ham5[i] = sum(h for h, j in hams[:5])
    n = len(ids)
    row = QUERIES["similarity_hamming_binary"](spark, SF_DIR).collect()[0]
    assert row.n_vectors == n
    assert row.mean_recall5 == math.floor(
        sum(hits.values()) * 10000.0 / (5 * n) + 0.5
    ) / 10000.0
    assert row.frac_perfect == math.floor(
        sum(1 for h in hits.values() if h == 5) * 10000.0 / n + 0.5
    ) / 10000.0
    assert row.mean_hamming_top5 == math.floor(
        sum(ham5.values()) * 10000.0 / (5 * n) + 0.5
    ) / 10000.0


def test_corpus_dsir_weights_matches_bruteforce(spark):
    """Re-derive the hashed-bigram importance weights in pure Python
    (DuckDB-independent tokenization and hashing) and require identical
    per-doc integer-grid scores."""
    import hashlib
    import math
    import re

    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, source, text FROM read_parquet(?)",
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()
    B = 1024
    target = {"src0", "src1", "src2", "src3"}
    inst = []  # (doc_id, is_t, bucket)
    for doc_id, source, text in docs:
        words = re.sub(
            " +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())
        ).strip().split(" ")
        is_t = 1 if source in target else 0
        for a, b in zip(words, words[1:]):
            h = int(
                hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16
            ) % B
            inst.append((doc_id, is_t, h))
    ct = {}
    cs = {}
    for _, is_t, h in inst:
        if is_t:
            ct[h] = ct.get(h, 0) + 1
        else:
            cs[h] = cs.get(h, 0) + 1
    nt = sum(ct.values())
    ns = sum(cs.values())
    qterm = {}
    for h in set(ct) | set(cs):
        pt = (ct.get(h, 0) + 1) * 1.0 / (nt + B)
        ps = (cs.get(h, 0) + 1) * 1.0 / (ns + B)
        qterm[h] = math.floor(math.log(pt / ps) * 10000 + 0.5)
    lw = {}
    nf = {}
    for doc_id, _, h in inst:
        lw[doc_id] = lw.get(doc_id, 0) + qterm[h]
        nf[doc_id] = nf.get(doc_id, 0) + 1
    got = QUERIES["corpus_dsir_weights"](spark, SF_DIR).collect()
    assert len(got) == len(lw)
    for row in got:
        assert row.n_feats == nf[row.doc_id], row.doc_id
        assert row.log_weight == lw[row.doc_id] / 10000.0, row.doc_id
        assert row.keep == (lw[row.doc_id] > 0), row.doc_id


def test_quality_classifier_gd_matches_python_gd(spark):
    """Re-run the whole 12-step integer-GD trajectory in pure Python
    (DuckDB-independent tokenization, IEEE doubles, the same quantized
    gradient accumulation) and require the identical nano-unit params and
    decile table."""
    import math
    import re

    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM read_parquet(?)",
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()
    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    feats = {}  # doc_id -> (x1, x2, x3, x4, y)
    for doc_id, text in docs:
        words = [
            w
            for w in re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower()))
            .strip()
            .split(" ")
            if w != ""
        ]
        n = len(words)
        mwl4 = math.floor(sum(len(w) for w in words) * 10000.0 / n + 0.5)
        af4 = math.floor(
            sum(1 for w in words if re.search("[a-z]", w)) * 10000.0 / n + 0.5
        )
        n_stop = sum(1 for w in words if w in stop)
        n_dist = len(set(words))
        n_sym = text.count("#") + text.count("...")
        y = (
            1.0
            if (
                50 <= n <= 100000
                and 30000 <= mwl4 <= 100000
                and af4 >= 8000
                and n_stop >= 2
                and math.floor(n_sym * 10000.0 / n + 0.5) <= 1000
            )
            else 0.0
        )
        feats[doc_id] = (
            min(n, 200) / 200.0,
            mwl4 / 100000.0,
            min(n_stop, 10) / 10.0,
            math.floor(n_dist * 10000.0 / n + 0.5) / 10000.0,
            y,
        )
    cal = [v for d, v in feats.items() if d % 2 == 0]
    params = [0, 0, 0, 0, 0]

    def zval(x1, x2, x3, x4):
        return (
            (params[0] / 1e9) * x1
            + (params[1] / 1e9) * x2
            + (params[2] / 1e9) * x3
            + (params[3] / 1e9) * x4
            + (params[4] / 1e9)
        )

    for _ in range(12):
        sums = [0, 0, 0, 0, 0]
        for x1, x2, x3, x4, y in cal:
            z = zval(x1, x2, x3, x4)
            az1 = 1 + abs(z)
            gc = (0.5 + 0.5 * (z / az1) - y) * (0.5 / (az1 * az1))
            for j, x in enumerate((x1, x2, x3, x4)):
                sums[j] += math.floor(gc * x * 1000000000 + 0.5)
            sums[4] += math.floor(gc * 1000000000 + 0.5)
        for j in range(5):
            params[j] -= int(math.floor(4.0 * sums[j] / len(cal) + 0.5))
    table = {}  # decile -> [n, sum_y, sum_p8, n_pred]
    for x1, x2, x3, x4, y in feats.values():
        z = zval(x1, x2, x3, x4)
        p8 = math.floor((0.5 + 0.5 * (z / (1 + abs(z)))) * 100000000 + 0.5)
        d = min(9, p8 // 10000000)
        row = table.setdefault(d, [0, 0.0, 0, 0])
        row[0] += 1
        row[1] += y
        row[2] += p8
        row[3] += 1 if p8 >= 50000000 else 0
    got = QUERIES["quality_classifier_gd"](spark, SF_DIR).collect()
    assert len(got) == len(table)
    for r in got:
        assert [r.w1_nano, r.w2_nano, r.w3_nano, r.w4_nano, r.b_nano] == params
        n, sy, sp8, npred = table[r.decile]
        assert r.n_docs == n and r.n_pred_keep == npred, r.decile
        assert r.rule_keep_rate == math.floor(sy / n * 10000 + 0.5) / 10000.0
        assert r.mean_p == math.floor(
            sp8 / (n * 100000000.0) * 10000 + 0.5
        ) / 10000.0


def test_dedup_bloom_gate_matches_python_filter(spark):
    """Re-build the m-bit Bloom filter and all probe verdicts in pure
    Python (hashlib digests, no DuckDB) and require identical per-doc
    rows — plus the one-sided contract: every stored digest re-flags
    (zero false negatives, exercised by the full-feed replay) while
    false positives exist and match exactly."""
    import hashlib
    import re

    import duckdb

    M, K = 1024, 4
    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM read_parquet(?)",
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()

    def digest(text):
        norm = re.sub(
            " +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())
        ).strip()
        return hashlib.md5(norm.encode()).hexdigest()

    dg = {d: digest(t) for d, t in docs}
    stored = {v for d, v in dg.items() if d % 2 == 0}

    def pos(j, g):
        return int(hashlib.md5(f"{j}:{g}".encode()).hexdigest()[:8], 16) % M

    bits = {pos(j, g) for g in stored for j in range(K)}
    want = {}
    for d, g in dg.items():
        n_hits = sum(1 for j in range(K) if pos(j, g) in bits)
        bloom = 1 if n_hits == K else 0
        true = 1 if g in stored else 0
        want[d] = (n_hits, bloom, true, 1 if bloom and not true else 0)
    got = QUERIES["dedup_bloom_gate"](spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert (
            r.n_hits,
            r.bloom_dup,
            r.true_dup,
            r.false_positive,
        ) == want[r.doc_id], r.doc_id
    n_true = sum(1 for v in want.values() if v[2])
    assert n_true >= len(docs) // 2  # every stored doc replays as a dup
    assert all(v[1] == 1 for v in want.values() if v[2])  # no false negatives
    assert any(v[3] for v in want.values())  # collisions actually occur


def test_corpus_budget_selection_matches_greedy(spark):
    """The histogram-decomposed selection must equal the straightforward
    greedy fill: sort by (score desc, doc_id asc), keep while the
    cumulative token count stays within the half-corpus budget — the
    definition the two-level grid form exists to scale."""
    import math
    import re

    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM read_parquet(?)",
        [f"{SF_DIR}/documents.parquet"],
    ).fetchall()
    rows = []
    for doc_id, text in docs:
        w = re.sub(
            " +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())
        ).strip().split(" ")
        nc = len(text)
        score4 = math.floor(
            (min(len(w) / 100.0, 1.0) * 0.6 + min(nc / 500.0, 1.0) * 0.4)
            * 10000
            + 0.5
        )
        rows.append((doc_id, score4, len(w)))
    budget = sum(n for _, _, n in rows) // 2
    keep = {}
    cum = 0
    for doc_id, score4, n in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += n
        keep[doc_id] = 1 if cum <= budget else 0
    got = QUERIES["corpus_budget_selection"](spark, SF_DIR).collect()
    assert len(got) == len(rows)
    kept_toks = 0
    for r in got:
        assert r.keep == keep[r.doc_id], r.doc_id
        assert r.token_budget == budget
        kept_toks += r.n_toks if r.keep else 0
    assert 0 < kept_toks <= budget
    assert 0 < sum(keep.values()) < len(rows)  # the budget actually bites


def test_corpus_ccnet_buckets_terciles(spark):
    """Per-source ntile(3) invariants, independent of the oracle: tercile
    sizes differ by at most one within a source, keep == (bucket !=
    'tail'), and the r4-rounded lm_score bands are ordered head <=
    middle <= tail (rounding is monotone over the sort key)."""
    rows = QUERIES["corpus_ccnet_buckets"](spark, SF_DIR).collect()
    assert rows
    by_src: dict = {}
    for r in rows:
        assert r.keep == (1 if r.bucket != "tail" else 0), r.doc_id
        by_src.setdefault(r.source, {}).setdefault(r.bucket, []).append(
            r.lm_score
        )
    for src, buckets in by_src.items():
        sizes = [len(buckets.get(b, [])) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)
        if buckets.get("head") and buckets.get("middle"):
            assert max(buckets["head"]) <= min(buckets["middle"]), src
        if buckets.get("middle") and buckets.get("tail"):
            assert max(buckets["middle"]) <= min(buckets["tail"]), src


def test_corpus_cross_source_overlap_matches_python(spark):
    """Full matrix re-derived in pure Python from DuckDB-extracted word
    arrays: per-source distinct shingle sets, every unordered pair's
    shared count, containment, and Jaccard."""
    import itertools
    import math

    import duckdb

    from hackatonbigdata_spark.operators.llm import _DUCK_WORDS

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.sql(f"SELECT source, {_DUCK_WORDS} FROM documents").fetchall()
    per_src: dict = {}
    for src, w in rows:
        per_src.setdefault(src, set()).update(
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        )
    q4 = lambda x: math.floor(x * 10000 + 0.5) / 10000.0  # noqa: E731
    expect = {}
    for a, b in itertools.combinations(sorted(per_src), 2):
        shared = len(per_src[a] & per_src[b])
        if shared:
            na, nb = len(per_src[a]), len(per_src[b])
            expect[(a, b)] = (
                shared,
                q4(shared / min(na, nb)),
                q4(shared / (na + nb - shared)),
            )
    got = QUERIES["corpus_cross_source_overlap"](spark, SF_DIR).collect()
    assert len(got) == len(expect) > 0
    for r in got:
        s, c, j = expect[(r.source_a, r.source_b)]
        assert r.n_shared == s, (r.source_a, r.source_b)
        assert abs(r.containment - c) < 1e-9
        assert abs(r.jaccard - j) < 1e-9


def test_text_winnowing_stats_matches_python(spark):
    """Textbook robust winnowing (w=4 over word-3-gram hashes, rightmost
    minimum per window) re-implemented in pure Python over
    DuckDB-extracted word arrays, compared per document."""
    import hashlib
    import math

    import duckdb

    from hackatonbigdata_spark.operators.llm import _DUCK_WORDS

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.sql(f"SELECT doc_id, {_DUCK_WORDS} FROM documents").fetchall()
    expect = {}
    for doc_id, w in rows:
        hs = [
            int(hashlib.md5(" ".join(w[i : i + 3]).encode()).hexdigest()[:8], 16)
            for i in range(len(w) - 2)
        ]
        n = len(hs)
        if n < 4:
            continue
        sel = set()
        for j in range(n - 3):
            win = hs[j : j + 4]
            m = min(win)
            # rightmost index attaining the min (robust winnowing)
            sel.add(j + max(i for i, h in enumerate(win) if h == m))
        expect[doc_id] = (n, n - 3, len(sel), math.floor(len(sel) / (n - 3) * 10000 + 0.5) / 10000.0)
    got = QUERIES["text_winnowing_stats"](spark, SF_DIR).collect()
    assert len(got) == len(expect) > 0
    for r in got:
        n, nw, ns, d = expect[r.doc_id]
        assert (r.n_kgrams, r.n_windows, r.n_selected) == (n, nw, ns), r.doc_id
        assert abs(r.density - d) < 1e-9, r.doc_id


def test_corpus_novelty_curve_matches_python(spark):
    """First-occurrence novelty re-derived in pure Python: walk documents
    in doc_id order accumulating the seen-shingle set."""
    import math

    import duckdb

    from hackatonbigdata_spark.operators.llm import _DUCK_WORDS

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.sql(
        f"SELECT doc_id, {_DUCK_WORDS} FROM documents ORDER BY doc_id"
    ).fetchall()
    seen: set = set()
    expect = {}
    for doc_id, w in rows:
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if not sh:
            continue
        novel = len(sh - seen)
        seen |= sh
        expect[doc_id] = (
            len(sh),
            novel,
            math.floor(novel / len(sh) * 10000 + 0.5) / 10000.0,
        )
    got = QUERIES["corpus_novelty_curve"](spark, SF_DIR).collect()
    assert len(got) == len(expect) > 0
    n_zero = 0
    for r in got:
        n, nv, rate = expect[r.doc_id]
        assert (r.n_shingles, r.n_novel) == (n, nv), r.doc_id
        assert abs(r.novelty_rate - rate) < 1e-9, r.doc_id
        n_zero += rate < 1.0
    assert n_zero > 0  # the corpus actually repeats shingles


def test_corpus_vocab_coverage_matches_python(spark):
    """Greedy top-K coverage re-derived in pure Python: sort the word
    frequency table by (count desc, word), walk the prefix until each
    target token mass is reached."""
    import math

    import duckdb

    from hackatonbigdata_spark.operators.llm import _DUCK_WORDS

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.sql(f"SELECT {_DUCK_WORDS} FROM documents").fetchall()
    freq: dict = {}
    for (w,) in rows:
        for word in w:
            if word:
                freq[word] = freq.get(word, 0) + 1
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    expect = {}
    for pct in (90, 95, 99):
        required = -(-pct * total // 100)  # ceil
        cum = k = 0
        for _, c in ordered:
            if cum >= required:
                break
            cum += c
            k += 1
        expect[pct] = (
            total,
            k,
            cum,
            math.floor(cum / total * 10000 + 0.5) / 10000.0,
        )
    got = QUERIES["corpus_vocab_coverage"](spark, SF_DIR).collect()
    assert len(got) == 3
    for r in got:
        n, k, cov, ratio = expect[r.target_pct]
        assert (r.n_tokens, r.vocab_size, r.covered_tokens) == (n, k, cov), (
            r.target_pct
        )
        assert abs(r.coverage - ratio) < 1e-9
