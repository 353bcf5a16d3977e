"""Independent semantic pins for the round-13 changes.

Same contract as test_r7..r12_semantics: the oracle parity suite proves
Spark == DuckDB; these tests guard against both engines computing the
same WRONG thing by re-deriving behavior independently, and pin the
contracts (crash ordering, overflow exactness, executor-side placement)
that no value aggregate can see.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from hackatonbigdata_spark.registry import all_queries

QUERIES = all_queries()

from tests.conftest import SF_DIR  # noqa: E402


def test_viterbi_fold_matches_python_dp(spark):
    """The executor-side Viterbi SQL fold (r13: the unigram encode's
    driver-loop fix) is bit-identical to the pure-Python DP on
    adversarial words: exact-cost ties (the shorter-last-piece order),
    unencodable words (vocabulary gaps), max-length words, and
    single-char words."""
    from hackatonbigdata_spark.operators.llm import (
        _tok_viterbi_best,
        _tok_viterbi_sql,
    )

    # hand-built cost table with deliberate tie structure: 'ab'+'a' and
    # 'a'+'ba' both cost 30 for 'aba' -> the l-asc tie-break decides;
    # 'q' absent -> any word containing q is unencodable
    cost = {
        "a": 10,
        "b": 15,
        "c": 40,
        "ab": 20,
        "ba": 20,
        "abc": 25,
        "abca": 33,
        "bc": 12,
        "cab": 18,
    }
    words = [
        "aba",  # tie: (ab,a) vs (a,ba), both 30
        "abc",  # single piece vs compositions
        "abcabcabca",  # max length (10), many paths
        "a",
        "b",
        "aq",  # unencodable (q not in vocab)
        "q",
        "cccc",
        "abcbcabcba",
        "bcbcbcbcbc",
        "cabcabcabc",
        "aaaaaaaaaa",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string").select(
        "word", F.expr(_tok_viterbi_sql(cost)).alias("dp")
    )
    got = {r["word"]: r["dp"] for r in df.collect()}
    for w in words:
        best = _tok_viterbi_best(w, cost)
        if best is None:
            assert got[w] is None, f"{w}: fold encoded an unencodable word"
        else:
            assert got[w] is not None, f"{w}: fold failed to encode"
            assert got[w]["cost"] == best[0], f"{w}: cost mismatch"
            assert got[w]["k"] == len(best[1]), f"{w}: piece-count mismatch"


def test_unigram_encode_no_fact_scale_collect(spark):
    """The encode pass keeps the distinct-word Viterbi ON THE EXECUTORS:
    the physical plan carries the aggregate() HOF projection (visible as
    a lambda over the word column) and no Python UDF / no
    createDataFrame-from-driver-rows scan of encode results."""
    df = QUERIES["tokenizer_unigram_encode"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fold runs engine-side: no scan over a driver-materialized
    # LocalTableScan holding per-word encode rows (the learner's bounded
    # cost/vocab literals are maps inside expressions, not row scans of
    # (word, cost_q, k) tuples)
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    # the plan renders the fold with exprIds spliced in; match its spine
    assert "aggregate(sequence(1" in plan and "lambdafunction" in plan


def test_s2_decimal_accumulation_survives_long_overflow(spark):
    """The welch/power_mde sufficient-statistic idiom (r13 fix: one
    factor cast to decimal BEFORE the multiply, decimal(38,0) sum) is
    exact past Long.MAX, where a naive long product would wrap or raise:
    v4 = 4e9 makes v4^2 = 1.6e19 > 2^63-1."""
    v4 = 4_000_000_000
    df = spark.createDataFrame([(v4,)] * 3, "v4 long")
    s2 = df.agg(
        F.sum(
            (F.col("v4").cast("decimal(19,0)") * F.col("v4")).cast(
                "decimal(38,0)"
            )
        )
        .cast("double")
        .alias("s2")
    ).collect()[0]["s2"]
    assert s2 == float(3 * v4 * v4)


def test_expire_snapshots_swaps_manifest_before_deleting(spark, tmp_path):
    """Crash-ordering contract (r13 fix): expire_snapshots rewrites the
    manifest BEFORE deleting orphaned files, so a crash mid-delete
    leaves re-vacuumable orphans — never a manifest addressing deleted
    paths.  Simulated by making the first data-path delete raise: the
    manifest must already carry only kept snapshots, every data path
    must still exist, and the leftover orphan must be discoverable as
    (directory listing) − (manifest paths) — the standard
    remove-orphan-files recovery."""
    import pytest as _pytest

    from hackatonbigdata_spark.operators import io_queries as ioq

    # two snapshots sharing file A; snapshot 2 also owns file B; expiring
    # snapshot 1 orphans file C (only snapshot 1 names it)
    base = str(tmp_path / "tbl")
    for name in ("fa", "fb", "fc"):
        spark.range(5).write.parquet(os.path.join(base, name))
    man = str(tmp_path / "manifest")
    rows = [
        (1, os.path.join(base, "fa"), "data"),
        (1, os.path.join(base, "fc"), "data"),
        (2, os.path.join(base, "fa"), "data"),
        (2, os.path.join(base, "fb"), "data"),
    ]
    ioq._write_manifest(man, rows)

    real_rmtree = shutil.rmtree
    calls: list[str] = []

    def failing_rmtree(path, *a, **kw):
        if path.startswith(base):
            calls.append(path)
            raise OSError("simulated crash during vacuum")
        return real_rmtree(path, *a, **kw)

    shutil.rmtree, ioq.shutil.rmtree = failing_rmtree, failing_rmtree
    try:
        with _pytest.raises(OSError, match="simulated crash"):
            ioq.expire_snapshots(spark, man, keep=(2,))
    finally:
        shutil.rmtree = real_rmtree
        ioq.shutil.rmtree = real_rmtree

    # the delete was attempted on exactly the orphan, AFTER the swap:
    assert calls == [os.path.join(base, "fc")]
    # manifest already speaks only for snapshot 2 ...
    live = spark.read.parquet(man).collect()
    assert {r.snapshot_id for r in live} == {2}
    # ... and no data file is gone (the crash left orphans, not holes)
    for name in ("fa", "fb", "fc"):
        assert os.path.isdir(os.path.join(base, name))
    # the swapped manifest no longer names fc, so a re-run is a no-op on
    # it (expire works from the manifest) ...
    stats = ioq.expire_snapshots(spark, man, keep=(2,))
    assert stats == {
        "n_snapshots_expired": 0,
        "n_files_removed": 0,
        "n_files_live": 2,
    }
    # ... and the orphan is exactly (dir listing) − (manifest paths): the
    # remove-orphan-files recovery identifies it without any data scan
    manifest_paths = {r.path for r in spark.read.parquet(man).collect()}
    on_disk = {os.path.join(base, d) for d in os.listdir(base)}
    assert on_disk - manifest_paths == {os.path.join(base, "fc")}
