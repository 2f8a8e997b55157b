"""Value-level tests for operators/mixing.py (dataset assembly:
tf-idf keywords, shard layout, source mixture). The DuckDB oracle
covers cross-engine parity; these pin the semantics against plain
Python and the invariants a consumer (shard writer / sampler) relies
on."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from angelone_clickhouse_spark.operators.mixing import (
    MIX_CAP_MILLI,
    MIXTURE_SAMPLE_FRAC_MILLI,
    N_SHARDS,
    NOVELTY_N,
    SAMPLE_BUDGET_DOCS,
    TFIDF_TOP_K,
    mixture_sample,
    novelty_ngram_rate,
    shard_plan,
    source_mixture_weights,
    tfidf_top_terms,
)
from tests.conftest import SF_CORRECT


def _load_docs(spark):
    return {
        r.doc_id: r
        for r in spark.read.parquet(
            f"{SF_CORRECT}/documents.parquet"
        ).collect()
    }


def test_tfidf_matches_python_reference(spark):
    """Brute-force tf/df/score and the top-k selection for a handful
    of docs."""
    docs = _load_docs(spark)
    n_docs = len(docs)
    df_counter = Counter()
    for r in docs.values():
        df_counter.update(set(r.text.split(" ")))
    got = (
        tfidf_top_terms(spark, SF_CORRECT)
        .filter(F.col("doc_id") < 5)
        .collect()
    )
    by_doc = {}
    for row in got:
        by_doc.setdefault(row.doc_id, []).append(row)
    for doc_id, rows in by_doc.items():
        toks = docs[doc_id].text.split(" ")
        tf_counter = Counter(toks)
        scored = sorted(
            (
                (
                    round(
                        tf * math.log10(n_docs / df_counter[t]), 6
                    ),
                    t,
                )
                for t, tf in tf_counter.items()
            ),
            key=lambda st: (-st[0], st[1]),
        )
        expect = scored[:TFIDF_TOP_K]
        rows.sort(key=lambda r: r.rnk)
        assert len(rows) == min(TFIDF_TOP_K, len(tf_counter))
        for rank, (row, (score, term)) in enumerate(
            zip(rows, expect), start=1
        ):
            assert row.rnk == rank
            assert row.token == term
            assert row.tf == tf_counter[term]
            assert row.df == df_counter[term]
            assert row.score == score


def test_shard_plan_partitions_the_corpus(spark):
    rows = shard_plan(spark, SF_CORRECT).collect()
    docs = _load_docs(spark)
    assert sorted(r.doc_id for r in rows) == sorted(docs)
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r)
    # every shard populated and within 3x of uniform at n=500
    assert len(by_shard) == N_SHARDS
    for shard, members in by_shard.items():
        assert len(members) < 3 * len(rows) / N_SHARDS
        # positions are contiguous 1..n in hkey order
        members.sort(key=lambda r: r.pos)
        assert [m.pos for m in members] == list(
            range(1, len(members) + 1)
        )
        assert [m.hkey for m in members] == sorted(
            m.hkey for m in members
        )


def test_shard_plan_deterministic(spark):
    a = {r.doc_id: (r.shard, r.pos) for r in shard_plan(spark, SF_CORRECT).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in shard_plan(spark, SF_CORRECT).collect()}
    assert a == b


def test_mixture_weights_match_python_reference(spark):
    docs = _load_docs(spark)
    n_toks = Counter()
    n_docs = Counter()
    for r in docs.values():
        n_toks[r.source] += len(r.text.split(" "))
        n_docs[r.source] += 1
    tot = sum(n_toks.values())
    share = {s: 1000 * c // tot for s, c in n_toks.items()}
    capped = {s: min(v, MIX_CAP_MILLI) for s, v in share.items()}
    tot_capped = sum(capped.values())
    rows = source_mixture_weights(spark, SF_CORRECT).collect()
    assert len(rows) == len(n_toks)
    for r in rows:
        assert r.n_docs == n_docs[r.source]
        assert r.n_tokens == n_toks[r.source]
        assert r.share_milli == share[r.source]
        assert r.capped == (share[r.source] > MIX_CAP_MILLI)
        w = 1_000_000 * capped[r.source] // tot_capped
        assert r.weight_micro == w
        assert r.budget_docs == w * SAMPLE_BUDGET_DOCS // 1_000_000
    # the cap must actually bind on the fixture (non-degenerate test)
    assert any(r.capped for r in rows)
    assert not all(r.capped for r in rows)
    # a sampler can trust the plan: weights sum to <= 1 and within
    # one rounding ulp per source of exactly 1
    total_w = sum(r.weight_micro for r in rows)
    assert 1_000_000 - len(rows) < total_w <= 1_000_000
    assert sum(r.budget_docs for r in rows) <= SAMPLE_BUDGET_DOCS


def test_novelty_matches_python_reference(spark):
    """Brute-force the arrival-order first-seen computation over the
    whole fixture corpus."""
    docs = _load_docs(spark)
    first_seen = {}
    expect = {}
    for doc_id in sorted(docs):
        w = docs[doc_id].text.split(" ")
        grams = (
            {
                " ".join(w[i : i + NOVELTY_N])
                for i in range(len(w) - NOVELTY_N + 1)
            }
            if len(w) >= NOVELTY_N
            else set()
        )
        novel = sum(1 for g in grams if g not in first_seen)
        for g in grams:
            first_seen.setdefault(g, doc_id)
        expect[doc_id] = (
            len(grams),
            novel,
            1000 * novel // len(grams) if grams else None,
        )
    rows = novelty_ngram_rate(spark, SF_CORRECT).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert (r.n_grams, r.n_novel, r.novelty_milli) == expect[r.doc_id]
    # the fixture must exercise both ends non-degenerately: the first
    # doc is all-novel, later docs mostly restate the tiny vocabulary
    assert expect[min(docs)][2] == 1000
    assert any(v[2] is not None and v[2] < 1000 for v in expect.values())


def test_mixture_sample_matches_python_reference(spark):
    """Brute-force the budget arithmetic and the md5-order per-source
    top-k; the two-phase salt pruning must be invisible in the result
    (exact containment property)."""
    import hashlib

    docs = _load_docs(spark)
    weights = {
        r.source: r for r in source_mixture_weights(spark, SF_CORRECT).collect()
    }
    tot_docs = sum(r.n_docs for r in weights.values())
    budget = {
        s: r.weight_micro * tot_docs * MIXTURE_SAMPLE_FRAC_MILLI
        // 1_000_000_000
        for s, r in weights.items()
    }
    by_source = {}
    for d in docs.values():
        hkey = hashlib.md5(f"mix:{d.doc_id}".encode()).hexdigest()
        by_source.setdefault(d.source, []).append((hkey, d.doc_id))
    expect = set()
    for s, items in by_source.items():
        for rank, (_, doc_id) in enumerate(sorted(items), start=1):
            if rank <= budget[s]:
                expect.add((s, doc_id, rank))
    rows = mixture_sample(spark, SF_CORRECT).collect()
    assert {(r.source, r.doc_id, r.sample_rank) for r in rows} == expect
    for r in rows:
        assert r.budget_docs == budget[r.source]
    # non-degeneracy: every source is represented AND truncated (the
    # sample must be a strict per-source subset, or the rank filter
    # is untested)
    got_sources = {r.source for r in rows}
    assert got_sources == set(by_source)
    for s in by_source:
        n_kept = sum(1 for r in rows if r.source == s)
        assert 0 < n_kept < len(by_source[s])


def test_mixture_sample_plan_is_two_phase(spark):
    """Both window passes must partition as designed: stage 1 on
    (source, salt) — the skew-bounding prune — then the authoritative
    per-source rank; budgets ride a broadcast join."""
    plan = (
        mixture_sample(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") >= 2
    assert "salt" in plan
    assert "BroadcastHashJoin" in plan


def test_dsir_matches_python_reference(spark):
    """Brute-force hashed-bigram importance weights in plain Python
    (hashlib md5, exact integer smoothing products, math.log10) and
    compare every doc's rounded score; also pin the selection-signal
    sanity check: target-source docs must average higher than the
    rest (the whole point of importance weighting)."""
    import hashlib

    from angelone_clickhouse_spark.operators.mixing import (
        DSIR_B,
        DSIR_TARGET_SOURCES,
        dsir_weights,
    )

    docs = _load_docs(spark)
    ct, cr = Counter(), Counter()
    doc_feats = {}
    for did, r in docs.items():
        ws = r.text.split(" ")
        feats = [
            int(
                hashlib.md5(f"{ws[i]} {ws[i + 1]}".encode()).hexdigest()[:15],
                16,
            )
            % DSIR_B
            for i in range(len(ws) - 1)
        ]
        doc_feats[did] = feats
        for b in feats:
            cr[b] += 1
            if r.source in DSIR_TARGET_SOURCES:
                ct[b] += 1
    nt, nr = sum(ct.values()), sum(cr.values())
    expected = {}
    for did, feats in doc_feats.items():
        if not feats:
            continue
        s = sum(
            math.log10(
                ((ct[b] + 1) * (nr + DSIR_B))
                / ((cr[b] + 1) * (nt + DSIR_B))
            )
            for b in feats
        )
        expected[did] = round(s / len(feats), 6)
    got = {r.doc_id: r for r in dsir_weights(spark, SF_CORRECT).collect()}
    assert set(got) == set(expected)
    for did, want in expected.items():
        assert abs(got[did].dsir_logratio - want) <= 1e-6, did
        assert got[did].n_feats == len(doc_feats[did])
        assert got[did].selected == (got[did].dsir_logratio >= 0)
    t_scores = [
        got[d].dsir_logratio
        for d in got
        if docs[d].source in DSIR_TARGET_SOURCES
    ]
    o_scores = [
        got[d].dsir_logratio
        for d in got
        if docs[d].source not in DSIR_TARGET_SOURCES
    ]
    assert sum(t_scores) / len(t_scores) > sum(o_scores) / len(o_scores)
