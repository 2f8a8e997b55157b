"""Value-level tests for operators/vocab.py (BPE merge-pair
statistics, OOV coverage). The DuckDB oracles cover cross-engine
parity; these pin the semantics against plain Python and the
invariants a tokenizer trainer relies on (occurrence weighting,
deterministic top-k boundary, broadcast probe shape)."""

from __future__ import annotations

from collections import Counter

from angelone_clickhouse_spark.operators.vocab import (
    MERGE_TOP_K,
    VOCAB_K,
    bpe_merge_pairs,
    vocab_oov_rate,
)
from tests.conftest import SF_CORRECT


def _texts(spark):
    return {
        r.doc_id: r.text
        for r in spark.read.parquet(
            f"{SF_CORRECT}/documents.parquet"
        ).collect()
    }


def _word_freq(texts):
    wf = Counter()
    for t in texts.values():
        wf.update(t.split(" "))
    return wf


def test_bpe_pairs_match_python_reference(spark):
    """Brute-force the word-frequency-weighted adjacent pair counts
    and the (count DESC, pair ASC) top-k."""
    texts = _texts(spark)
    wf = _word_freq(texts)
    pair_occ = Counter()
    pair_words = {}
    for word, freq in wf.items():
        for i in range(len(word) - 1):
            pair = f"{word[i]} {word[i + 1]}"
            pair_occ[pair] += freq
            pair_words.setdefault(pair, set()).add(word)
    expect = sorted(pair_occ.items(), key=lambda kv: (-kv[1], kv[0]))[
        :MERGE_TOP_K
    ]
    rows = bpe_merge_pairs(spark, SF_CORRECT).collect()
    assert len(rows) == min(MERGE_TOP_K, len(pair_occ))
    got = [(r.pair, r.n_occurrences) for r in rows]
    assert got == expect
    for r in rows:
        assert r.n_word_types == len(pair_words[r.pair])
    # occurrence weighting must differ from word-type counting
    # somewhere in the window, or the test degenerates
    assert any(
        r.n_occurrences != r.n_word_types for r in rows
    )


def test_oov_rate_matches_python_reference(spark):
    """Brute-force the truncated vocabulary and every doc's OOV
    count; the fixture must be non-degenerate (both in-vocab and OOV
    token mass present)."""
    texts = _texts(spark)
    wf = _word_freq(texts)
    assert len(wf) > VOCAB_K, "fixture vocab must overflow VOCAB_K"
    vocab = {
        w
        for w, _ in sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :VOCAB_K
        ]
    }
    rows = vocab_oov_rate(spark, SF_CORRECT).collect()
    assert len(rows) == len(texts)
    any_oov = any_in = False
    for r in rows:
        toks = texts[r.doc_id].split(" ")
        n_oov = sum(1 for t in toks if t not in vocab)
        assert (r.n_tokens, r.n_oov) == (len(toks), n_oov)
        assert r.oov_milli == 1000 * n_oov // len(toks)
        any_oov |= n_oov > 0
        any_in |= n_oov < len(toks)
    assert any_oov and any_in


def test_oov_probe_is_broadcast(spark):
    """The vocabulary membership probe must be a broadcast hash join
    (the vocabulary is VOCAB_K rows by construction) — a shuffle here
    would shuffle the whole exploded token stream at scale."""
    plan = (
        vocab_oov_rate(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_coverage_curve_matches_python_reference(spark):
    """Brute-force the rank/cumsum curve; power-of-two sizes plus the
    full-vocabulary terminal point, which must reach coverage 1000."""
    from angelone_clickhouse_spark.operators.vocab import (
        vocab_coverage_curve,
    )

    wf = _word_freq(_texts(spark))
    ordered = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(wf.values())
    cum, expect = 0, {}
    for rn, (_, freq) in enumerate(ordered, start=1):
        cum += freq
        if rn & (rn - 1) == 0 or rn == len(ordered):
            expect[rn] = (cum, 1000 * cum // tot)
    rows = vocab_coverage_curve(spark, SF_CORRECT).collect()
    assert {r.vocab_size for r in rows} == set(expect)
    for r in rows:
        assert (r.cum_tokens, r.coverage_milli) == expect[r.vocab_size]
    # monotone, terminal point covers everything, first point doesn't
    assert expect[max(expect)][1] == 1000
    assert expect[1][1] < 1000


def _bpe_python_reference(wf, k):
    """Plain-Python Sennrich-style trainer: greedy left-to-right merge
    of the (count DESC, a ASC, b ASC) winner, k iterations."""
    state = {w: [c for c in w] for w in wf}
    merges = []
    for _ in range(k):
        occ = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                occ[(syms[i], syms[i + 1])] += wf[w]
        if not occ:
            break
        (a, b), n = sorted(
            occ.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((f"{a} {b}", n))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges, state


def test_bpe_train_matches_python_reference(spark):
    """The relational greedy-merge loop must reproduce the classic
    scan-left implementation exactly: same winning pair and count at
    every iteration (this pins the gaps-and-islands overlap parity
    device against the imperative while-loop semantics)."""
    from angelone_clickhouse_spark.operators.vocab import (
        BPE_MERGES,
        bpe_train,
    )

    wf = _word_freq(_texts(spark))
    expect, _state = _bpe_python_reference(wf, BPE_MERGES)
    rows = sorted(
        bpe_train(spark, SF_CORRECT).collect(), key=lambda r: r.merge_idx
    )
    got = [(r.pair, r.n_occurrences) for r in rows]
    assert got == expect
    # merge-frequency monotonicity: a merge can only create pairs
    # rarer than itself and never raises an existing pair's count
    counts = [n for _, n in got]
    assert counts == sorted(counts, reverse=True)
    # first merge must later re-merge into a longer symbol somewhere
    # in the window, or the iteration depth is degenerate for the
    # fixture (a multi-char symbol appears inside a later pair)
    assert any(
        len(p.replace(" ", "")) > 2 for p, _ in got
    ), "no multi-character merge in the window — raise BPE_MERGES"


def test_bpe_step_adversarial_chains(spark):
    """The gaps-and-islands overlap-parity device against the classic
    scan-left loop, on the words that break naive spellings: repeated
    single-symbol chains (aaaa — overlapping matches), alternations
    (abab — non-overlapping matches sharing no symbol), and
    interleavings (aabaa). Iterated to exhaustion."""
    from angelone_clickhouse_spark.operators.vocab import (
        _bpe_step,
        bpe_init,
    )

    wf = {
        "aaaa": 7, "aaaaa": 5, "aaaaaa": 3, "abab": 6, "ababab": 2,
        "aabb": 4, "abba": 4, "aaab": 3, "baaa": 3, "aabaa": 2,
        "b": 9, "ab": 8,
    }
    expect, _state = _bpe_python_reference(wf, 10)
    wt = bpe_init(
        spark.createDataFrame(list(wf.items()), "word string, freq long")
    ).localCheckpoint(eager=True)
    got = []
    for _ in range(10):
        top1, rebuilt = _bpe_step(wt)
        rows = top1.collect()
        if rows:
            got.append((f"{rows[0].a} {rows[0].b}", rows[0].n_occ))
        wt = rebuilt.localCheckpoint(eager=True)
    assert got == expect
    # sanity: the chain words actually exercised overlap resolution
    # (an 'a a'-style same-symbol merge happened in the window)
    assert any(p.split(" ")[0] == p.split(" ")[1] for p, _ in got)


def test_bpe_encode_matches_python_reference(spark):
    """The consumer half of the tokenizer build: run the classic
    scan-left trainer to the final symbol state, encode every doc
    with it, cap the subword vocabulary, and check every per-doc
    stat bit-for-bit."""
    from angelone_clickhouse_spark.operators.vocab import (
        BPE_MERGES,
        ENCODE_VOCAB_K,
        bpe_encode,
    )

    texts = _texts(spark)
    wf = _word_freq(texts)
    _merges, state = _bpe_python_reference(wf, BPE_MERGES)
    # corpus-wide subword frequencies under the learned encoding
    sym_freq = Counter()
    doc_syms = {}
    for doc_id, t in texts.items():
        syms = []
        for w in t.split(" "):
            if w:
                syms.extend(state[w])
        doc_syms[doc_id] = syms
        sym_freq.update(syms)
    assert len(sym_freq) > ENCODE_VOCAB_K, (
        "fixture subword vocab must overflow ENCODE_VOCAB_K"
    )
    vocab = {
        s
        for s, _ in sorted(
            sym_freq.items(), key=lambda kv: (-kv[1], kv[0])
        )[:ENCODE_VOCAB_K]
    }
    rows = bpe_encode(spark, SF_CORRECT).collect()
    assert len(rows) == len(texts)
    any_oov = any_merged = False
    for r in rows:
        syms = doc_syms[r.doc_id]
        n_oov = sum(1 for s in syms if s not in vocab)
        n_chars = sum(len(s) for s in syms)
        assert (r.n_tokens, r.n_oov, r.n_chars) == (
            len(syms),
            n_oov,
            n_chars,
        )
        assert r.oov_milli == 1000 * n_oov // len(syms)
        assert r.compression_milli == 1000 * len(syms) // n_chars
        # symbols partition the words: encoded chars == raw chars
        assert n_chars == sum(len(w) for w in texts[r.doc_id].split(" "))
        any_oov |= n_oov > 0
        any_merged |= len(syms) < n_chars
    assert any_oov, "no OOV subword in the fixture — raise vocab pressure"
    assert any_merged, "no merge ever applied — encode is degenerate"
