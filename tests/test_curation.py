"""Value-level tests for operators/curation.py (the per-document
curation pass: repetition gates, dataset splits, vocab stats, PII).

The DuckDB oracle covers cross-engine parity; these tests pin the
semantics the oracle can't see — gate non-degeneracy, split
determinism and rates, and redaction completeness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from angelone_clickhouse_spark.operators.curation import (
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    TRAIN_PCT,
    VAL_PCT,
    corpus_top_tokens,
    dataset_split,
    doc_repetition,
    pii_redact,
)
from tests.conftest import SF_CORRECT


def test_repetition_scores_bounded_and_gate_nondegenerate(spark):
    rows = doc_repetition(spark, SF_CORRECT).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r.dup2_milli <= 1000
        assert 0 <= r.dup3_milli <= 1000
        # most-frequent token occurs at least once per distinct token
        assert 1 <= r.top_tok_milli <= 1000
    kept = sum(1 for r in rows if r.keep)
    # the gate must actually split the corpus, not rubber-stamp it
    assert 0.1 < kept / len(rows) < 0.9


def test_repetition_matches_python_reference(spark):
    """Brute-force the scores for a handful of docs in plain Python."""
    sample = (
        doc_repetition(spark, SF_CORRECT)
        .filter(F.col("doc_id") < 5)
        .collect()
    )
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .filter(F.col("doc_id") < 5)
        .collect()
    }
    for r in sample:
        w = docs[r.doc_id].split(" ")
        g2 = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        assert r.dup2_milli == 1000 * (len(g2) - len(set(g2))) // len(g2)
        top = max(w.count(x) for x in set(w))
        assert r.top_tok_milli == 1000 * top // len(w)


def test_dataset_split_deterministic_and_rates(spark):
    a = {r.doc_id: r.split for r in dataset_split(spark, SF_CORRECT).collect()}
    b = {r.doc_id: r.split for r in dataset_split(spark, SF_CORRECT).collect()}
    assert a == b  # no RNG anywhere
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    val = sum(1 for s in a.values() if s == "val")
    # md5 buckets are uniform-ish; allow +/-5pp at n=500
    assert abs(train / n - TRAIN_PCT / 100) < 0.05
    assert abs(val / n - VAL_PCT / 100) < 0.05


def test_top_tokens_ordered_and_consistent(spark):
    rows = corpus_top_tokens(spark, SF_CORRECT).collect()
    assert len(rows) == 20
    occ = [r.n_occurrences for r in rows]
    assert occ == sorted(occ, reverse=True)
    for r in rows:
        assert 1 <= r.n_docs <= r.n_occurrences


def test_pii_redaction_complete(spark):
    red = pii_redact(spark, SF_CORRECT)
    # after redaction, no pattern may match anywhere
    leftover = red.filter(
        (F.regexp_count("redacted", F.lit(EMAIL_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(PHONE_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(IP_RE)) > 0)
    ).count()
    assert leftover == 0
    # planted counts follow the doc_id rules exactly
    bad = red.filter(
        (F.col("n_emails") != (F.col("doc_id") % 3 == 0).cast("int"))
        | (F.col("n_phones") != (F.col("doc_id") % 2 == 0).cast("int"))
        | (F.col("n_ips") != 1)
    ).count()
    assert bad == 0
    # and the replacement tokens are present where planted
    marked = red.filter(
        (F.col("doc_id") % 3 == 0)
        & ~F.col("redacted").contains("<EMAIL>")
    ).count()
    assert marked == 0


def test_unigram_logprob_semantics(spark):
    """Rare-token documents must score LOWER than common-token
    documents, and every per-doc value must match a Python
    recomputation of the unigram model on a planted corpus."""
    import math

    from angelone_clickhouse_spark.operators.curation import (
        doc_unigram_logprob,
    )

    rows = {r.doc_id: r for r in doc_unigram_logprob(spark, SF_CORRECT).collect()}
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    from collections import Counter

    freq = Counter(t for ts in docs.values() for t in ts)
    n_total = sum(freq.values())
    assert set(rows) == set(docs)
    for doc_id, toks in docs.items():
        want = round(
            sum(math.log10(freq[t] / n_total) for t in toks) / len(toks), 6
        )
        got = rows[doc_id].avg_logprob
        assert abs(got - want) <= 1e-6, (doc_id, got, want)
        assert rows[doc_id].n_tokens == len(toks)


def test_hll_union_estimate_accuracy(spark):
    """Tighter-than-oracle gate for distinct_users_hll: every verdict
    TRUE and the union row present exactly once."""
    from angelone_clickhouse_spark.functions.scalar import distinct_users_hll

    rows = distinct_users_hll(spark, SF_CORRECT).collect()
    assert sum(1 for r in rows if r.event_type == "<union>") == 1
    assert all(r.est_within_eps for r in rows)
    assert all(r.exact_users > 0 for r in rows)


def test_doc_length_histogram_matches_python_reference(spark, sf_dir):
    from collections import Counter

    from angelone_clickhouse_spark.operators.curation import (
        LEN_BUCKET_W,
        doc_length_histogram,
    )

    lens = [
        len(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    n_docs = Counter(n // LEN_BUCKET_W for n in lens)
    n_toks = Counter()
    for n in lens:
        n_toks[n // LEN_BUCKET_W] += n
    tot_docs, tot_toks = len(lens), sum(lens)
    rows = doc_length_histogram(spark, sf_dir).collect()
    assert {r.bucket for r in rows} == set(n_docs)
    assert len(rows) > 1  # the fixture spans several bins
    for r in rows:
        assert r.lo_tokens == r.bucket * LEN_BUCKET_W
        assert r.n_docs == n_docs[r.bucket]
        assert r.n_tokens == n_toks[r.bucket]
        assert r.docs_share_milli == 1000 * n_docs[r.bucket] // tot_docs
        assert (
            r.tokens_share_milli == 1000 * n_toks[r.bucket] // tot_toks
        )
    assert sum(r.n_docs for r in rows) == tot_docs


def test_pack_sequences_two_level_equals_naive_global_window(spark, sf_dir):
    """The two-level prefix sum (bucket totals + within-bucket window)
    must equal the naive single-partition global cumulative sum it
    exists to avoid, and the packing invariants must hold: offsets
    strictly increase in doc_id order, consecutive offsets differ by
    exactly the previous doc's token count, and crosses_boundary is
    true iff the doc's token span covers more than one PACK_BUDGET
    window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from angelone_clickhouse_spark.operators.curation import (
        PACK_BUDGET,
        pack_sequences,
    )
    from angelone_clickhouse_spark.sources.tables import load_table

    got = {r.doc_id: r for r in pack_sequences(spark, sf_dir).collect()}

    docs = load_table(spark, sf_dir, "documents")
    naive = docs.select(
        "doc_id",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("n"),
    ).select(
        "doc_id",
        "n",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("offset"),
    )
    for r in naive.collect():
        g = got[r.doc_id]
        assert g.offset == r.offset and g.n_tokens == r.n
        assert g.seq_id == r.offset // PACK_BUDGET
        assert g.pos_in_seq == r.offset % PACK_BUDGET
        assert g.crosses_boundary == (
            (r.offset + r.n - 1) // PACK_BUDGET > r.offset // PACK_BUDGET
        )
    # the stream is gapless: offsets sorted by doc_id tile exactly
    ordered = sorted(got.values(), key=lambda g: g.doc_id)
    for a, b in zip(ordered, ordered[1:]):
        assert b.offset == a.offset + a.n_tokens
    assert ordered[0].offset == 0


def test_pack_from_docs_adversarial_shapes(spark):
    """The two-level prefix sum under the shapes the fixture can't
    produce: sparse doc_ids (empty prefix-sum buckets between
    populated ones), a doc exactly filling a sequence, a doc spanning
    3+ sequences, and single-token docs at bucket boundaries. Oracle:
    plain Python cumsum over the doc_id-sorted list."""
    import random

    from angelone_clickhouse_spark.operators.curation import (
        PACK_BUDGET,
        PACK_BUCKET,
        pack_from_docs,
    )

    rng = random.Random(1518)
    ids = sorted(
        rng.sample(range(0, PACK_BUCKET * 40), 60)
        + [PACK_BUCKET * 50, PACK_BUCKET * 50 + 1]  # far empty gap
    )
    n_tok = {}
    for i, d in enumerate(ids):
        if i == 3:
            n_tok[d] = PACK_BUDGET  # exactly one full sequence
        elif i == 5:
            n_tok[d] = 3 * PACK_BUDGET + 7  # spans 4 sequences
        elif d % PACK_BUCKET in (0, PACK_BUCKET - 1):
            n_tok[d] = 1  # single token at a bucket edge
        else:
            n_tok[d] = rng.randint(1, 900)
    docs = spark.createDataFrame(
        [(d, " ".join(["w"] * n_tok[d])) for d in ids],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pack_from_docs(docs).collect()}
    off = 0
    for d in ids:
        g = got[d]
        assert g.n_tokens == n_tok[d], d
        assert g.offset == off, (d, g.offset, off)
        assert g.seq_id == off // PACK_BUDGET
        assert g.pos_in_seq == off % PACK_BUDGET
        assert g.crosses_boundary == (
            (off + n_tok[d] - 1) // PACK_BUDGET > off // PACK_BUDGET
        ), d
        off += n_tok[d]
    assert len(got) == len(ids)


def test_pack_from_docs_invariant_to_bucket_width(spark):
    """The bucket width is a pure execution knob: any width must
    yield bit-identical packing (the 100 TB sizing note in
    pack_sequences' docstring only works if this holds)."""
    from angelone_clickhouse_spark.operators.curation import pack_from_docs

    docs = spark.createDataFrame(
        [(d, " ".join(["w"] * (7 * d % 97 + 1))) for d in range(0, 900, 7)],
        "doc_id long, text string",
    )
    ref = sorted(map(tuple, pack_from_docs(docs, 1).collect()))
    for width in (13, 100, 10_000):
        got = sorted(map(tuple, pack_from_docs(docs, width).collect()))
        assert got == ref, width


def _writer_corpus(spark):
    """Synthetic corpus with globally-unique tokens (reconstruction
    errors can't cancel), sparse ids, a multi-sequence doc, and an
    exact-fill doc."""
    from angelone_clickhouse_spark.operators.curation import PACK_BUDGET

    sizes = {}
    ids = [0, 3, 7, 50, 51, 199, 205, 900, 9001]
    for i, d in enumerate(ids):
        if i == 2:
            sizes[d] = PACK_BUDGET            # exact fill
        elif i == 4:
            sizes[d] = 3 * PACK_BUDGET + 5    # spans 4+ sequences
        else:
            sizes[d] = (d * 37) % 700 + 1
    rows = [
        (d, " ".join(f"d{d}t{i}" for i in range(sizes[d]))) for d in ids
    ]
    return (
        spark.createDataFrame(rows, "doc_id long, text string"),
        ids,
        sizes,
    )


def test_pack_write_reconstructs_global_stream(spark):
    """Concatenating packed_text over seq_id order must be bit-equal
    to concatenating the documents in doc_id order — sequences tile
    the global token stream gaplessly, straddling docs included."""
    from angelone_clickhouse_spark.operators.curation import (
        PACK_BUDGET,
        pack_write_from_docs,
    )

    docs, ids, sizes = _writer_corpus(spark)
    out = sorted(
        pack_write_from_docs(docs).collect(), key=lambda r: r.seq_id
    )
    total = sum(sizes.values())
    # contiguous seq ids, exact budget everywhere but the tail
    assert [r.seq_id for r in out] == list(range(len(out)))
    assert len(out) == (total + PACK_BUDGET - 1) // PACK_BUDGET
    for r in out[:-1]:
        assert r.n_seq_tokens == PACK_BUDGET, r.seq_id
    assert out[-1].n_seq_tokens == total - PACK_BUDGET * (len(out) - 1)
    rebuilt = " ".join(r.packed_text for r in out)
    expected = " ".join(
        " ".join(f"d{d}t{i}" for i in range(sizes[d])) for d in ids
    )
    assert rebuilt == expected


def test_pack_write_masks_match_layout(spark):
    """doc_starts is the trainer's attention-reset mask: every doc's
    (seq_id, pos_in_seq) from the pack_sequences LAYOUT must appear as
    a start in exactly that sequence of the WRITER output, carry-over
    tails must not, and per-seq n_docs must count exactly the starts."""
    from angelone_clickhouse_spark.operators.curation import (
        pack_from_docs,
        pack_write_from_docs,
    )

    docs, ids, sizes = _writer_corpus(spark)
    layout = pack_from_docs(docs).collect()
    out = {r.seq_id: r for r in pack_write_from_docs(docs).collect()}
    starts = {
        s: [int(p) for p in r.doc_starts.split(",")] if r.doc_starts else []
        for s, r in out.items()
    }
    # every layout row is a start at its position; count matches
    expected = {}
    for r in layout:
        expected.setdefault(r.seq_id, []).append(r.pos_in_seq)
    for s, r in out.items():
        assert starts[s] == sorted(expected.get(s, [])), s
        assert r.n_docs == len(expected.get(s, [])), s
    assert sum(len(v) for v in starts.values()) == len(ids)
    # the 4-sequence doc forces carry-over-only sequences: masks empty
    assert any(v == [] for v in starts.values())


def test_pack_write_invariant_to_bucket_width(spark):
    """The writer must inherit the layout's width invariance — the
    materialized sequences are bit-identical for any prefix-sum
    bucket width."""
    from angelone_clickhouse_spark.operators.curation import (
        pack_write_from_docs,
    )

    docs, _, _ = _writer_corpus(spark)
    ref = sorted(map(tuple, pack_write_from_docs(docs, 1).collect()))
    for width in (13, 100, 10_000):
        got = sorted(
            map(tuple, pack_write_from_docs(docs, width).collect())
        )
        assert got == ref, width


def test_pack_write_composes_with_clustered_split(spark):
    """Leakage-safe training data: pack each side of the clustered
    split separately and assert the two packed streams partition the
    corpus — every doc's tokens appear in exactly one side's stream
    (the split_leakage_audit invariant carried through
    materialization)."""
    from angelone_clickhouse_spark.operators.curation import (
        pack_write_from_docs,
    )
    from angelone_clickhouse_spark.operators.dedup import split_by_cluster

    docs, ids, sizes = _writer_corpus(spark)
    # two synthetic near-dup clusters + singletons
    comp = spark.createDataFrame(
        [(0, 0), (3, 0), (50, 50), (51, 50)],
        "doc_id long, cluster_id long",
    )
    split = {
        r.doc_id: r.split for r in split_by_cluster(docs, comp).collect()
    }
    # cluster members share a split by construction
    assert split[0] == split[3] and split[50] == split[51]
    streams = {}
    for side in sorted(set(split.values())):
        side_ids = [d for d in ids if split[d] == side]
        side_docs = docs.filter(F.col("doc_id").isin(side_ids))
        rows = sorted(
            pack_write_from_docs(side_docs).collect(),
            key=lambda r: r.seq_id,
        )
        streams[side] = " ".join(r.packed_text for r in rows)
    for d in ids:
        holder = [s for s, txt in streams.items() if f"d{d}t0 " in txt + " "]
        assert holder == [split[d]], d


def test_repeated_substring_spans_planted(spark):
    """Planted shapes: a 15-token run shared by two docs at different
    alignments (overlapping seeds must merge into ONE maximal span
    each), within-doc self-repetition (ExactSubstr counts it), and a
    unique doc (zero spans)."""
    from angelone_clickhouse_spark.operators.curation import (
        SEED_W,
        _repeated_seeds,
        _seed_islands,
    )

    shared = [f"s{i}" for i in range(15)]          # 15-token shared run
    a = [f"a{i}" for i in range(5)] + shared + [f"a{i}" for i in range(5, 12)]
    b = [f"b{i}" for i in range(9)] + shared + ["b_end"]
    rep = [f"r{i}" for i in range(SEED_W)]
    c = rep + ["c_mid1", "c_mid2"] + rep            # self-repetition
    d = [f"d{i}" for i in range(30)]                # unique
    docs = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(c)),
         (3, " ".join(d))],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in _seed_islands(_repeated_seeds(docs, None)).collect()
    }
    # doc 0: shared run occupies positions 5..20 -> one span exactly
    assert (0, 5, 20) in spans
    # doc 1: positions 9..24
    assert (1, 9, 24) in spans
    # doc 2: both copies of rep are covered (0..SEED_W and the tail);
    # the middle filler is NOT covered
    assert (2, 0, SEED_W) in spans
    assert (2, SEED_W + 2, 2 * SEED_W + 2) in spans
    # doc 3: nothing
    assert not any(s[0] == 3 for s in spans)
    assert len(spans) == 4


def test_repeated_substring_rewrite_strips_exact_region(spark):
    """The rewrite drops exactly the covered tokens, keeps order, and
    a fully-duplicated doc drops to empty text but keeps its row."""
    from angelone_clickhouse_spark.operators.curation import (
        repeated_spans_from_docs,
        rewrite_from_spans,
    )

    shared = [f"s{i}" for i in range(12)]
    a = ["a_pre"] + shared + ["a_post1", "a_post2"]
    b = shared                                      # fully covered
    c = [f"c{i}" for i in range(20)]                # untouched
    docs = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(c))],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in rewrite_from_spans(
            docs, repeated_spans_from_docs(docs)
        ).collect()
    }
    assert out[0].clean_text == "a_pre a_post1 a_post2"
    assert out[0].n_kept_tokens == 3 and out[0].n_tokens == 15
    assert out[1].clean_text == "" and out[1].n_kept_tokens == 0
    assert out[2].clean_text == " ".join(c)
    assert out[2].n_kept_tokens == 20


def test_repeated_substring_python_reference(spark):
    """Randomized cross-check against a brute-force Python oracle:
    mark every position covered by a repeated SEED_W-gram interval,
    compare per-doc covered counts."""
    import random

    from angelone_clickhouse_spark.operators.curation import (
        SEED_W,
        spans_accounting_from_docs,
    )

    rng = random.Random(1608)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    for d in range(30):
        n = rng.randint(SEED_W - 3, 60)
        texts[d] = [rng.choice(vocab) for _ in range(n)]
    # plant guaranteed repeats
    texts[3][5:5 + SEED_W + 4] = [f"p{i}" for i in range(SEED_W + 4)]
    texts[7][0:SEED_W + 4] = [f"p{i}" for i in range(SEED_W + 4)]
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts.items()],
        "doc_id long, text string",
    )
    # python reference
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        for i in range(len(t) - SEED_W + 1):
            grams[tuple(t[i:i + SEED_W])] += 1
    expected = {}
    for d, t in texts.items():
        covered = set()
        for i in range(len(t) - SEED_W + 1):
            if grams[tuple(t[i:i + SEED_W])] >= 2:
                covered.update(range(i, i + SEED_W))
        expected[d] = len(covered)
    got = {
        r.doc_id: r.rep_tokens
        for r in spans_accounting_from_docs(docs).collect()
    }
    assert got == expected


def test_pack_append_matches_from_scratch_layout(spark):
    """The incremental aggregate+shift layout must equal the
    from-scratch global layout restricted to the batch — for a real
    corpus prefix and for the empty-corpus edge (t0 = 0)."""
    from angelone_clickhouse_spark.operators.curation import (
        pack_append_from_docs,
        pack_from_docs,
    )

    docs = spark.createDataFrame(
        [(d, " ".join(["w"] * (11 * d % 83 + 1))) for d in range(0, 700, 7)],
        "doc_id long, text string",
    )
    full = {r.doc_id: r for r in pack_from_docs(docs).collect()}
    for split in (350, 0):
        corpus = docs.filter(F.col("doc_id") < split)
        batch = docs.filter(F.col("doc_id") >= split)
        inc = {r.doc_id: r for r in
               pack_append_from_docs(batch, corpus).collect()}
        assert set(inc) == {d for d in full if d >= split}
        for d, r in inc.items():
            f = full[d]
            assert (r.offset, r.seq_id, r.pos_in_seq,
                    r.crosses_boundary) == (
                f.offset, f.seq_id, f.pos_in_seq, f.crosses_boundary
            ), d
