"""Hypothesis property tests for the r16 curation oracles.

The Spark operators are pinned to their DuckDB oracles by the parity
gate; these properties pin the ORACLES themselves against pure-Python
references under adversarial corpora (random small-vocab token lists
force repeats; lengths straddle the SEED_W and PACK_BUDGET
boundaries). DuckDB-only per example, so hundreds of examples stay
cheap — the same division of labor as test_exact_properties.py.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from angelone_clickhouse_spark.operators.curation import (
    ORACLES,
    PACK_BUDGET,
    SEED_W,
)

# small vocab -> repeated SEED_W-grams actually occur
token = st.sampled_from(["a", "b", "c", "aa", "bb"])
doc = st.lists(token, min_size=1, max_size=3 * SEED_W)
corpus = st.lists(doc, min_size=1, max_size=12)


def _con(docs):
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(t) for t in docs],
        }
    )
    con.register("documents_df", pdf)
    con.sql("CREATE VIEW documents AS SELECT * FROM documents_df")
    return con


def _covered(docs):
    """Python reference: per-doc set of positions inside repeated
    SEED_W-gram intervals (>= 2 occurrences anywhere)."""
    grams = Counter()
    for t in docs:
        for i in range(len(t) - SEED_W + 1):
            grams[tuple(t[i : i + SEED_W])] += 1
    cov = {}
    for d, t in enumerate(docs):
        c = set()
        for i in range(len(t) - SEED_W + 1):
            if grams[tuple(t[i : i + SEED_W])] >= 2:
                c.update(range(i, i + SEED_W))
        cov[d] = c
    return cov


@given(corpus)
@settings(max_examples=120, deadline=None)
def test_repeated_spans_oracle_matches_python(docs):
    cov = _covered(docs)
    con = _con(docs)
    rows = con.sql(ORACLES["repeated_substring_spans"]).fetchall()
    got = {r[0]: (r[2], r[3]) for r in rows}
    assert set(got) == set(range(len(docs)))
    for d, t in enumerate(docs):
        c = cov[d]
        # islands of the covered set = maximal spans
        n_spans = sum(
            1 for p in sorted(c) if p - 1 not in c
        )
        assert got[d] == (n_spans, len(c)), (d, t, got[d])


@given(corpus)
@settings(max_examples=120, deadline=None)
def test_repeated_rewrite_oracle_matches_python(docs):
    cov = _covered(docs)
    con = _con(docs)
    rows = con.sql(ORACLES["repeated_substring_rewrite"]).fetchall()
    got = {r[0]: (r[2], r[3]) for r in rows}
    for d, t in enumerate(docs):
        kept = [tok for i, tok in enumerate(t) if i not in cov[d]]
        assert got[d] == (len(kept), " ".join(kept)), (d, t)


@given(corpus)
@settings(max_examples=100, deadline=None)
def test_pack_write_oracle_tiles_and_reconstructs(docs):
    con = _con(docs)
    rows = sorted(con.sql(ORACLES["pack_sequences_write"]).fetchall())
    total = sum(len(t) for t in docs)
    # contiguous seq ids; exact budget on all but the tail
    assert [r[0] for r in rows] == list(range(len(rows)))
    assert sum(r[1] for r in rows) == total
    for r in rows[:-1]:
        assert r[1] == PACK_BUDGET
    # boundary masks: one start per doc, in doc order
    assert sum(r[2] for r in rows) == len(docs)
    # byte-exact global reconstruction
    rebuilt = " ".join(r[4] for r in rows)
    assert rebuilt == " ".join(" ".join(t) for t in docs)


@given(corpus, st.integers(min_value=0, max_value=12))
@settings(max_examples=100, deadline=None)
def test_pack_incremental_oracle_is_suffix_of_global(docs, split):
    """The incremental oracle (WHERE doc_id >= base) must be exactly
    the global layout restricted to the batch — for every split
    point."""
    con = _con(docs)
    sql = ORACLES["pack_sequences_incremental"].replace(
        "WHERE doc_id >= 400", f"WHERE doc_id >= {split}"
    )
    got = {r[0]: r for r in con.sql(sql).fetchall()}
    off = 0
    for d, t in enumerate(docs):
        n = len(t)
        if d >= split:
            assert got[d] == (
                d, n, off, off // PACK_BUDGET, off % PACK_BUDGET,
                (off + n - 1) // PACK_BUDGET > off // PACK_BUDGET,
            ), (d, t)
        off += n
    assert len(got) == max(0, len(docs) - split)
