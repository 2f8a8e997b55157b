"""Full-registry oracle differential at sf0.001 (ADVICE r3): the
driver's end-of-round gate sees only the first 50 registry entries, so
every refactor round leaves ~half the registry with a stale hard
signal. This test runs the complete differential (row count + schema +
order-insensitive value multiset vs DuckDB) over ALL registered
queries on every pytest run — a rotated-out query can no longer
regress silently."""

from __future__ import annotations

SF_SMOKE = "/root/testdata/sf0.001"  # ~90 s for the full registry


def test_every_registered_query_matches_its_oracle(spark):
    import tools.check_parity as cp

    failures = cp.run_parity(spark, SF_SMOKE, quiet=False)
    assert failures == []


def test_graph_parity_shared_edge_fixture(spark):
    """The sf1.0 shared-edge-fixture arm (tools/graph_parity.py,
    VERDICT r13 #5) at smoke scale: Spark materializes the blocked
    kNN edge list once and BOTH engines compute the PageRank /
    triangle math from the same parquet fixture — the value check
    that covers the graph ops at scales where their exact-kNN
    registry oracles are intractable. Must match at sf0.001 exactly
    like the registry-oracle path does."""
    from tools.graph_parity import run_graph_parity

    assert run_graph_parity(spark, SF_SMOKE) == []
