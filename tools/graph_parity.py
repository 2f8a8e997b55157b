"""Shared-edge-fixture value parity for the kNN graph analytics.

VERDICT r13 #5: `knn_pagerank` / `knn_triangles` (and, since r15,
`knn_label_purity`) are the registry entries whose 10x (sf1.0)
coverage was bench-only, because their DuckDB oracles embed the
exact-kNN oracle — an O(n²) cross join re-scoring ~4x10^8 64-dim
pairs at sf1.0, intractable for the checker.
But the kNN edge CONTRACT is already value-certified (knn_graph is
oracle-green at the driver gate and at sf0.1); what these ops OWN is
the graph math / label rollup on top. This harness value-checks
exactly that part at any scale:

1. Spark builds the edge list ONCE via the registry's own blocked
   `knn_graph` path and writes it as a parquet fixture.
2. BOTH engines compute the graph math from that same fixture —
   Spark through `pagerank_from_edges` / `triangles_from_edges` /
   `purity_from_edges` (the exact frames the registry entries
   execute), DuckDB through the
   registry oracles with the edge CTE swapped to
   `read_parquet(fixture)`.
3. Results compare under the driver-gate replica (row count, sorted
   column names, canonical column types, order-insensitive value
   multiset — all from tools/check_parity.py).

Usage: python tools/graph_parity.py [sf_dir]
       (default /root/repo/.scaledata/sf1.0 — the make_sf1.py output)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.check_parity import _multiset, _type_mismatches


def run_graph_parity(spark, sf_dir: str) -> list[str]:
    """Returns the failing query names ([] = all matched)."""
    from angelone_clickhouse_spark.operators.embedding_fast import (
        _knn_pagerank_oracle_sql,
        _knn_purity_oracle_sql,
        _knn_triangles_oracle_sql,
        knn_graph,
        pagerank_from_edges,
        purity_from_edges,
        triangles_from_edges,
    )
    from angelone_clickhouse_spark.sources.tables import load_table
    from angelone_clickhouse_spark.streaming.workdirs import owned_tmpdir

    t0 = time.time()
    fixture = os.path.join(owned_tmpdir(prefix="graph_parity_"), "edges")
    (
        knn_graph(spark, sf_dir)
        .select("src_id", "neighbor_id")
        .write.mode("overwrite")
        .parquet(fixture)
    )
    print(f"edge fixture built by blocked kNN in {time.time()-t0:.1f}s "
          f"-> {fixture}")

    # No forced schema (ADVICE r14): both engines must consume the
    # fixture's written types verbatim, so an id-type drift in
    # knn_graph surfaces as an explicit assertion here instead of a
    # confusing value-diff downstream.
    edges = spark.read.parquet(fixture)
    expected = {"src_id": "bigint", "neighbor_id": "bigint"}
    actual = dict(edges.dtypes)
    if actual != expected:
        raise AssertionError(
            f"edge fixture schema drifted: {actual} != {expected}"
        )
    nodes = load_table(spark, sf_dir, "embeddings").select("vec_id")
    edges_sql = (
        f"SELECT src_id, neighbor_id "
        f"FROM read_parquet('{fixture}/*.parquet')"
    )

    con = duckdb.connect()
    con.sql("SET preserve_insertion_order=false")
    emb = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(emb):
        emb = f"{emb}/*.parquet"
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{emb}')"
    )

    cases = {
        "knn_pagerank": (
            lambda: pagerank_from_edges(edges, nodes),
            _knn_pagerank_oracle_sql(edges_sql=edges_sql),
        ),
        "knn_triangles": (
            lambda: triangles_from_edges(edges, nodes),
            _knn_triangles_oracle_sql(edges_sql=edges_sql),
        ),
        "knn_label_purity": (
            lambda: purity_from_edges(
                edges,
                load_table(spark, sf_dir, "embeddings").select(
                    "vec_id", "label"
                ),
            ),
            _knn_purity_oracle_sql(edges_sql=edges_sql),
        ),
    }
    failures = []
    for name, (fn, oracle) in cases.items():
        t0 = time.time()
        sdf = fn()
        scols, sschema = sdf.columns, sdf.schema
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(oracle)
        dcols, dtypes = rel.columns, rel.types
        drows = rel.fetchall()
        problems = []
        if len(srows) != len(drows):
            problems.append(
                f"rowcount spark={len(srows)} duckdb={len(drows)}"
            )
        if sorted(scols) != sorted(dcols):
            problems.append(
                f"cols spark={sorted(scols)} duckdb={sorted(dcols)}"
            )
        tmis = _type_mismatches(sschema, dcols, dtypes)
        if tmis:
            problems.append("column types differ: " + "; ".join(tmis))
        if not problems:
            sm, dm = _multiset(srows, scols), _multiset(drows, dcols)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(srows)} rows match "
                  f"(shared edge fixture, {time.time()-t0:.1f}s)")
    return failures


if __name__ == "__main__":
    from angelone_clickhouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        "sf1.0",
    )
    fails = run_graph_parity(get_spark(), sf_dir)
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    raise SystemExit(1 if fails else 0)
