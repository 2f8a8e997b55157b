"""Pathological duplicate-group stress — measured evidence that the
bounded duplicate-group collapse (``DEEP_GROUP_BOUND``) survives a
corpus no naive pairwise spelling could.

The 10x replication behind SCALE.md only produces duplicate groups of
depth 10 — under the bound of 32, so the deep star-edge branches never
fire in any measured run (they are pinned for correctness by bound=2
fixture tests, but not for cost). This tool plants a K-deep group
(default K=50,000 copies of one sf0.1 document — C(K,2) ~ 1.25e9
pairs, which the pre-r7 ``collect_list`` spelling would generate
inside ONE task) on top of the real sf0.1 documents table and times
the three grouped-collapse operators end-to-end:

* ``_grouped_pairwise``    (n-gram Jaccard; undirected star)
* ``_fuzzy_grouped``       (PassJoin edit-distance; undirected star)
* ``_containment_grouped`` (fingerprint containment; directed star)

For each it reports wall seconds, output pair count, the deep group's
emitted edge count vs the C(K,2) a naive expansion would emit, and —
for the Jaccard graph — verifies via ``connected_components`` that the
planted group still closes into ONE cluster of exactly K + its
near-dup neighbors, i.e. the bounded representation loses nothing the
downstream dedup consumer needs.

Usage: python tools/deep_group_stress.py [sf_dir] [K]
Writes tools/deep_group_stress.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from angelone_clickhouse_spark.session import get_spark
from angelone_clickhouse_spark.sources.tables import load_table

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark()

    from angelone_clickhouse_spark.operators.dedup import (
        DEEP_GROUP_BOUND,
        _grouped_pairwise,
        connected_components,
    )
    from angelone_clickhouse_spark.operators.text import (
        _containment_grouped,
        _fuzzy_grouped,
    )

    docs = load_table(spark, sf_dir, "documents")
    base_n = docs.count()
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    # the planted text: one real document (so it has shingles,
    # fingerprints, and a prefix — every operator's filters keep it)
    seed = (
        docs.filter(F.length("text") > 100)
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    clones = (
        spark.range(k)
        .select(
            (F.col("id") + F.lit(max_id + 1)).alias("doc_id"),
            F.lit(seed.lang).alias("lang"),
            F.lit(seed.source).alias("source"),
            F.lit(seed.text).alias("text"),
            F.lit(seed.n_chars).alias("n_chars"),
        )
        .repartition(32)
    )
    corpus = docs.select(
        "doc_id", "lang", "source", "text", "n_chars"
    ).unionByName(clones)
    corpus = corpus.localCheckpoint(eager=True)  # time operators, not IO

    def in_group(c):
        # clones occupy the contiguous id range above max_id; a range
        # predicate avoids shipping a 50k-literal isin through Py4J
        return (F.col(c) == F.lit(seed.doc_id)) | (F.col(c) > F.lit(max_id))

    naive_within = (k + 1) * k // 2  # C(K+1, 2)
    out: dict = {
        "sf_dir": sf_dir,
        "k": k,
        "base_docs": base_n,
        "bound": DEEP_GROUP_BOUND,
        "naive_within_pairs": naive_within,
        "ops": {},
    }

    def run(name, fn, pair_cols):
        t0 = time.time()
        pairs = fn(corpus)
        a, b = pair_cols
        agg = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((in_group(a) & in_group(b)).cast("long")).alias(
                "n_within"
            ),
        ).collect()[0]
        dt = time.time() - t0
        out["ops"][name] = {
            "sec": round(dt, 2),
            "pairs": agg.n,
            "deep_group_edges": agg.n_within,
            "naive_would_emit": naive_within,
            "reduction": round(naive_within / max(agg.n_within, 1), 1),
        }
        return pairs

    jac = run("ngram_jaccard", _grouped_pairwise, ("doc_a", "doc_b"))
    run("fuzzy_pairs", _fuzzy_grouped, ("doc_id_a", "doc_id_b"))
    run("containment", _containment_grouped, ("doc_src", "doc_dst"))

    # closure check: the planted group must land in ONE cluster that
    # contains all K+1 members (plus any organic near-dups of the seed)
    t0 = time.time()
    comp = connected_components(jac.select("doc_a", "doc_b"))
    planted = comp.filter(in_group("doc_id"))
    agg = planted.agg(
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_members"),
    ).collect()[0]
    out["closure"] = {
        "sec": round(time.time() - t0, 2),
        "clusters_for_planted_group": agg.n_clusters,
        "planted_members_clustered": agg.n_members,
        "expected_members": k + 1,
    }
    assert agg.n_clusters == 1, "planted group split across clusters"
    assert agg.n_members == k + 1, "planted member lost"

    with open(os.path.join(REPO_ROOT, "tools", "deep_group_stress.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
