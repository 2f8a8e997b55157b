"""Synthesize an sf1.0 fixture (10x sf0.1) for the scale-evidence run.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only). The
plan-shape gate PREDICTS 100x behavior; one real 10x datapoint
validates it (VERDICT r5 #2). This scales the FACT tables 10x by
replicating sf0.1 with shifted primary keys — referential integrity
and value distributions preserved — while dimension tables stay as-is
(dims grow slower than facts; every FK from a replicated fact row
still resolves):

- orders/lineitem: orderkey += copy * (max_orderkey + 1)
- events: event_id += copy * (max_event_id + 1)
- documents: doc_id += copy * (max_doc_id + 1); text unchanged, so
  every document gains 9 exact replicas — the dedup family does 10x
  REAL work (bigger clusters), not just 10x scan
- embeddings: vec_id += copy * (max_vec_id + 1); query/centroid id
  ranges (vec_id < 13) exist once, in copy 0

Output: .scaledata/sf1.0 under the repo root (gitignored).

Usage: python tools/make_sf1.py [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    from pyspark.sql import functions as F

    from angelone_clickhouse_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        "sf1.0",
    )
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="make_sf1")
    os.makedirs(out_dir, exist_ok=True)

    for t in DIM_TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        else:
            shutil.copyfile(src, dst)

    # orderkey is a SHARED key space: lineitem's shift must equal
    # orders' or the FK breaks — base comes from orders for both
    ok_base = (
        spark.read.parquet(os.path.join(SRC, "orders.parquet"))
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
        + 1
    )
    shared = {"o_orderkey": ok_base, "l_orderkey": ok_base}

    for t, keys in FACT_KEYS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        bases = {
            k: shared.get(k) or df.agg(F.max(k)).collect()[0][0] + 1
            for k in keys
        }
        copies = []
        for i in range(n_copies):
            c = df
            for k, base in bases.items():
                c = c.withColumn(k, F.col(k) + F.lit(i * base))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # realistic file/row-group counts: a naive union writes one file
        # per upstream partition (documents -> ~1 row group), which
        # serializes CPU-dense per-row ops into one task — an artifact
        # 100 TB data doesn't have (millions of row groups). 32 files
        # matches local[32] the way a real table's row-group count
        # saturates a cluster.
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
        n = spark.read.parquet(os.path.join(out_dir, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    print(f"sf1.0 -> {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
