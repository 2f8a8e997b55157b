"""Plan-shape metrics for every registry query — the scale-design
regression gate.

For each ``__spark_entry__.queries()`` entry, build the physical plan
at a fixture scale and count the operators that decide 100 TB
behavior: exchanges (shuffles), sort-merge joins, broadcast hash
joins, broadcast nested-loop joins, and cartesian products. The
committed snapshot (``tools/plans_sf0.001.json``) is diffed by
``tests/test_plan_shapes.py`` on every run, so a silent plan
regression — a broadcast degrading to SMJ, an extra shuffle sneaking
into a single-pass op, a join collapsing to a cartesian — fails CI
even while sf0.001 results stay correct.

Usage: python tools/plan_snapshot.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Substring-counted metrics. "Exchange" alone would conflate shuffle
# exchanges with BroadcastExchange/ReusedExchange (ADVICE r5), so
# shuffles are counted by the regex below and broadcasts separately.
METRICS = {
    "smj": "SortMergeJoin",
    "bhj": "BroadcastHashJoin",
    "bnlj": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "broadcast_exchanges": "BroadcastExchange",
}

# A shuffle exchange line is "Exchange hashpartitioning(...)" /
# "Exchange rangepartitioning(...)" / "Exchange SinglePartition" /
# "Exchange RoundRobinPartitioning(...)"; the negative lookbehind
# excludes BroadcastExchange and ReusedExchange nodes.
_SHUFFLE_RE = re.compile(
    r"(?<![A-Za-z])Exchange\s+"
    r"(?:hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning)"
)


def plan_metrics(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = {k: plan.count(tok) for k, tok in METRICS.items()}
    out["exchanges"] = len(_SHUFFLE_RE.findall(plan))
    return out


def snapshot(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        out[name] = plan_metrics(fn(spark, sf_dir))
    return out


def main() -> int:
    from angelone_clickhouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "plans_sf0.001.json")
    )
    spark = get_spark()
    snap = snapshot(spark, sf_dir)
    with open(out_path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"{len(snap)} plans -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
