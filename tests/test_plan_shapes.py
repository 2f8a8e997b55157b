"""Registry-wide plan-shape regression gate.

tests/test_plans.py pins hand-written invariants for a dozen ops;
this test diffs the shuffle/join-operator counts of ALL registry
queries against the committed snapshot
(``tools/plans_sf0.001.json``), so a broadcast silently degrading to
a sort-merge join, an extra exchange sneaking into a one-pass op, or
a join collapsing to a cartesian product fails CI even while sf0.001
RESULTS stay bit-correct. Regenerate after an intentional plan change
with::

    python tools/plan_snapshot.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "plans_sf0.001.json",
)


def test_plan_shapes_match_snapshot(spark, sf_dir):
    from plan_snapshot import snapshot

    with open(SNAPSHOT) as f:
        expected = json.load(f)
    actual = snapshot(spark, sf_dir)
    missing = sorted(set(expected) - set(actual))
    new = sorted(set(actual) - set(expected))
    assert not missing, f"queries dropped from registry: {missing}"
    assert not new, (
        f"new queries without a plan snapshot (run tools/plan_snapshot.py): {new}"
    )
    diffs = {
        name: {"expected": expected[name], "actual": actual[name]}
        for name in expected
        if expected[name] != actual[name]
    }
    assert not diffs, json.dumps(diffs, indent=1)


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """Independent of the snapshot: no registry plan may ever contain
    a cartesian product."""
    from plan_snapshot import snapshot

    offenders = {
        name: m for name, m in snapshot(spark, sf_dir).items() if m["cartesian"]
    }
    assert not offenders, offenders
