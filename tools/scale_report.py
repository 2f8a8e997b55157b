"""Generate SCALE.md: per-query sf1.0 vs sf0.1 ratio report.

Reads bench_full.json (sf0.1, 3-run medians) and bench_sf1_full.json
(sf1.0, same code) and writes the scale-evidence table VERDICT r5 #2
asked for: for 10x data, which queries scale sub-linearly (fixed
overhead amortizes), which ~linearly, and which super-linearly — with
the super-linear ones explained or flagged.

Usage: python tools/scale_report.py
"""

from __future__ import annotations

import json
import os
import statistics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# documented expectations for >LINEAR_FLAG queries; anything
# super-linear and NOT listed here is a finding, not a footnote
EXPLAINED = {
    "dedup_ngram_jaccard": (
        "documented exact-pairwise baseline: the 10x replication creates "
        "10-deep exact-duplicate groups, and candidate pairs grow "
        "quadratically in group size; the scale path is its LSH twin "
        "(dedup_minhash_lsh)"
    ),
    "dedup_clusters": (
        "composes dedup_ngram_jaccard (same quadratic pair base) + "
        "connected components; scale path: dedup_clusters_minhash"
    ),
}
LINEAR_FLAG = 12.0  # 10x data + margin for 1-run noise on small bases
NOISE_FLOOR = 0.3  # sec at sf0.1; below this, ratios are mostly jitter


def main() -> int:
    a = json.load(open(os.path.join(ROOT, "bench_full.json")))
    b = json.load(open(os.path.join(ROOT, "bench_sf1_full.json")))
    assert a["sf"] == 0.1 and b["sf"] == 1.0, (a["sf"], b["sf"])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ratios = {k: qb[k] / max(qa[k], 0.05) for k in common}
    med = statistics.median(ratios.values())
    superlin = {
        k: r
        for k, r in ratios.items()
        if r > LINEAR_FLAG and qa[k] >= NOISE_FLOOR
    }
    small_base = {
        k: r for k, r in ratios.items() if r > LINEAR_FLAG and qa[k] < NOISE_FLOOR
    }
    unexplained = sorted(k for k in superlin if k not in EXPLAINED)

    lines = [
        "# SCALE — measured 10x datapoint (sf0.1 -> sf1.0)",
        "",
        "The plan-shape gate predicts scale behavior; this is the measured",
        "check (VERDICT r5 #2). Same code, same session config. sf1.0 =",
        "`tools/make_sf1.py` (10x fact replication of sf0.1, FK-consistent,",
        "32 files per fact so row-group parallelism matches a real table).",
        "BOTH inputs are builder runs; per the r15 convention",
        "(ROUND15.md) the driver's BENCH_r{N}.json stays the artifact",
        "of record for sf0.1 totals — this file's job is the RATIO",
        "between the two SFs measured on one box in one session.",
        f"sf0.1 numbers are {a.get('bench_runs', 3)}-run medians"
        f" (bench_full.json); sf1.0 numbers are"
        f" {b.get('bench_runs', 1)}-run medians (bench_sf1_full.json).",
        "",
        f"- registry: {len(common)} queries timed at both SFs, "
        f"{b.get('n_failures', 0)} failures at sf1.0",
        f"- total wall: {a['value']:.1f} s (sf0.1) -> {b['value']:.1f} s "
        f"(sf1.0) = {b['value'] / a['value']:.2f}x for 10x data",
        f"- median per-query ratio: {med:.2f}x (fixed overhead amortizes;"
        " most queries are overhead-bound at sf0.1)",
        f"- ingest: {a['ingest_rows_per_sec']:,.0f} rows/s (sf0.1 run) /"
        f" {b['ingest_rows_per_sec']:,.0f} rows/s (sf1.0 run)",
        f"- skew section (salted vs plain on the heavy-hitter fixture):"
        f" sf0.1 {a['skew_secs']} -> sf1.0 {b['skew_secs']}",
        "",
        f"## Super-linear (> {LINEAR_FLAG:.0f}x, base >= {NOISE_FLOOR} s)",
        "",
        "| query | sf0.1 s | sf1.0 s | ratio | explanation |",
        "|---|---|---|---|---|",
    ]
    for k in sorted(superlin, key=lambda k: -ratios[k]):
        expl = EXPLAINED.get(k, "**UNEXPLAINED — investigate**")
        lines.append(
            f"| `{k}` | {qa[k]:.2f} | {qb[k]:.2f} | {ratios[k]:.1f}x | {expl} |"
        )
    if not superlin:
        lines.append("| (none) | | | | |")
    lines += [
        "",
        f"## Above {LINEAR_FLAG:.0f}x on sub-{NOISE_FLOOR}s bases "
        "(ratio dominated by the tiny denominator, absolute cost fine)",
        "",
        "| query | sf0.1 s | sf1.0 s | ratio |",
        "|---|---|---|---|",
    ]
    for k in sorted(small_base, key=lambda k: -ratios[k]):
        lines.append(f"| `{k}` | {qa[k]:.2f} | {qb[k]:.2f} | {ratios[k]:.1f}x |")
    if not small_base:
        lines.append("| (none) | | | |")
    lines += [
        "",
        "## Slowest 15 at sf1.0",
        "",
        "| query | sf0.1 s | sf1.0 s | ratio |",
        "|---|---|---|---|",
    ]
    for k in sorted(common, key=lambda k: -qb[k])[:15]:
        lines.append(f"| `{k}` | {qa[k]:.2f} | {qb[k]:.2f} | {ratios[k]:.1f}x |")
    # The write-once ANN index claim (VERDICT r10 weak #1 / r10 item
    # 1's done-criterion): probing the persisted bucketed cell table
    # must beat rebuilding + shuffling the LSH cells per run, and the
    # gap must hold (or widen) at 10x. Medians are warm-index numbers
    # at sf0.1 (pass 1 pays the one-time build; the 3-run median is
    # the amortized probe cost — exactly the deployment shape).
    ann_family = [
        ("knn_graph_ann", "per-run cell rebuild (the r10 shape)"),
        ("knn_graph_ann_bucketed", "probe of the persisted index"),
        ("knn_graph_ann_incremental", "probe of the base+delta-append index"),
        ("ann_topk_bucketed", "query top-k over the same index"),
    ]
    lines += [
        "",
        "## ANN index family: per-run rebuild vs persisted-index probe",
        "",
        "| query | shape | sf0.1 s | sf1.0 s | ratio |",
        "|---|---|---|---|---|",
    ]
    for k, shape in ann_family:
        if k in qa and k in qb:
            lines.append(
                f"| `{k}` | {shape} | {qa[k]:.2f} | {qb[k]:.2f} | "
                f"{ratios[k]:.1f}x |"
            )
    if "knn_graph_ann" in qa and "knn_graph_ann_bucketed" in qa:
        # label single-run numbers honestly (ADVICE r11): with
        # bench_runs=1 the probe time INCLUDES the one-time index
        # build, so only a multi-run median is a "warm probe"
        for sf_name, q, runs in (
            ("sf0.1", qa, a.get("bench_runs", 3)),
            ("sf1.0", qb, b.get("bench_runs", 1)),
        ):
            r = q["knn_graph_ann_bucketed"] / max(q["knn_graph_ann"], 0.05)
            label = (
                "the warm probe costs"
                if runs and runs > 1
                else "the single-run probe (build-INCLUSIVE: one run"
                " pays the one-time index build inside the timed"
                " query) costs"
            )
            lines.append(
                f"\nAt {sf_name} {label} "
                f"**{r:.2f}x the per-run rebuild** "
                f"({q['knn_graph_ann_bucketed']:.2f} s vs "
                f"{q['knn_graph_ann']:.2f} s)."
            )
        lines.append(
            "\nThe rebuild twin pays the n_tables x (2 + n_flips) corpus"
            " replication every run; the probe twins pay an id-only"
            " explode against the bucketed scan (zero corpus-side"
            " Exchange, plan-asserted in tests). The index build itself"
            " is paid once per corpus change — and only on the delta"
            " for appends (knn_graph_ann_incremental)."
        )
    # measured build/probe split (bench.py ann_index_secs, r12): the
    # builder is forced under a pinned-planes cache key, then the
    # probes time warm by construction — so these numbers are honest
    # at ANY bench_runs setting, unlike the conflated medians above
    ia = a.get("ann_index_secs") or {}
    ib = b.get("ann_index_secs") or {}
    if "probe_secs" in ia or "probe_secs" in ib:
        lines += [
            "",
            "### build vs warm probe, measured separately",
            "",
            "| measure | sf0.1 s | sf1.0 s |",
            "|---|---|---|",
        ]
        for key in (
            "build_secs",
            "tomb_build_secs",
            "probe_secs",
            "topk_probe_secs",
            "deleted_probe_secs",
        ):
            va = f"{ia[key]:.2f}" if key in ia else "—"
            vb = f"{ib[key]:.2f}" if key in ib else "—"
            lines.append(f"| `{key}` | {va} | {vb} |")
        lines.append(
            "\n`deleted_probe_secs` is `ann_topk_deleted`'s probe half"
            " riding the shared index with the tombstone set already"
            " written (`tomb_build_secs`) — the split that shows the"
            " registry op's single-run sf1.0 ratio was build-inclusive"
            " (index + tombstone overwrite per invocation), not a"
            " super-linear probe (VERDICT r12 #6)."
        )
    lines.append("")
    out = os.path.join(ROOT, "SCALE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}; median {med:.2f}x; "
          f"{len(superlin)} super-linear ({len(unexplained)} unexplained)")
    return 1 if unexplained else 0


if __name__ == "__main__":
    raise SystemExit(main())
