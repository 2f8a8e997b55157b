"""Generate PARITY_sf1.0.md from actual check_parity runs.

VERDICT r13 #8: the sf1.0 parity doc was hand-edited each round and
accumulated three generations of "as of round N" headers. This tool
makes it a GENERATED artifact, the way COVERAGE.md is generated from
the CORRECTNESS union:

- `--run [names...]` executes the oracle-differential gate replica
  (tools/check_parity.run_parity) at the sf1.0 fixture for the given
  names (default: the full curated sf1.0 set below) and records each
  outcome in the ledger `tools/parity_sf1.0.json` with the run date.
- `--run-graph` executes the shared-edge-fixture arm
  (tools/graph_parity) for knn_pagerank / knn_triangles /
  knn_label_purity — the ops whose registry oracles embed the
  sf1.0-intractable exact-kNN cross join — and records them with
  method "shared edge fixture".
- Every invocation ends by regenerating PARITY_sf1.0.md wholesale
  from the ledger; headers carry run dates, never round claims.

Usage:
  python tools/parity_report.py --run                 # full sweep
  python tools/parity_report.py --run name1 name2     # subset
  python tools/parity_report.py --run-graph           # graph arm
  python tools/parity_report.py --emit                # md only
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "tools", "parity_sf1.0.json")
SF1_DIR = os.path.join(ROOT, ".scaledata", "sf1.0")

# The curated sf1.0 value-parity set: every volume-sensitive family
# whose oracle is sf1.0-tractable (dedup pairs/clusters, the ANN
# graph+index family, streaming replays, window/time-series ops, the
# BPE/vocab family, sketches, layout). knn_pagerank / knn_triangles /
# knn_label_purity are NOT here — their registry oracles embed the
# O(n²) exact-kNN cross join; they run through the --run-graph
# shared-fixture arm.
SF1_NAMES = [
    # exact / fuzzy / embedding dedup
    "dedup_exact", "dedup_minhash_lsh", "dedup_clusters_minhash",
    "dedup_clusters", "dedup_simhash", "dedup_embedding_fast",
    "doc_containment", "span_dedup_corpus",
    # ANN graph + index family
    "knn_graph_ann", "knn_graph_ann_bucketed",
    "knn_graph_ann_incremental", "knn_graph_ivf",
    "ann_topk_bucketed", "semdedup", "ann_topk_pq",
    # streaming replays (epoch-unrolled oracles)
    "stream_novelty_docs", "stream_semdedup_lsh", "stream_semdedup",
    "stream_dedup_docs",
    # window / time-series
    "q5_daily_ohlcv", "max_drawdown", "rolling_volatility",
    "event_sliding_windows", "weekly_retention", "gap_sessions",
    "vwap_daily", "twap_hourly", "minute_bars", "ewma_price",
    # BPE / vocab
    "bpe_train", "bpe_encode", "vocab_coverage_curve",
    # curation / sketches / layout
    "dsir_weights", "decontaminate_bloom", "token_freq_cms",
    "stream_token_cms", "zorder_layout", "zorder_prune_stats",
    # volume-sensitive newcomers (VERDICT r14 #7): the e2e funnel,
    # the time-interval join, and the r15 cluster-keyed split
    "pipeline_e2e", "tick_interval_join", "dataset_split_clustered",
    "split_leakage_audit", "pack_sequences",
    # r16 newcomers (round-notes rule: volume-sensitive changed ops
    # join the ledger the round they change): the sequences writer,
    # append-batch packing, and the ExactSubstr pair
    "pack_sequences_write", "pack_sequences_incremental",
    "repeated_substring_spans", "repeated_substring_rewrite",
]
GRAPH_NAMES = ["knn_pagerank", "knn_triangles", "knn_label_purity"]


def _load() -> dict:
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return json.load(f)
    return {}


def _save(ledger: dict) -> None:
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")


def _today() -> str:
    return datetime.date.today().isoformat()


def run_names(names: list[str]) -> None:
    from angelone_clickhouse_spark.session import get_spark
    from tools.check_parity import run_parity

    # ADVICE r14: run_parity(only={name}) silently skips names the
    # registry doesn't know, so a typo'd name would ledger as a green
    # row backed by zero runs. Fail fast instead.
    import __spark_entry__ as entrymod

    registry = set(entrymod.queries())
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(
            f"parity_report: names not in __spark_entry__.queries(): "
            f"{unknown}"
        )

    spark = get_spark()
    ledger = _load()
    for name in names:
        t0 = time.time()
        fails = run_parity(spark, SF1_DIR, only={name})
        ledger[name] = {
            "status": "fail" if fails else "ok",
            "method": "registry oracle",
            "date": _today(),
            "secs": round(time.time() - t0, 1),
        }
        _save(ledger)
    emit(ledger)


def run_graph() -> None:
    from angelone_clickhouse_spark.session import get_spark
    from tools.graph_parity import run_graph_parity

    t0 = time.time()
    fails = run_graph_parity(get_spark(), SF1_DIR)
    ledger = _load()
    for name in GRAPH_NAMES:
        ledger[name] = {
            "status": "fail" if name in fails else "ok",
            "method": "shared edge fixture",
            "date": _today(),
            "secs": round((time.time() - t0) / len(GRAPH_NAMES), 1),
        }
    _save(ledger)
    emit(ledger)


def emit(ledger: dict | None = None) -> None:
    ledger = ledger if ledger is not None else _load()
    n_ok = sum(1 for v in ledger.values() if v["status"] == "ok")
    n = len(ledger)
    missing = [x for x in SF1_NAMES + GRAPH_NAMES if x not in ledger]
    lines = [
        "# sf1.0 value parity — volume-sensitive families at 10x the "
        "gate scale",
        "",
        "GENERATED by `python tools/parity_report.py` from the run "
        "ledger",
        "`tools/parity_sf1.0.json` — do not hand-edit. Each row is an "
        "actual",
        "oracle-differential run (tools/check_parity.py gate replica: "
        "row count,",
        "sorted column names, canonical column types, order-insensitive",
        "value multiset) against the sf1.0 fixture "
        "(`tools/make_sf1.py`,",
        "10x FK-consistent fact replication of sf0.1 — every document "
        "gains 9",
        "exact replicas, so the dedup family does 10x REAL work).",
        "",
        "`knn_pagerank` / `knn_triangles` / `knn_label_purity` run "
        "through the SHARED EDGE FIXTURE",
        "arm (`tools/graph_parity.py`): their registry oracles embed "
        "the",
        "exact-kNN oracle — an O(n²) cross join re-scoring ~4x10^8 "
        "dim-64",
        "pairs at sf1.0, intractable for DuckDB — so Spark "
        "materializes the",
        "edge list once via the oracle-certified blocked `knn_graph` "
        "path and",
        "BOTH engines compute the graph math from that same parquet "
        "fixture.",
        "",
        f"## Result: {n_ok} / {n} matched",
        "",
        "| query | status | method | run date | secs |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(ledger):
        v = ledger[name]
        lines.append(
            f"| `{name}` | {v['status']} | {v['method']} | {v['date']} "
            f"| {v['secs']} |"
        )
    if missing:
        lines += [
            "",
            "Not yet run under the current ledger: "
            + ", ".join(f"`{m}`" for m in missing),
        ]
    lines += [
        "",
        "## Why this exists",
        "",
        "The classes this run catches — integer overflow in token "
        "cumsums,",
        "rank ties at 100x the smoke rows, float drift in 10-deep "
        "duplicate",
        "groups, adaptive-parameter divergence between engines — only "
        "appear",
        "at volume; the driver gate runs at sf0.01. Oracle-side memory",
        "controls: set `PARITY_DUCKDB_MEMORY` (e.g. 24GB) and",
        "`PARITY_DUCKDB_TEMP` for the brute-force epoch-unrolled "
        "oracles.",
        "",
    ]
    path = os.path.join(ROOT, "PARITY_sf1.0.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"PARITY_sf1.0.md regenerated: {n_ok}/{n} ok, "
          f"{len(missing)} not yet run")


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--run":
        run_names(args[1:] or SF1_NAMES)
    elif args and args[0] == "--run-graph":
        run_graph()
    elif args and args[0] == "--emit":
        emit()
    else:
        print(__doc__)
        raise SystemExit(2)
