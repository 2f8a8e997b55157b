"""Benchmark harness: every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

Each query executes via a noop-format write (full plan execution, no
driver-side collect cost). A warm-up query absorbs session/JIT startup
so per-query numbers reflect steady state. Ingest throughput (frames
decoded -> projected -> appended per second) is reported alongside, to
compare against the reference's derived >= 200 ticks/s floor
(BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    import __spark_entry__ as entrymod
    from angelone_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")

    # warm-up: JIT, codegen, parquet footer caches
    t0 = time.time()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    warmup = time.time() - t0

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record, keep benching
            failures[name] = f"{type(e).__name__}: {e}"

    # ingest throughput: decode -> project -> parquet append, batch path
    from angelone_clickhouse_spark.sources.decoder import decode_frames, wire_to_ticks
    from angelone_clickhouse_spark.sources.frames import generate_frames, write_frames_parquet

    n_frames = 200_000
    with tempfile.TemporaryDirectory() as d:
        write_frames_parquet(
            spark, generate_frames(n_frames, seed=42), f"{d}/in", n_files=int(CPUS)
        )
        src = spark.read.parquet(f"{d}/in")
        # warm the FULL Python-worker pool with an untimed complete
        # pass: a limit() warm-up collapses to one partition and warms
        # one worker, leaving the timed runs to pay the other ~31
        # worker spawns (~20-30s on local[32]) — that is session
        # startup cost, not pipeline throughput. Same plan, noop sink.
        warm_t0 = time.time()
        wire_to_ticks(decode_frames(src)).write.format("noop").mode(
            "overwrite"
        ).save()
        ingest_warm = time.time() - warm_t0
        runs = []
        for i in range(2):
            t0 = time.time()
            wire_to_ticks(decode_frames(src)).write.mode("overwrite").parquet(
                f"{d}/out{i}"
            )
            runs.append(time.time() - t0)
    best = min(runs)
    ingest_rps = round(n_frames / best, 1)

    result = {
        "metric": "wall_clock_all_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "n_queries": len(timings),
        "warmup_sec": round(warmup, 3),
        "ingest_rows_per_sec": ingest_rps,
        "ingest_n_frames": n_frames,
        # reconciliation fields: if warm ~= best the pool never warmed
        # and the rows/s figure is startup-bound, not throughput
        "ingest_warm_pass_sec": round(ingest_warm, 3),
        "ingest_run_secs": [round(r, 3) for r in runs],
    }
    if failures:
        result["failures"] = failures
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
