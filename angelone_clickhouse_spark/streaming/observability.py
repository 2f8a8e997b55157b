"""Pipeline observability (reference O20/O21: Prometheus counters,
health endpoint).

The reference counts processed ticks, errors, and last-processed
timestamp via Prometheus client calls sprinkled through its worker
loop (metrics/metrics.go:18-89, main.go:154-163). Spark-first, the
same signals are declared ON the plan with ``df.observe`` — computed
by the running job itself at zero extra passes — and surfaced through
``StreamingQueryListener`` / ``lastProgress`` (streaming) or an
``Observation`` handle (batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

TICK_METRICS = "tick_metrics"


def observe_decoded(decoded: DataFrame, name: str = TICK_METRICS):
    """Attach the reference's counter set to a decoded-frame DataFrame.

    Batch: returns (df, Observation) — read ``obs.get`` after an
    action. Streaming: returns (df, None) — metrics appear under
    ``query.lastProgress.observedMetrics[name]`` each epoch.
    """
    metrics = [
        F.count(F.lit(1)).alias("frames_total"),
        F.sum(F.col("is_corrupt").cast("long")).alias("frames_corrupt"),
        F.max("exchange_timestamp").alias("last_exchange_ts_ms"),
        F.approx_count_distinct("token").alias("tokens_seen"),
    ]
    if decoded.isStreaming:
        return decoded.observe(name, *metrics), None
    obs = Observation(name)
    return decoded.observe(obs, *metrics), obs


def worker_stats(decoded: DataFrame) -> DataFrame:
    """Per-worker processed/error counters (reference WorkerStats,
    models/stats.go:15-20): the reference tracks each pool worker's
    processed count, error count, and last-processed time. Spark's
    "workers" are partitions — ``spark_partition_id()`` is the worker
    id — so the same stats are one partition-local aggregate (the
    groupBy key IS the partition, so partial aggregation completes
    map-side; the shuffle moves one row per worker).

    Works on batch and (per-epoch, via foreachBatch) streaming ticks.
    """
    return (
        decoded.groupBy(F.spark_partition_id().alias("worker_id"))
        .agg(
            F.count(F.lit(1)).alias("processed_count"),
            F.sum(F.col("is_corrupt").cast("long")).alias("error_count"),
            F.max("exchange_timestamp").alias("last_processed_ms"),
        )
    )
