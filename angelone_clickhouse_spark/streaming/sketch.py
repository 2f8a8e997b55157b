"""Streaming count-min sketch: per-epoch cell partials merged into a
running frequency sketch.

The batch op (``functions/scalar.token_freq_cms``) builds the D x W
counter table in one pass; THIS is the shape a production pipeline
actually runs it in — each micro-batch contributes a tiny partial
cell table, partials merge by cell-wise SUM (counter addition
commutes, so epoch order cannot matter), and the cumulative sketch is
queryable at any point with no rescan of history. Mergeability is the
entire reason CMS (and the HLL/theta/KLL family) exist at 100 TB:
shard sketches, trigger sketches, and day sketches all combine with
the same cheap sum.

The driver-visible query replays the documents table in
``N_STREAM_EPOCHS`` file epochs (the splitter shared with
stream_dedup_docs / stream_novelty_docs), maintains the epoch-
committed partial store, then answers the SAME probe as the batch op
— exact top-CMS_TOP tokens vs sketch estimate. Because cell sums
commute, the streamed sketch is BIT-IDENTICAL to the batch one, so
the batch op's DuckDB oracle checks this path verbatim: a green row
certifies the merge law end-to-end (stream == batch is the test, the
oracle makes it a driver-checked fact).

Crash/retry contract: each epoch's partial is an ``e{epoch}-``
prefixed flat parquet append (epoch_commit.py) — a retried epoch
sweeps its own files first, and the partial is a pure function of the
batch, so recomputation is bit-deterministic. No keyed layout needed:
the store is D x W-bounded per epoch (KB-scale), and the merge read
is one scan of tiny files — compaction (streaming/compaction.py)
applies if epoch count ever grows the file count, not the data size.

Scale notes (100 TB): per epoch ONE groupBy(d, bucket) with map-side
partials over the trigger's tokens — constant output size; the merge
is a groupBy over n_epochs x D x W tiny rows. The exact-top-k probe
side is the batch op's own plan and exists to MEASURE the sketch; a
deployment queries the cell table directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.streaming.workdirs import owned_tmpdir
from angelone_clickhouse_spark.functions.scalar import (
    cms_cells,
    cms_probe_topk,
)
from angelone_clickhouse_spark.streaming.docdedup import (
    DOCS_SCHEMA,
    write_epoch_replay,
)
from angelone_clickhouse_spark.streaming.epoch_commit import (
    await_or_raise,
    commit_epoch_flat,
    sweep_prefix,
)

CELLS_SCHEMA = "d int, bucket long, n long"


def make_cms_epoch_writer(cells_dir: str):
    """foreachBatch body: sweep this epoch's partial (retry
    idempotence), aggregate the batch's cells, commit."""

    def write_epoch(batch: DataFrame, epoch_id: int) -> None:
        sweep_prefix(cells_dir, f"e{epoch_id}-")
        part = cms_cells(
            batch.select(F.explode(F.split("text", " ")).alias("token"))
        )
        commit_epoch_flat(part, cells_dir, epoch_id)

    return write_epoch


def merged_cells(spark: SparkSession, cells_dir: str) -> DataFrame:
    """Cumulative sketch = cell-wise sum of every committed epoch
    partial (counter addition commutes — epoch order is immaterial,
    which is the merge law the oracle certifies)."""
    return (
        spark.read.schema(CELLS_SCHEMA)
        .parquet(cells_dir)
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )


_REPLAY_CACHE: dict[str, str] = {}


def stream_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible face: stream the documents replay through the
    per-epoch sketch writer, merge the partials, and answer the batch
    op's probe — the output (and its DuckDB oracle) are the batch
    op's, verbatim, because cell sums commute."""
    from angelone_clickhouse_spark.sources.tables import load_table

    docs_dir = _REPLAY_CACHE.get(sf_dir)
    if docs_dir is None:
        docs_dir = os.path.join(
            owned_tmpdir(prefix="stream_cms_"), "in"
        )
        write_epoch_replay(spark, sf_dir, docs_dir)
        _REPLAY_CACHE[sf_dir] = docs_dir
    work = owned_tmpdir(prefix="stream_cms_run_")
    cells_dir = os.path.join(work, "cells")
    os.makedirs(cells_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(make_cms_epoch_writer(cells_dir))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # proceeding while the query still runs would merge a partially
    # written cells store and silently understate every estimate
    # (ADVICE r12; the shared guard is applied to every runner)
    await_or_raise(q, 600, "stream_token_cms")
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    return cms_probe_topk(toks, merged_cells(spark, cells_dir))


QUERIES = {"stream_token_cms": stream_token_cms}


def _oracle() -> dict[str, str]:
    from angelone_clickhouse_spark.functions import scalar as _s

    # bit-identical to the batch sketch by the merge law, so the batch
    # oracle checks the streamed path verbatim
    return {"stream_token_cms": _s.ORACLES["token_freq_cms"]}


ORACLES = _oracle()
