"""Streaming SemDeDup-style embedding gate: micro-batches of vectors
are cleared against a persisted SURVIVOR vector index by cosine
similarity, and only kept vectors join the index.

The embedding sibling of ``streaming/docdedup.py`` (VERDICT r9 #6 —
the text side had streaming twins, embeddings did not): each arriving
epoch (a crawl shard's embeddings, an encoder's output partition) is
deduplicated against every vector kept so far WITHOUT re-pairing the
corpus, then the survivors extend the index. Semantics per epoch, at
``dedup.COSINE_THRESHOLD`` on the rounded-to-6 exact cosine:

* ``dup_of_index`` — smallest indexed (kept-earlier) vec_id whose
  cosine clears the threshold (NULL if none);
* ``dup_of_batch`` — smallest SMALLER-id vector in the SAME epoch
  that clears it, kept or not (the one-pass within-batch rule shared
  with ``dedup_incremental``);
* ``keep``         — both NULL. Only kept vectors join the index.

Per-epoch compute is the repo's BLAS prune + exact re-verify device
(dedup_embedding / embedding_fast): the bounded arriving epoch is
collected and BROADCAST (bounded by the trigger, the ann_topk_fast
contract — the small side moves, the corpus never does); the index
streams through ``mapInPandas`` computing one numpy matmul per Arrow
batch at (threshold - ε), a sound prune; only the few candidates get
the sequential-fold JVM cosine that is bit-identical to DuckDB's
list_dot_product — so the epoch-unrolled brute-force oracle checks
the whole pruned path verbatim.

Crash/retry contract: both sinks (verdicts, index) go through the
shared ``epoch_commit`` committer — a retried epoch sweeps its own
``e{epoch}-`` files from both dirs before reading the index, so the
recomputation is bit-deterministic. Same contract as docdedup,
tested the same three ways (stream==batch, retry idempotence,
restart resume).

Scale notes (100 TB): the index is probed only through the matmul
scan (at real scale: front it with the LSH/IVF bucketing of
knn_graph_ann so each epoch touches candidate buckets, not the full
index — the verify tail is unchanged); index growth is one row per
kept vector. The driver never sees the index — only the bounded
arriving epoch.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.operators.dedup import COSINE_THRESHOLD
from angelone_clickhouse_spark.streaming.docdedup import (
    N_STREAM_EPOCHS,
    _read_index,
)
from angelone_clickhouse_spark.streaming.epoch_commit import (
    commit_epoch_flat,
    sweep_prefix,
)

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"
INDEX_SCHEMA = "vec_id long, v array<double>"
VERDICT_SCHEMA = (
    "vec_id long, dup_of_index long, dup_of_batch long, keep boolean"
)
_CAND_SCHEMA = "vec_id long, other_id long, other_new boolean"


def _as_double_vecs(emb: DataFrame) -> DataFrame:
    """(vec_id, v array<double>): doubles round-trip parquet exactly,
    so index persistence never perturbs the exact re-verify."""
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )


def semdedup_epoch(
    batch_emb: DataFrame, index_vec: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """One epoch of the gate as a pure frame-in/frame-out function
    (directly testable; the foreachBatch writer is plumbing around
    it): returns (verdicts, kept_vectors)."""
    from angelone_clickhouse_spark.operators.embedding_fast import (
        _PRUNE_EPS,
        _unit_rows,
    )
    from angelone_clickhouse_spark.operators.similarity import _cos

    spark = batch_emb.sparkSession
    new_vec = _as_double_vecs(batch_emb).localCheckpoint(eager=True)
    # bounded collect: one trigger's worth of vectors — the broadcast
    # small side (the corpus/index is never collected)
    b_ids, bm = _unit_rows(
        new_vec.select("vec_id", F.col("v").alias("embedding")).toPandas()
    )
    bc = spark.sparkContext.broadcast((b_ids, bm))
    corpus = index_vec.select(
        "vec_id", "v", F.lit(False).alias("is_new")
    ).unionByName(new_vec.select("vec_id", "v", F.lit(True).alias("is_new")))
    thr = COSINE_THRESHOLD - _PRUNE_EPS

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, bm = bc.value
        for pdf in batches:
            if len(b_ids) == 0 or len(pdf) == 0:
                continue
            c_ids, cm = _unit_rows(
                pdf.rename(columns={"v": "embedding"})
            )
            c_new = pdf["is_new"].to_numpy(dtype=bool)
            cos = np.round(bm @ cm.T, 6)  # (batch, corpus_block)
            mask = cos >= thr
            # vs the index: any id; vs the same batch: smaller id only
            mask &= (~c_new[None, :]) | (
                c_ids[None, :] < b_ids[:, None]
            )
            bi, ci = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "vec_id": b_ids[bi],
                    "other_id": c_ids[ci],
                    "other_new": c_new[ci],
                }
            )

    cand = corpus.mapInPandas(prune, schema=_CAND_SCHEMA)
    # exact JVM re-verify of the pruned candidates only
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    vecs = corpus.select("vec_id", "v", nrm.alias("nrm"))
    va = vecs.select(
        F.col("vec_id").alias("vec_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    vb = vecs.select(
        F.col("vec_id").alias("other_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    m = (
        cand.join(va, "vec_id")
        .join(vb, "other_id")
        .filter(
            F.round(
                _cos(F.col("av"), F.col("bv"), F.col("an"), F.col("bn")), 6
            )
            >= COSINE_THRESHOLD
        )
        .groupBy("vec_id")
        .agg(
            F.min(F.when(~F.col("other_new"), F.col("other_id"))).alias(
                "dup_of_index"
            ),
            F.min(F.when(F.col("other_new"), F.col("other_id"))).alias(
                "dup_of_batch"
            ),
        )
    )
    verdicts = (
        new_vec.select("vec_id")
        .join(m, "vec_id", "left")
        .select(
            "vec_id",
            "dup_of_index",
            "dup_of_batch",
            (
                F.col("dup_of_index").isNull()
                & F.col("dup_of_batch").isNull()
            ).alias("keep"),
        )
    )
    kept_vec = new_vec.join(
        verdicts.filter(F.col("keep")).select("vec_id"), "vec_id"
    )
    return verdicts, kept_vec


def make_embdedup_epoch_writer(out_dir: str, index_dir: str):
    """The foreachBatch function: sweep this epoch's files from both
    sinks (retry idempotence), read the index WITHOUT them, compute,
    commit verdicts then kept vectors."""

    def write_epoch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        sweep_prefix(out_dir, f"e{epoch_id}-")
        sweep_prefix(index_dir, f"e{epoch_id}-")
        index_vec = _read_index(spark, index_dir, INDEX_SCHEMA)
        verdicts, kept_vec = semdedup_epoch(batch, index_vec)
        verdicts = verdicts.localCheckpoint(eager=True)
        commit_epoch_flat(verdicts, out_dir, epoch_id)
        commit_epoch_flat(kept_vec, index_dir, epoch_id)

    return write_epoch


def semdedup_stream(
    spark: SparkSession,
    emb_dir: str,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    timeout_s: int = 600,
) -> None:
    """Run the gate over an embedding file stream to completion
    (availableNow); one replay file per epoch."""
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            make_embdedup_epoch_writer(out_dir, index_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def write_emb_epoch_replay(
    spark: SparkSession, sf_dir: str, emb_dir: str
) -> None:
    """Split the embeddings table into N_STREAM_EPOCHS single-file
    epochs (epoch = vec_id % N_STREAM_EPOCHS) with strictly
    increasing mtimes (the file-source ordering contract — see
    ingest.py's operational note)."""
    import shutil

    from angelone_clickhouse_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    os.makedirs(emb_dir, exist_ok=True)
    base = 1_000_000_000
    for k in range(N_STREAM_EPOCHS):
        staging = os.path.join(emb_dir + ".stage", f"epoch-{k}")
        shutil.rmtree(staging, ignore_errors=True)
        (
            emb.filter((F.col("vec_id") % N_STREAM_EPOCHS) == k)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(staging)
        )
        part = [n for n in os.listdir(staging) if n.startswith("part-")][0]
        dst = os.path.join(emb_dir, f"epoch-{k}.parquet")
        os.rename(os.path.join(staging, part), dst)
        os.utime(dst, (base + 10 * k, base + 10 * k))
        shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(emb_dir + ".stage", ignore_errors=True)


_REPLAY_CACHE: dict[str, str] = {}


def stream_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible face of the streaming embedding gate: replay
    the embeddings table in N_STREAM_EPOCHS epochs through the
    survivor-index gate and return every epoch's verdicts. The DuckDB
    oracle unrolls the same epoch sequence (epoch k pairs against
    kept vectors of epochs < k plus smaller ids of epoch k), so a
    green row proves the stream's cumulative index state exact."""
    emb_dir = _REPLAY_CACHE.get(sf_dir)
    if emb_dir is None:
        emb_dir = os.path.join(
            tempfile.mkdtemp(prefix="stream_semdedup_"), "in"
        )
        write_emb_epoch_replay(spark, sf_dir, emb_dir)
        _REPLAY_CACHE[sf_dir] = emb_dir
    work = tempfile.mkdtemp(prefix="stream_semdedup_run_")
    out_dir = os.path.join(work, "verdicts")
    index_dir = os.path.join(work, "index")
    semdedup_stream(
        spark, emb_dir, out_dir, index_dir, os.path.join(work, "ckpt")
    )
    return spark.read.schema(VERDICT_SCHEMA).parquet(out_dir)


def _stream_semdedup_oracle_sql() -> str:
    """Epoch-unrolled brute-force DuckDB twin: epoch k's qualifying
    others are kept vectors of earlier epochs plus smaller-id vectors
    of epoch k, at the same rounded-cosine threshold."""
    ne = N_STREAM_EPOCHS
    blocks = [
        """e AS MATERIALIZED (
  SELECT vec_id,
         embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)"""
    ]
    for k in range(ne):
        index_arm = (
            f"OR (b.vec_id % {ne} < {k} "
            f"AND b.vec_id IN (SELECT vec_id FROM kept{k - 1}))"
            if k > 0
            else ""
        )
        blocks.append(
            f"""m{k} AS MATERIALIZED (
  SELECT vec_id,
         min(CASE WHEN NOT src_new THEN b_id END) AS dup_of_index,
         min(CASE WHEN src_new THEN b_id END) AS dup_of_batch
  FROM (
    SELECT a.vec_id, b.vec_id AS b_id, (b.vec_id % {ne} = {k}) AS src_new
    FROM e a JOIN e b
      ON round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
           >= {COSINE_THRESHOLD}
    WHERE a.vec_id % {ne} = {k}
      AND ((b.vec_id % {ne} = {k} AND b.vec_id < a.vec_id)
           {index_arm})
  )
  GROUP BY vec_id
),
v{k} AS MATERIALIZED (
  SELECT e.vec_id, m.dup_of_index, m.dup_of_batch,
         (m.dup_of_index IS NULL AND m.dup_of_batch IS NULL) AS keep
  FROM e LEFT JOIN m{k} m USING (vec_id)
  WHERE e.vec_id % {ne} = {k}
),
kept{k} AS MATERIALIZED (
  SELECT vec_id FROM v{k} WHERE keep{"" if k == 0 else f'''
  UNION ALL
  SELECT vec_id FROM kept{k - 1}'''}
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM v{k}" for k in range(ne))
    return "WITH " + ",\n".join(blocks) + "\n" + union


QUERIES = {"stream_semdedup": stream_semdedup}
ORACLES = {"stream_semdedup": _stream_semdedup_oracle_sql()}
