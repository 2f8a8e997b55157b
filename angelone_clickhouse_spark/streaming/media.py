"""Structured-Streaming spelling of the multimodal decode path.

The media operators (operators/multimodal.py) are stateless
mapInPandas transforms, so the SAME functions run unchanged on a
streaming DataFrame — this module wires the cross-modal quality gate
(:func:`media_gate`) into readStream → transform → writeStream, the
shape a production pipeline uses to gate media as it lands rather
than in a nightly batch. Reference scope note: the reference engine
has no media path at all (this is north-star extension surface); the
streaming shape mirrors streaming/ingest.py's tick path.

Scale notes: the gate is decode-only (no shuffle, no state), so the
stream inherits source-file parallelism; ``maxFilesPerTrigger``
bounds a micro-batch's decode work the same way
``maxPartitionBytes`` bounds a batch scan. Checkpointing gives
exactly-once file-sink semantics; a restart resumes from the last
committed trigger (same guarantee the ingest tests pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from angelone_clickhouse_spark.operators.multimodal import media_gate

# the on-disk media layout a streaming source reads (`meta` is
# dropped: the gate needs only id/type/payload, and pruning the
# struct column at the source keeps the stream's Arrow batches lean)
MEDIA_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)


def gate_media_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """readStream(parquet media files) → media_gate → parquet sink.
    Returns the started StreamingQuery; with ``available_now`` the
    query drains everything present and stops (the test/backfill
    trigger), otherwise it runs continuously."""
    reader = (
        spark.readStream.schema(MEDIA_STREAM_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    gated = media_gate(reader.load(in_dir))
    writer = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
