"""Heavy-hitter (skew-stress) fixture variants.

The base fixtures are near-uniform across keys, so they never exercise
the engine's skew machinery — the salted two-phase aggregate
(operators/skew.py) and AQE's skew-join splitting are architecture
claims until a hot key actually exists (VERDICT r5 #3). These
transforms derive a DETERMINISTIC heavy-hitter variant from any base
sf directory:

- events: every even event_id is remapped to one hot ``user_id``
  (HOT_USER) — that token owns ~50% of all ticks;
- documents: every even doc_id is remapped to one hot ``source``
  (HOT_SOURCE) — that source owns ~50% of the corpus.

Only the key columns move; every other column (and the row count) is
untouched, so aggregate totals over non-key columns are preserved and
a parity oracle can predict the skewed result from the base one.

Scale notes: the transform is a narrow map (no shuffle); writing the
variant is a one-pass copy. tests/test_skew_stress.py asserts result
parity and sub-key balance over it; bench.py times the salted vs
plain aggregate on it per round.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.tables import load_table

HOT_USER = 7  # inherits ~50% of events
HOT_SOURCE = "hot-source"  # inherits ~50% of documents


def skew_events(ev: DataFrame) -> DataFrame:
    """~50% of events moved onto one hot user_id (even event_ids)."""
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(HOT_USER)).otherwise(
            F.col("user_id")
        ),
    )


def skew_documents(docs: DataFrame) -> DataFrame:
    """~50% of documents moved onto one hot source (even doc_ids)."""
    return docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.lit(HOT_SOURCE)).otherwise(
            F.col("source")
        ),
    )


def write_skewed_fixture(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Materialize the skewed variants of events and documents under
    ``out_dir`` (same file layout as a test sf directory). Returns
    ``out_dir`` for fixture chaining."""
    os.makedirs(out_dir, exist_ok=True)
    skew_events(load_table(spark, sf_dir, "events")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "events.parquet"))
    skew_documents(load_table(spark, sf_dir, "documents")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "documents.parquet"))
    return out_dir
