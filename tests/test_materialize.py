"""Shared materialize helper (VERDICT r4 item 4): every operator that
cuts lineage exposes ``checkpoint_dir``; passing it must (a) produce
identical results to the default localCheckpoint path and (b) actually
write RELIABLE checkpoint data under the directory — the fault-tolerant
spelling a 100 TB cluster threads through one config value."""

from __future__ import annotations

import os

from angelone_clickhouse_spark.materialize import _ckpt_dir_matches


def test_ckpt_dir_matches_normalizes_schemes_and_subdirs():
    # Spark reports "file:/dir/<uuid>" after setCheckpointDir("/dir"):
    # the raw-string compare bug (ADVICE r4) would re-set every call
    assert _ckpt_dir_matches("file:/tmp/ck/3f2a-uuid", "/tmp/ck")
    assert _ckpt_dir_matches("file:///tmp/ck/3f2a-uuid", "/tmp/ck")
    assert _ckpt_dir_matches("/tmp/ck", "/tmp/ck")
    assert not _ckpt_dir_matches(None, "/tmp/ck")
    assert not _ckpt_dir_matches("file:/tmp/other/uuid", "/tmp/ck")
    # prefix of a DIFFERENT directory name must not match
    assert not _ckpt_dir_matches("/tmp/ck2/uuid", "/tmp/ck")


def test_reliable_checkpoint_path_matches_default(spark, tmp_path, sf_dir):
    """chunk_documents + distinct_users_theta through a reliable
    checkpoint dir: same rows as the default path, and checkpoint files
    exist on disk (proof the reliable spelling actually engaged)."""
    from angelone_clickhouse_spark.functions.scalar import distinct_users_theta
    from angelone_clickhouse_spark.operators.pipeline import chunk_documents

    ck = str(tmp_path / "reliable_ck")
    prev = spark.sparkContext.getCheckpointDir()
    try:
        default = sorted(map(tuple, chunk_documents(spark, sf_dir).collect()))
        reliable = sorted(
            map(
                tuple,
                chunk_documents(spark, sf_dir, checkpoint_dir=ck).collect(),
            )
        )
        assert reliable == default and len(default) > 0
        written = [
            os.path.join(dp, f) for dp, _, fs in os.walk(ck) for f in fs
        ]
        assert written, "no reliable checkpoint data written"

        d2 = sorted(map(tuple, distinct_users_theta(spark, sf_dir).collect()))
        r2 = sorted(
            map(
                tuple,
                distinct_users_theta(
                    spark, sf_dir, checkpoint_dir=ck
                ).collect(),
            )
        )
        assert r2 == d2 and len(d2) > 0
    finally:
        if prev is not None:
            spark.sparkContext.setCheckpointDir(prev)
