"""Shared materialization helper (VERDICT r4 item 4).

Several operators must cut lineage mid-plan — iterative label
propagation (dedup.connected_components), plans that would otherwise
re-evaluate a nondeterministic or Generate-heavy subtree (RAG
chunking, winnowing fingerprints, frame sampling, theta-sketch
reuse). The default spelling is eager ``localCheckpoint``:
executor-local blocks, fast, right for bench and short jobs — but NOT
fault-tolerant; on a real cluster a lost executor kills the job.

``materialize(df, checkpoint_dir=...)`` is the single switch every
such site shares: pass a reliable directory (HDFS/S3 at cluster
scale) and the same plan checkpoints durably instead. Operators
expose the kwarg and default to None, so the sandbox/bench path stays
fast while the 100 TB deployment threads one config value through.

NOTE the checkpoint dir is SESSION-GLOBAL SparkContext state: it is
set only when the current dir is not already inside the requested one,
comparing normalized paths (Spark reports the dir with a URI scheme +
a per-set random subdirectory, so a raw string compare would re-set —
and stomp a concurrent caller — on every call, ADVICE r4). Concurrent
jobs needing DIFFERENT dirs should set one shared dir at session
setup instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _ckpt_dir_matches(current: str | None, requested: str) -> bool:
    """True iff the context's checkpoint dir already lives inside
    ``requested`` (scheme-stripped, abspath-normalized)."""
    if current is None:
        return False

    def _norm(p: str) -> str:
        if "://" in p:
            p = p.split("://", 1)[1]
        elif p.startswith("file:"):
            p = p[len("file:") :]
        return os.path.abspath(p)

    cur, req = _norm(str(current)), _norm(requested)
    return cur == req or cur.startswith(req.rstrip(os.sep) + os.sep)


OBS_TIMEOUT_S = 120.0


def observed(obs, what: str = "observation", timeout_s: float = OBS_TIMEOUT_S) -> dict:
    """Bounded-wait read of an ``Observation``'s metrics (ADVICE r16):
    ``Observation.get`` blocks FOREVER if the observed action's
    metrics never arrive — the engine's observed-metric fusion relies
    on ``localCheckpoint``/``collect`` firing QueryExecutionListener
    events, which is an implementation detail of Spark's withAction
    path, not a documented contract. Every engine call site reads
    through this helper so that a Spark behavior change fails LOUDLY
    (RuntimeError after ``timeout_s``) instead of deadlocking the
    epoch/round loop. Call sites read only after the observed action
    has completed (eager checkpoint / collect), so the first poll
    normally succeeds immediately; the JVM-side ``getRowOrEmpty``
    waits <=100 ms per poll."""
    import time

    deadline = time.monotonic() + timeout_s
    while True:
        if obs._jo.getRowOrEmpty().isDefined():
            return obs.get  # metrics present: non-blocking now
        if time.monotonic() >= deadline:
            raise RuntimeError(
                f"{what}: observed metrics did not arrive within "
                f"{timeout_s}s; the observed action's listener event "
                "never fired (Spark withAction behavior change?)"
            )


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Cut lineage: eager ``localCheckpoint`` by default, RELIABLE
    ``checkpoint`` into ``checkpoint_dir`` when given (see module
    docstring for the scale rationale and the session-global caveat)."""
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        if not _ckpt_dir_matches(sc.getCheckpointDir(), checkpoint_dir):
            sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
