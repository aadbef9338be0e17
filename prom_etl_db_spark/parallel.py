"""Compute-balance helper for CPU-heavy per-row operators.

A narrow parquet scan of a small-but-compute-dense table (documents,
media payloads) yields as few as ONE input partition at 128 MB
``maxPartitionBytes`` — and then shingling / pandas-UDF decode runs on one
core while the rest idle. ``balance`` repartitions up to executor
parallelism **only when the input is narrower than that**, so at real
cluster scale (inputs already hundreds of partitions) it is a no-op and
costs no shuffle. Hash-partitioning on the id column also pre-balances
skew ahead of the heavy map (SURVEY.md §7.3 scale mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def balance(df: DataFrame, *keys: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: defaultParallelism)
    partitions keyed on ``keys`` iff it currently has fewer — a cheap
    shuffle of the small input that unlocks full-width execution of an
    expensive downstream map; a no-op on already-wide inputs."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # plan not convertible cheaply — don't risk a job
        return df
    if current >= n:
        return df
    cols = [F.col(k) for k in keys]
    return df.repartition(n, *cols) if cols else df.repartition(n)


class QueryTimeout(RuntimeError):
    """A Spark action group exceeded its wall-clock budget and was
    cancelled (the reference's per-query context.WithTimeout,
    cmd/server/main.go:170-172)."""


def run_with_job_timeout(spark, fn, seconds: float, *, group: str | None = None):
    """Run ``fn()`` (which submits Spark actions) under a job group and
    CANCEL the group if it exceeds ``seconds`` — raising QueryTimeout
    instead of letting one runaway query wedge the serve loop forever.

    Spark's job-group is thread-local, so ``fn`` runs in a worker thread
    that sets the group before submitting; the caller thread enforces the
    deadline with ``cancelJobGroup`` (interruptOnCancel, so executors
    stop burning CPU too — not just the driver giving up). A cancelled
    action raises inside ``fn``; that exception is swallowed in favor of
    QueryTimeout, while ordinary failures re-raise as themselves.
    """
    import threading
    import uuid

    gid = group or f"timeout-{uuid.uuid4().hex[:12]}"
    sc = spark.sparkContext
    done: list = []  # [("ok", result)] | [("err", exc)]

    def target():
        sc.setJobGroup(gid, f"budget {seconds}s", interruptOnCancel=True)
        try:
            done.append(("ok", fn()))
        except BaseException as e:  # noqa: BLE001 — relayed to the caller;
            # BaseException: a KeyboardInterrupt/SystemExit delivered to
            # the worker must surface as the cause, not a masked
            # IndexError from an empty `done`
            done.append(("err", e))
        finally:
            sc.setJobGroup(None, None)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        sc.cancelJobGroup(gid)
        t.join(30)  # drain the cancellation; daemon thread if it hangs
        # a job that COMPLETED during the drain window did its write —
        # reporting QueryTimeout then would invite a retry that
        # double-appends; prefer the recorded outcome
        if not done or done[0][0] != "ok":
            raise QueryTimeout(
                f"query exceeded {seconds}s budget (group {gid})"
            )
    if not done:  # worker died without recording (should be unreachable)
        raise QueryTimeout(f"query worker vanished (group {gid})")
    kind, payload = done[0]
    if kind == "err":
        raise payload
    return payload
