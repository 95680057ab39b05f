"""Cursor-based incremental consumption of a snapshot table's change
feed — the generic table-to-anything pipeline primitive.

``mv_refresh`` (``sources/matview.py``) consumes the change feed with
exactly-once semantics because its SINK is a snapshot table that can
record the source high-water mark as a txn marker.  Arbitrary
downstreams (feature stores, search indexes, external systems) need the
same incremental contract without that luxury; this module provides the
standard shape (Delta/Kafka-style offset checkpointing):

- a durable CURSOR directory records acknowledged source versions as
  ``ack-v{N}`` marker files created with the FS seam's
  ``create_exclusive``; the position is the MAX marker.
- ``consume_changes`` returns the change rows in ``(cursor, CURRENT]``
  plus an ``ack()`` callback; the caller processes, THEN acks.

Crash between process and ack -> the span replays: **at-least-once**
delivery, upgraded to exactly-once by any idempotent downstream — and
because changes are delivered per commit with ``_commit_version``, a
downstream that records the acked version (a snapshot-table sink via
``txn_app``/``txn_batch``, or any store with a conditional write) gets
the full Delta ``txnAppId`` rule.  The cursor is monotone BY
CONSTRUCTION, not by a read-check-write guard: concurrent acks create
distinct marker files (create-exclusive, no lost update possible) and
the position is their max, so a late ack from a superseded consumer
run can never regress a newer run's progress — the same primitive the
commit protocol itself stands on.  Old markers are pruned
opportunistically (always keeping a trailing window), which is safe
for the same reason: removing a non-max marker cannot change the max.

Retention contract: the feed is derived from manifests, so
``expire_snapshots(keep_last=K)`` must keep at least the span any
consumer may still need — a cursor older than the oldest kept manifest
raises ``FeedExpired`` (the consumer must re-bootstrap from a full
``snap_read``, exactly Delta's CDF-past-VACUUM behavior).

At 100 TB: a consume reads only the commits' rewritten file slices
(``table_changes``' cost model) and the cursor is O(1) state — no
driver-held history, no rescans of the table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .snapshots import (
    LocalSnapshotFS,
    _fs,
    _manifest_path,
    current_version,
    table_changes,
)


class FeedExpired(RuntimeError):
    """The cursor points below the oldest retained manifest — the
    incremental span is gone; re-bootstrap from a full read."""


def feed_position(cursor_path: str, fs: LocalSnapshotFS | None = None) -> int:
    """The last acknowledged source version (0 = never consumed) —
    the max ``ack-v{N}`` marker in the cursor directory."""
    f = _fs(fs)
    if not f.exists(cursor_path):
        return 0
    versions = [
        int(n[5:])
        for n in f.listdir(cursor_path)
        if n.startswith("ack-v")
    ]
    return max(versions, default=0)


def consume_changes(
    spark: SparkSession,
    src_path: str,
    keys: list[str],
    cursor_path: str,
    max_commits: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Open the next unconsumed span of ``src_path``'s change feed.

    Returns ``{"changes", "from", "to", "ack"}``: ``changes`` is the
    ``table_changes`` DataFrame for ``(from, to]`` (``None`` when the
    cursor is already current), and ``ack()`` durably advances the
    cursor to ``to`` — call it only after the span's effects are safely
    applied downstream.  ``max_commits`` bounds the span for paced
    draining (consume in order, ack each span)."""
    from pyspark.sql import functions as F

    from .snapshots import snap_read

    f = _fs(fs)
    last = feed_position(cursor_path, fs)
    cur = current_version(src_path, fs)
    to = cur if max_commits is None else min(cur, last + max_commits)
    if to <= last:
        return {"changes": None, "from": last, "to": last, "ack": lambda: None}
    if last == 0:
        # bootstrap: a never-run consumer gets the table state AT ``to``
        # as one insert batch (Delta's startingVersion=0 shape) — the
        # per-commit history before the bootstrap point is not replayed
        state = snap_read(spark, src_path, version=to, fs=fs)
        changes = state.select(
            *state.columns,
            F.lit("insert").alias("_change_type"),
            F.lit(to).alias("_commit_version"),
        )
    else:
        # the span's manifests must still exist: table_changes reads
        # from_version itself (the base state) onward
        if not f.exists(_manifest_path(src_path, last)):
            raise FeedExpired(
                f"cursor at v{last} but that manifest is expired at "
                f"{src_path!r}; re-bootstrap the consumer from snap_read "
                "and reset the cursor to the bootstrapped version"
            )
        changes = table_changes(
            spark, src_path, keys, from_version=last, to_version=to, fs=fs
        )

    def ack() -> int:
        # monotone by construction: a distinct create-exclusive marker
        # per acked version — no read-check-write window, so racing or
        # superseded consumers can only ADD markers, never regress max
        f.makedirs(cursor_path)
        try:
            f.create_exclusive(
                os.path.join(cursor_path, f"ack-v{to}"), ""
            )
        except FileExistsError:
            pass  # this span was already acked — idempotent
        pos = feed_position(cursor_path, fs)
        # opportunistic prune: non-max markers can't change the max,
        # so removing old ones (keeping a trailing window) is safe
        for n in f.listdir(cursor_path):
            if n.startswith("ack-v") and int(n[5:]) < pos - 8:
                try:
                    f.remove(os.path.join(cursor_path, n))
                except OSError:
                    pass
        return pos

    return {"changes": changes, "from": last, "to": to, "ack": ack}
