"""A custom Spark DATA SOURCE for WARC.gz archives — the Spark 4
Python Data Source API (`pyspark.sql.datasource`), so crawl shards
read as first-class tables: ``spark.read.format("warc").load(dir)``.

Beyond-reference surface (the reference's only sources are CSV and
parquet readers on Glue; builder's-brief LLM-pipeline scope). Public
knowledge only: the documented pyspark DataSource/DataSourceReader/
InputPartition protocol and the ISO 28500 WARC format (parsing
delegated to operators/warc.parse_warc_gz — the same strict,
bomb-capped record splitter the q143 gate certifies).

Scale design: one InputPartition PER FILE (the natural split for
gzip-member archives — members aren't seekable mid-stream, files
are), so a directory of shards reads with file-level parallelism and
executor-side parsing; the driver only lists paths. Schema is fixed
and matches operators/warc.warc_records minus the per-doc id:
(path, record_idx, n_records, warc_type, target_uri, content_length,
payload_text).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_idx", IntegerType()),
        StructField("n_records", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("content_length", IntegerType()),
        StructField("payload_text", StringType()),
    ]
)


class _WarcPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _committed_shards(dirpath: str) -> set[str] | None:
    """Union of shard basenames across every manifest in ``dirpath``
    (per-job ``_MANIFEST-<token>`` files plus the legacy single
    ``_MANIFEST``), or None when no manifest exists (a foreign-written
    landing directory has no commit protocol — read everything).
    Per-job manifests make appends race-free: each job publishes its
    own file with one atomic rename, no read-modify-write."""
    import json
    import os

    names = [
        f
        for f in os.listdir(dirpath)
        if (f == "_MANIFEST" or f.startswith("_MANIFEST-"))
        and not f.endswith(".tmp")
    ]
    if not names:
        return None
    committed: set[str] = set()
    for name in names:
        try:
            with open(os.path.join(dirpath, name)) as fh:
                committed.update(e["path"] for e in json.load(fh))
        except (OSError, ValueError):
            continue  # torn concurrent replace: skip, not crash
    return committed


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs a path")

    def partitions(self):
        import os

        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".warc.gz", ".warc"))
            )
            # When the directory was produced by the WARC writer, its
            # per-job manifests are the commit markers: only shards
            # some manifest lists are committed data. Task files
            # published before a driver death, or leftovers of an
            # earlier job, are on disk but NOT in any manifest — skip
            # them instead of silently reading them back as records.
            committed = _committed_shards(self.path)
            if committed is not None:
                # A manifest exists, so the directory IS a committed
                # dataset: an empty committed set (a legitimately
                # committed zero-partition write, or a directory whose
                # only .warc files are uncommitted leftovers of a dead
                # job) means ZERO rows, not an error.
                return [
                    _WarcPartition(p)
                    for p in files
                    if os.path.basename(p) in committed
                ]
        else:
            files = [self.path]
        if not files:
            # reserved for paths with no manifests AND no files — a
            # typo'd path, not an empty committed dataset
            raise ValueError(f"no WARC files under {self.path}")
        return [_WarcPartition(p) for p in files]

    def read(self, partition: _WarcPartition):
        # runs on executors: parse one archive, yield one row per
        # record (malformed archives yield a single null-record row —
        # the same degradation contract as warc_records)
        from synthea_etl_spark.operators.warc import parse_warc_gz

        with open(partition.path, "rb") as fh:
            blob = fh.read()
        recs = parse_warc_gz(blob)
        if recs is None:
            yield (partition.path, None, None, None, None, None, None)
            return
        for i, rec in enumerate(recs):
            try:
                text = rec["payload"].decode("utf-8")
            except UnicodeDecodeError:
                text = None
            yield (
                partition.path,
                i,
                len(recs),
                rec["type"],
                rec["uri"],
                rec["content_length"],
                text,
            )


class WarcStreamReader:
    """Streaming half (SimpleDataSourceStreamReader): the offset is
    the sorted list of shard filenames already ingested — each
    micro-batch reads exactly the files that appeared since the last
    committed offset, giving incremental exactly-once crawl
    ingestion with checkpoint replay (the engine persists offsets;
    readBetweenOffsets re-serves a prefetched batch after restart)."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs a path")
        # Bound how many shard files one micro-batch may ingest (0 =
        # unbounded). Without this, a backlog of 10^6 shards on first
        # start would land in a single giant batch; with it, a drain
        # (e.g. Trigger.AvailableNow) walks the backlog in bounded
        # batches, each with its own committed offset.
        self.max_shards = int(options.get("maxShardsPerBatch", 0) or 0)
        if self.max_shards < 0:
            raise ValueError("maxShardsPerBatch must be >= 0")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _list(self) -> list[str]:
        import os

        names = sorted(
            f for f in os.listdir(self.path)
            if f.endswith((".warc.gz", ".warc"))
        )
        # same commit protocol as the batch reader: when manifests
        # exist, uncommitted task files (a writer mid-job or one that
        # later aborts) must not be streamed; a foreign landing dir
        # with no manifest has no protocol and streams everything
        committed = _committed_shards(self.path)
        if committed is not None:
            names = [n for n in names if n in committed]
        return names

    def _rows_for(self, names: list[str]):
        import os

        from synthea_etl_spark.operators.warc import parse_warc_gz

        for name in names:
            full = os.path.join(self.path, name)
            with open(full, "rb") as fh:
                recs = parse_warc_gz(fh.read())
            if recs is None:
                yield (full, None, None, None, None, None, None)
                continue
            for i, rec in enumerate(recs):
                try:
                    text = rec["payload"].decode("utf-8")
                except UnicodeDecodeError:
                    text = None
                yield (
                    full, i, len(recs), rec["type"], rec["uri"],
                    rec["content_length"], text,
                )

    def read(self, start: dict):
        # the engine contract wants an ITERATOR (it prefetches lazily
        # and caches per offset range), plus the new end offset
        seen = set(start.get("seen", []))
        now = self._list()
        new = [n for n in now if n not in seen]
        if self.max_shards and len(new) > self.max_shards:
            new = new[: self.max_shards]
        # the end offset advances ONLY past the shards this batch
        # actually takes, so a bounded batch leaves the rest for the
        # next read() instead of silently skipping them
        end = {"seen": sorted(seen | set(new))}
        return (iter(list(self._rows_for(new))), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("seen", []))
        names = [n for n in end.get("seen", []) if n not in seen]
        return iter(list(self._rows_for(names)))

    def commit(self, end: dict) -> None:
        pass  # offsets are checkpointed by the engine; nothing to clean


@dataclass
class _WarcWriteCommit(WriterCommitMessage):
    path: str
    n_records: int


class WarcDataSourceWriter(DataSourceWriter):
    """Writer half: each task writes its partition as ONE .warc.gz
    shard (a temp file renamed into place on task success — the usual
    task-level atomicity), and the driver-side commit writes a
    _MANIFEST listing every shard with its record count — the
    job-level all-or-nothing marker the batch reader keys on (shards
    on disk but absent from the manifest are uncommitted and skipped
    on read). Shard names carry a per-job token so append jobs never
    collide; readers union all per-job manifests, and append jobs
    publish only their own (the union happens at read time in
    ``_committed_shards`` — commit() never merges files). Overwrite
    commits additionally delete shards and manifests of generations
    committed BEFORE this job started (last-wins); shards/manifests
    younger than the overwrite job's start are left alone so a
    concurrent append that published part files but not yet its
    manifest is not destroyed. Between an overwrite's manifest
    publish and its cleanup, readers may transiently observe both
    generations — the documented cost of lock-free last-wins. Two
    CONCURRENT overwrites resolve deterministically: each publishes
    _MANIFEST-OVR-<start_ns>-<token>, the lexicographically largest
    name wins, and both jobs compute the same winner from filenames
    alone (the later cleaner deletes the loser's generation; a loser
    that commits after the winner retires its own). Input rows need
    (target_uri, payload_text | payload binary, warc_type?)."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        import time
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink needs a path")
        self.overwrite = overwrite
        # one token per job, minted on the driver and shipped in the
        # pickled writer, so concurrent/successive appends can't
        # publish over each other's part files
        self.job_token = uuid.uuid4().hex[:12]
        # driver-side job start: overwrite cleanup only removes files
        # older than this, so a concurrent append's freshly-published
        # shards survive until its own manifest lands
        self.job_start = time.time()
        # snapshot the manifests already committed when this job
        # begins: exactly these are "prior generations" an overwrite
        # replaces. A manifest that appears AFTER this point belongs
        # to a concurrent append committing during our run — mtime
        # can't separate "committed 0.5 s before us" from "committed
        # during us" under fs-timestamp slack, but set membership can.
        import os

        self.preexisting_manifests: set[str] = set()
        if overwrite and os.path.isdir(self.path):
            self.preexisting_manifests = {
                f
                for f in os.listdir(self.path)
                if (f == "_MANIFEST" or f.startswith("_MANIFEST-"))
                and not f.endswith(".tmp")
            }
        # Overwrite jobs publish under _MANIFEST-OVR-<start_ns>-<token>
        # so two CONCURRENT overwrites can deterministically pick one
        # winner (largest (start_ns, token) string wins — both jobs
        # compute the same order from filenames alone, no coordination).
        # Append manifests keep the plain _MANIFEST-<token> name;
        # readers union every _MANIFEST* either way.
        if overwrite:
            self.manifest_name = (
                f"_MANIFEST-OVR-{int(self.job_start * 1e9):020d}"
                f"-{self.job_token}"
            )
        else:
            self.manifest_name = f"_MANIFEST-{self.job_token}"

    def write(self, iterator) -> _WarcWriteCommit:
        import os
        import uuid

        from pyspark import TaskContext

        from synthea_etl_spark.operators.warc import encode_warc_gz

        pid = TaskContext.get().partitionId()
        recs = []
        for row in iterator:
            d = row.asDict()
            payload = d.get("payload")
            if payload is None:
                payload = (d.get("payload_text") or "").encode("utf-8")
            recs.append(
                {
                    "type": d.get("warc_type") or "response",
                    "uri": d.get("target_uri"),
                    "payload": bytes(payload),
                }
            )
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(
            self.path, f"part-{self.job_token}-{pid:05d}.warc.gz"
        )
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(encode_warc_gz(recs))
        os.replace(tmp, final)  # task-level atomic publish
        return _WarcWriteCommit(path=final, n_records=len(recs))

    def commit(self, messages) -> None:
        import json
        import os

        manifest = [
            {"path": os.path.basename(m.path), "n_records": m.n_records}
            for m in messages
        ]
        # PER-JOB manifest, published with one atomic rename: readers
        # union every _MANIFEST* file, so concurrent appends commit
        # independently — no read-modify-write of a shared file to
        # race on (two appends each publish their own manifest; both
        # stay visible regardless of order). Overwrite-vs-concurrent-
        # append is semantically conflicting and stays last-wins.
        mpath = os.path.join(self.path, self.manifest_name)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(sorted(manifest, key=lambda e: e["path"]), fh)
        os.replace(tmp, mpath)  # manifest publish = the commit point
        if self.overwrite:
            # now safe: this job's manifest is live. Superseded
            # manifests (prior committed generations, the legacy
            # shared file) and the shards they list are deleted —
            # overwrite replaces every earlier COMMIT, last-wins.
            # UNLISTED shards get a grace window: one younger than
            # this job's start belongs to a job still running
            # concurrently — deleting its published-but-not-yet-
            # committed part files would leave its future manifest
            # pointing at nothing (silent data loss in the
            # overwrite-vs-append race). Old unlisted shards are
            # dead-driver leftovers and go too. A surviving young
            # shard whose job never commits stays invisible to
            # readers (manifest-gated) — disk garbage, not data.
            keep = {e["path"] for e in manifest}
            cutoff = self.job_start - 1.0  # fs-timestamp granularity
            # Prior-vs-concurrent for MANIFESTS is decided by set
            # membership, not mtime: exactly the manifests committed
            # BEFORE this job started (snapshotted in __init__) are
            # the generations last-wins replaces. A manifest that
            # appeared since belongs to a concurrent append committing
            # during our run — it survives, and every shard it lists
            # is that job's live data regardless of shard mtime (a
            # long-running append's shards can predate our start).
            prior_listed: set[str] = set()
            concurrent_listed: set[str] = set()
            # Concurrent OVERWRITE-vs-OVERWRITE is resolved by a
            # deterministic tie-break both jobs compute identically
            # from manifest filenames: _MANIFEST-OVR-<start_ns>-<token>
            # orders lexicographically, largest wins. The loser's
            # generation is deleted by whichever job cleans up later
            # (winner deletes loser's manifest+shards; a loser that
            # commits after the winner deletes its OWN generation).
            losing_ovr: set[str] = set()  # losing overwrite manifests
            losing_listed: set[str] = set()  # ...and their shards
            self_loses = False
            own_name = os.path.basename(mpath)
            for name in os.listdir(self.path):
                is_manifest = name == "_MANIFEST" or (
                    name.startswith("_MANIFEST-")
                    and not name.endswith(".tmp")
                )
                if not is_manifest or name == own_name:
                    continue
                try:
                    with open(os.path.join(self.path, name)) as fh:
                        listed = {e["path"] for e in json.load(fh)}
                except (OSError, ValueError):
                    continue  # torn concurrent replace: leave it
                if name in self.preexisting_manifests:
                    prior_listed.update(listed)
                elif name.startswith("_MANIFEST-OVR-"):
                    # concurrent overwrite generation: tie-break
                    if name < own_name:
                        losing_ovr.add(name)
                        losing_listed.update(listed)
                    else:
                        self_loses = True
                        concurrent_listed.update(listed)
                else:
                    concurrent_listed.update(listed)
            superseded = (prior_listed | losing_listed) - keep
            for f in os.listdir(self.path):
                stale_manifest = (
                    f == "_MANIFEST"
                    or (f.startswith("_MANIFEST-") and f != own_name)
                )
                stale_shard = (
                    f.endswith((".warc.gz", ".warc")) and f not in keep
                )
                if not (stale_manifest or stale_shard):
                    continue
                full = os.path.join(self.path, f)
                try:
                    if (
                        stale_manifest
                        and f not in self.preexisting_manifests
                        and f not in losing_ovr
                    ):
                        continue  # concurrent job's commit — keep it
                    if stale_shard and f in concurrent_listed:
                        continue  # claimed by a concurrent commit
                    if (
                        stale_shard
                        and f not in superseded
                        and os.path.getmtime(full) >= cutoff
                    ):
                        continue  # concurrent job's in-flight shard
                    os.remove(full)
                except OSError:
                    continue  # already gone (another cleaner won)
            if self_loses:
                # a concurrent overwrite with a larger tie-break key
                # committed during our run: last-wins resolves to it,
                # so this job's generation self-retires (both jobs
                # agree on the winner from filenames alone)
                for f in list(keep) + [own_name]:
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        continue

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class WarcDataSource(DataSource):
    """``spark.dataSource.register(WarcDataSource)`` then
    ``spark.read.format("warc").load(path)`` for batch,
    ``spark.readStream.format("warc").load(path)`` for incremental
    micro-batch ingestion of a landing directory, or
    ``df.write.format("warc").mode(...).save(path)`` to re-shard a
    corpus back into WARC."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcDataSourceReader:
        return WarcDataSourceReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> WarcStreamReader:
        return WarcStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcDataSourceWriter:
        return WarcDataSourceWriter(self.options, overwrite)
