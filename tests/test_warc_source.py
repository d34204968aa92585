"""Custom Spark DataSource for WARC.gz (the Spark 4 Python Data
Source API): spark.read.format('warc') with one partition per shard
file, executor-side parsing, and the null-degradation contract for
corrupt shards.

Reference scope note: the reference reads only CSV/parquet via Glue;
this is builder's-brief crawl-ingestion surface
(sources/warc_source.py over operators/warc.py).
"""

from __future__ import annotations

import os

from synthea_etl_spark.operators.warc import encode_warc_gz
from synthea_etl_spark.sources.warc_source import WarcDataSource


def _manifest_union(out):
    """All committed (path, n_records) entries across per-job
    manifests — the same union the readers perform."""
    import json

    entries = []
    for p in out.iterdir():
        if p.name.startswith("_MANIFEST") and not p.name.endswith(".tmp"):
            entries.extend(json.loads(p.read_text()))
    return entries


def test_warc_data_source_reads_shards_with_file_parallelism(
    spark, tmp_path
):
    spark.dataSource.register(WarcDataSource)
    d = tmp_path / "crawl"
    d.mkdir()
    for shard in range(3):
        recs = [
            {
                "type": "response",
                "uri": f"http://s{shard}/r{k}",
                "payload": f"shard {shard} rec {k}".encode(),
            }
            for k in range(shard + 1)
        ]
        (d / f"shard{shard}.warc.gz").write_bytes(encode_warc_gz(recs))
    (d / "bad.warc.gz").write_bytes(b"not gzip at all")

    df = spark.read.format("warc").load(str(d))
    assert df.rdd.getNumPartitions() == 4  # one partition per file
    rows = df.collect()
    good = [r for r in rows if r.record_idx is not None]
    bad = [r for r in rows if r.record_idx is None]
    assert len(good) == 6 and len(bad) == 1
    assert {r.target_uri for r in good} == {
        f"http://s{s}/r{k}" for s in range(3) for k in range(s + 1)
    }
    assert bad[0].path.endswith("bad.warc.gz")

    # a registered table: plain SQL over the crawl
    df.createOrReplaceTempView("crawl_src")
    agg = spark.sql(
        "SELECT count(*) c FROM crawl_src WHERE warc_type = 'response'"
    ).collect()[0]
    assert agg.c == 6


def test_warc_data_source_single_file_and_empty_dir(spark, tmp_path):
    spark.dataSource.register(WarcDataSource)
    f = tmp_path / "one.warc.gz"
    f.write_bytes(
        encode_warc_gz([{"uri": "http://x", "payload": b"p"}])
    )
    rows = spark.read.format("warc").load(str(f)).collect()
    assert len(rows) == 1 and rows[0].target_uri == "http://x"

    empty = tmp_path / "none"
    empty.mkdir()
    try:
        spark.read.format("warc").load(str(empty)).collect()
        raised = False
    except Exception:
        raised = True
    assert raised  # no shards is a loud error, not an empty frame


def test_warc_stream_reader_incremental_exactly_once(spark, tmp_path):
    """The streaming half (SimpleDataSourceStreamReader): the offset
    is the ingested-shard list, so each micro-batch reads exactly the
    files that landed since the committed offset. Idle reruns append
    nothing; new shards append exactly their records."""
    spark.dataSource.register(WarcDataSource)
    d = tmp_path / "landing"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    d.mkdir()

    def land(shard, nrec):
        recs = [
            {
                "type": "response",
                "uri": f"http://s{shard}/r{k}",
                "payload": f"{shard}-{k}".encode(),
            }
            for k in range(nrec)
        ]
        (d / f"s{shard}.warc.gz").write_bytes(encode_warc_gz(recs))

    def run_once():
        q = (
            spark.readStream.format("warc")
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land(0, 2)
    land(1, 1)
    run_once()
    assert spark.read.parquet(str(out)).count() == 3
    run_once()  # no new shards -> nothing appended
    assert spark.read.parquet(str(out)).count() == 3
    land(2, 3)
    run_once()
    df = spark.read.parquet(str(out))
    assert df.count() == 6
    assert {r.target_uri for r in df.collect()} == {
        f"http://s{s}/r{k}" for s, n in ((0, 2), (1, 1), (2, 3))
        for k in range(n)
    }


def test_warc_writer_reshards_with_manifest_roundtrip(spark, tmp_path):
    """Writer half: df.write.format('warc') emits one .warc.gz shard
    per partition (temp-file + atomic rename at task level) and a
    driver-committed _MANIFEST with per-shard record counts; reading
    the resharded directory back through the same source recovers
    every record exactly."""
    import json

    spark.dataSource.register(WarcDataSource)
    out = tmp_path / "resharded"
    df = spark.createDataFrame(
        [(f"http://x/{i}", f"doc body {i}", "response") for i in range(20)],
        "target_uri string, payload_text string, warc_type string",
    ).repartition(4)
    df.write.format("warc").mode("append").save(str(out))

    shards = sorted(p.name for p in out.iterdir() if p.suffix == ".gz")
    assert len(shards) == 4 and not any(".tmp" in s for s in shards)
    manifest = sorted(_manifest_union(out), key=lambda e: e["path"])
    assert sum(e["n_records"] for e in manifest) == 20
    assert [e["path"] for e in manifest] == shards

    back = spark.read.format("warc").load(str(out)).collect()
    assert {r.target_uri for r in back} == {f"http://x/{i}" for i in range(20)}
    assert {r.payload_text for r in back} == {f"doc body {i}" for i in range(20)}


def test_warc_manifest_gates_uncommitted_shards(spark, tmp_path):
    """The _MANIFEST is the job-level commit marker: a shard on disk
    but absent from the manifest (task file published before driver
    death, or a prior job's leftover) must NOT be read back."""
    spark.dataSource.register(WarcDataSource)
    out = tmp_path / "committed"
    df = spark.createDataFrame(
        [(f"http://x/{i}", f"body {i}", "response") for i in range(6)],
        "target_uri string, payload_text string, warc_type string",
    ).repartition(2)
    df.write.format("warc").mode("overwrite").save(str(out))

    # simulate a stale shard a dead driver left behind (valid WARC,
    # never committed)
    (out / "part-deadbeef-99999.warc.gz").write_bytes(
        encode_warc_gz([{"uri": "http://stale", "payload": b"stale"}])
    )
    back = spark.read.format("warc").load(str(out)).collect()
    assert {r.target_uri for r in back} == {f"http://x/{i}" for i in range(6)}

    # a directory WITHOUT a manifest still reads everything (landing
    # dirs written by other tools have no commit protocol)
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.warc.gz").write_bytes(
        encode_warc_gz([{"uri": "http://a", "payload": b"a"}])
    )
    rows = spark.read.format("warc").load(str(raw)).collect()
    assert [r.target_uri for r in rows] == ["http://a"]


def test_warc_writer_overwrite_clears_append_merges(spark, tmp_path):
    """mode('overwrite') replaces the committed set (stale shards
    deleted after the manifest swap); mode('append') merges the new
    shards into the existing manifest with collision-free names."""
    import json

    spark.dataSource.register(WarcDataSource)
    out = tmp_path / "lake"

    def write(ids, mode):
        spark.createDataFrame(
            [(f"http://x/{i}", f"body {i}", "response") for i in ids],
            "target_uri string, payload_text string, warc_type string",
        ).repartition(2).write.format("warc").mode(mode).save(str(out))

    write(range(4), "overwrite")
    first = {p.name for p in out.iterdir() if p.suffix == ".gz"}
    write(range(4, 7), "append")
    after_append = {p.name for p in out.iterdir() if p.suffix == ".gz"}
    assert first < after_append and len(after_append) == 4  # no collision
    manifest = _manifest_union(out)
    assert sum(e["n_records"] for e in manifest) == 7
    back = spark.read.format("warc").load(str(out)).collect()
    assert {r.target_uri for r in back} == {f"http://x/{i}" for i in range(7)}

    write(range(100, 102), "overwrite")
    final = {p.name for p in out.iterdir() if p.suffix == ".gz"}
    assert final.isdisjoint(after_append)  # old shards physically gone
    back = spark.read.format("warc").load(str(out)).collect()
    assert {r.target_uri for r in back} == {"http://x/100", "http://x/101"}


def test_warc_stream_bounded_batches_drain_backlog(spark, tmp_path):
    """maxShardsPerBatch bounds each micro-batch; an AvailableNow
    drain over a backlog walks it in multiple committed batches (a
    10^6-shard backlog must not land in one batch), a restart resumes
    mid-drain from the checkpointed offset, and every record arrives
    exactly once."""
    spark.dataSource.register(WarcDataSource)
    d = tmp_path / "landing"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    d.mkdir()
    for shard in range(5):
        recs = [
            {"uri": f"http://s{shard}/r{k}", "payload": f"{shard}-{k}".encode()}
            for k in range(2)
        ]
        (d / f"s{shard}.warc.gz").write_bytes(encode_warc_gz(recs))

    def run_once():
        q = (
            spark.readStream.format("warc")
            .option("maxShardsPerBatch", "2")
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Spark's Python micro-batch stream runs ONE batch per
    # AvailableNow start (it logs a single-batch fallback), so each
    # run here is one bounded batch + restart-from-checkpoint — the
    # drain must make bounded progress each time and finish in
    # ceil(5/2)=3 batches, never one giant one.
    for expected in (4, 8, 10):
        run_once()
        assert spark.read.parquet(str(out)).count() == expected
    run_once()  # drained: an idle run appends nothing
    n_batches = len(
        [f for f in (ck / "commits").iterdir() if not f.name.startswith(".")]
    )
    assert n_batches >= 3  # the backlog was split, not one giant batch
    df = spark.read.parquet(str(out))
    assert df.count() == 10
    assert df.select("target_uri").distinct().count() == 10  # exactly once


def test_warc_concurrent_appends_never_lose_each_other(spark, tmp_path):
    """Per-job manifests make appends race-free: simulate two append
    jobs whose commits interleave (each publishes only its own
    _MANIFEST-<token>) — both stay visible to readers, and a later
    overwrite replaces everything exactly once."""
    spark.dataSource.register(WarcDataSource)
    out = tmp_path / "lake"

    def write(ids, mode):
        spark.createDataFrame(
            [(f"http://x/{i}", f"body {i}", "response") for i in ids],
            "target_uri string, payload_text string, warc_type string",
        ).repartition(1).write.format("warc").mode(mode).save(str(out))

    # two independent append jobs (sequential here, but the commit
    # protocol is order-independent: neither reads the other's state)
    write(range(3), "append")
    write(range(3, 5), "append")
    manifests = [
        p.name for p in out.iterdir() if p.name.startswith("_MANIFEST")
    ]
    assert len(manifests) == 2  # one per job, no shared file
    back = spark.read.format("warc").load(str(out)).collect()
    assert {r.target_uri for r in back} == {f"http://x/{i}" for i in range(5)}

    write([9], "overwrite")
    manifests = [
        p.name for p in out.iterdir() if p.name.startswith("_MANIFEST")
    ]
    assert len(manifests) == 1  # old job manifests cleaned up
    back = spark.read.format("warc").load(str(out)).collect()
    assert {r.target_uri for r in back} == {"http://x/9"}


def test_warc_stream_respects_commit_protocol(spark, tmp_path):
    """When manifests exist, the stream reader serves only committed
    shards (an uncommitted task file is invisible); without any
    manifest a foreign landing dir streams everything."""
    from synthea_etl_spark.sources.warc_source import WarcStreamReader

    d = tmp_path / "lake"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(
        encode_warc_gz([{"uri": "http://a", "payload": b"a"}])
    )
    rdr = WarcStreamReader({"path": str(d)})
    assert rdr._list() == ["a.warc.gz"]  # no manifest: no protocol

    import json

    (d / "_MANIFEST-job1").write_text(
        json.dumps([{"path": "a.warc.gz", "n_records": 1}])
    )
    (d / "uncommitted.warc.gz").write_bytes(
        encode_warc_gz([{"uri": "http://u", "payload": b"u"}])
    )
    assert rdr._list() == ["a.warc.gz"]  # task file not committed


def test_warc_overwrite_spares_concurrent_commit(spark, tmp_path):
    """The overwrite-vs-concurrent-append race at its narrowest: an
    append job COMMITS (manifest + shards) after the overwrite job
    has started but before its cleanup runs. The overwrite must
    delete only generations committed before it started — the
    concurrent append's manifest and shards survive intact (not
    half-erased), even though their mtimes are inside any
    fs-granularity slack around the overwrite's start."""
    import json

    from synthea_etl_spark.sources.warc_source import (
        WarcDataSourceWriter,
        _WarcWriteCommit,
    )

    spark.dataSource.register(WarcDataSource)
    out = tmp_path / "lake"

    # generation 0: a committed prior write the overwrite must replace
    spark.createDataFrame(
        [("http://x/0", "body 0", "response")],
        "target_uri string, payload_text string, warc_type string",
    ).repartition(1).write.format("warc").mode("overwrite").save(str(out))
    prior_manifests = {
        p.name for p in out.iterdir() if p.name.startswith("_MANIFEST")
    }
    assert len(prior_manifests) == 1

    # the overwrite job starts NOW (snapshot taken in __init__) ...
    ow = WarcDataSourceWriter({"path": str(out)}, overwrite=True)
    shard = out / f"part-{ow.job_token}-00000.warc.gz"
    shard.write_bytes(
        encode_warc_gz([{"uri": "http://x/9", "payload": b"body 9"}])
    )

    # ... and a concurrent append commits BETWEEN the overwrite's
    # start and its commit(): manifest + shard land on disk with
    # mtimes inside any slack window around ow.job_start
    cshard = out / "part-concurrent-00000.warc.gz"
    cshard.write_bytes(
        encode_warc_gz([{"uri": "http://c/1", "payload": b"c1"}])
    )
    (out / "_MANIFEST-concurrent").write_text(
        json.dumps([{"path": cshard.name, "n_records": 1}])
    )

    ow.commit([_WarcWriteCommit(path=str(shard), n_records=1)])

    names = {p.name for p in out.iterdir()}
    assert "_MANIFEST-concurrent" in names  # concurrent commit survives
    assert cshard.name in names  # ... with its shard (not half-erased)
    assert prior_manifests.isdisjoint(names)  # prior generation gone
    back = spark.read.format("warc").load(str(out)).collect()
    assert {r.target_uri for r in back} == {"http://x/9", "http://c/1"}


def test_warc_concurrent_overwrites_resolve_to_one_winner(
    spark, tmp_path
):
    """Two CONCURRENT overwrite jobs (both started before either
    committed) must not leave readers unioning both generations:
    the _MANIFEST-OVR-<start_ns>-<token> names give both jobs the
    same deterministic winner (largest name), whichever commits
    last. Exercised in both commit orders."""
    import time

    from synthea_etl_spark.sources.warc_source import (
        WarcDataSourceWriter,
        _WarcWriteCommit,
    )

    spark.dataSource.register(WarcDataSource)

    def run_race(winner_commits_first: bool, out) -> None:
        # generation 0 both overwrites replace
        spark.createDataFrame(
            [("http://x/0", "body 0", "response")],
            "target_uri string, payload_text string, warc_type string",
        ).repartition(1).write.format("warc").mode("overwrite").save(
            str(out)
        )
        a = WarcDataSourceWriter({"path": str(out)}, overwrite=True)
        time.sleep(0.01)  # distinct start_ns => unambiguous order
        b = WarcDataSourceWriter({"path": str(out)}, overwrite=True)
        assert b.manifest_name > a.manifest_name  # b is the winner
        shards = {}
        for job, uri in ((a, "http://job/a"), (b, "http://job/b")):
            s = out / f"part-{job.job_token}-00000.warc.gz"
            s.write_bytes(
                encode_warc_gz([{"uri": uri, "payload": b"p"}])
            )
            shards[job] = s
        order = (b, a) if winner_commits_first else (a, b)
        for job in order:
            job.commit(
                [_WarcWriteCommit(path=str(shards[job]), n_records=1)]
            )
        back = spark.read.format("warc").load(str(out)).collect()
        assert {r.target_uri for r in back} == {"http://job/b"}
        manifests = [
            p.name
            for p in out.iterdir()
            if p.name.startswith("_MANIFEST")
        ]
        assert manifests == [b.manifest_name]

    run_race(False, tmp_path / "loser_last")
    run_race(True, tmp_path / "winner_last")
