"""WebDataset tar shard sink: deterministic placement, deterministic
bytes, read-back fidelity, atomic publish, and manifest accuracy.
"""

from __future__ import annotations

import hashlib
import io
import tarfile

from synthea_etl_spark.operators.shards import (
    _build_tar,
    write_webdataset_shards,
)


def _read_members(path):
    with tarfile.open(path) as tar:
        return {
            m.name: (tar.extractfile(m).read(), m.mtime, m.uid, m.gid)
            for m in tar.getmembers()
        }


def test_build_tar_is_deterministic_and_sorted():
    rows = [(5, b"five"), (1, b"one"), (3, b"three")]
    a = _build_tar(rows)
    b = _build_tar(list(reversed(rows)))  # input order must not matter
    assert a == b
    names = [m.name for m in tarfile.open(fileobj=io.BytesIO(a)).getmembers()]
    assert names == ["000000000001.bin", "000000000003.bin", "000000000005.bin"]


def test_shard_write_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    rows = [(i, bytes([i % 251]) * (i + 1)) for i in range(25)]
    df = spark.createDataFrame(rows, "id long, payload binary").repartition(4)

    manifest = {
        r.shard_id: r
        for r in write_webdataset_shards(df, out, docs_per_shard=10).collect()
    }
    # placement is id//10, independent of the 4-way partitioning
    assert set(manifest) == {0, 1, 2}
    assert [manifest[s].n_docs for s in (0, 1, 2)] == [10, 10, 5]
    assert manifest[0].payload_bytes == sum(i + 1 for i in range(10))

    # read back: every sample lands in its deterministic shard with
    # exact bytes and zeroed metadata
    members = _read_members(f"{out}/shard-000000001.tar")
    assert sorted(members) == [f"{i:012d}.bin" for i in range(10, 20)]
    payload, mtime, uid, gid = members["000000000013.bin"]
    assert payload == bytes([13]) * 14 and (mtime, uid, gid) == (0, 0, 0)

    # manifest sha matches the bytes on disk
    blob = open(f"{out}/shard-000000001.tar", "rb").read()
    assert hashlib.sha256(blob).hexdigest() == manifest[1].tar_sha256


def test_shard_bytes_stable_across_runs_and_partitionings(spark, tmp_path):
    rows = [(i, f"doc-{i}".encode()) for i in range(30)]
    shas = []
    for n_part, sub in ((2, "a"), (7, "b")):
        out = str(tmp_path / sub)
        df = spark.createDataFrame(rows, "id long, payload binary").repartition(
            n_part
        )
        m = write_webdataset_shards(df, out, docs_per_shard=8).collect()
        shas.append(sorted((r.shard_id, r.tar_sha256) for r in m))
    # identical corpus => identical shard set and identical tar bytes,
    # regardless of input partitioning (re-run convergence)
    assert shas[0] == shas[1]


def test_rerun_overwrites_to_same_bytes(spark, tmp_path):
    out = str(tmp_path / "shards")
    rows = [(i, b"x" * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    m1 = write_webdataset_shards(df, out, docs_per_shard=8).collect()
    blob1 = open(f"{out}/shard-000000000.tar", "rb").read()
    m2 = write_webdataset_shards(df, out, docs_per_shard=8).collect()
    blob2 = open(f"{out}/shard-000000000.tar", "rb").read()
    assert blob1 == blob2
    assert m1[0].tar_sha256 == m2[0].tar_sha256
    # no leftover temp files from the atomic-rename publish
    leftovers = [p for p in (tmp_path / "shards").iterdir() if ".tmp" in p.name]
    assert leftovers == []
