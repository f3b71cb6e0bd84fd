"""Archive ingest: ZIP/TAR member explosion — round-trips across
compression variants, member ordering, hostile/malformed degrade,
bomb-guard caps, and the Spark lanes end-to-end."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import pandas as pd
import pytest

from seaexplorertools_spark.operators.archives import (
    _MAX_MEMBER,
    _tar_members,
    _zip_members,
)


def _mk_zip(members, method=zipfile.ZIP_DEFLATED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, data)
    return buf.getvalue()


def _mk_tar(members, gz=False):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    out = buf.getvalue()
    return gzip.compress(out, mtime=0) if gz else out


MEMBERS = [("a/x.txt", b"hello"), ("a/y.bin", bytes(range(256))), ("z.md", b"")]


@pytest.mark.parametrize("method", [zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED])
def test_zip_roundtrip(method):
    assert _zip_members(_mk_zip(MEMBERS, method)) == MEMBERS


@pytest.mark.parametrize("gz", [False, True])
def test_tar_roundtrip(gz):
    assert _tar_members(_mk_tar(MEMBERS, gz)) == MEMBERS


def test_zip_skips_directories_and_rejects_garbage():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("d/", date_time=(1980, 1, 1, 0, 0, 0)), b"")
        zf.writestr(zipfile.ZipInfo("d/f", date_time=(1980, 1, 1, 0, 0, 0)), b"x")
    assert _zip_members(buf.getvalue()) == [("d/f", b"x")]
    with pytest.raises(Exception):
        _zip_members(b"not a zip at all")


def test_zip_crc_corruption_detected():
    payload = bytearray(_mk_zip([("f", b"A" * 100)], zipfile.ZIP_STORED))
    # flip a data byte (after the local header + name)
    i = payload.find(b"A" * 100)
    payload[i + 5] ^= 0xFF
    with pytest.raises(Exception):
        _zip_members(bytes(payload))


def test_tar_skips_non_regular_and_rejects_garbage():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("dir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        f = tarfile.TarInfo("dir/f")
        f.size = 2
        tf.addfile(f, io.BytesIO(b"ok"))
    assert _tar_members(buf.getvalue()) == [("dir/f", b"ok")]
    with pytest.raises(Exception):
        _tar_members(b"\x00" * 100)


def test_member_cap():
    # a declared size over the cap must refuse before inflating: hand-
    # build the header alone (no body ever materializes)
    big = tarfile.TarInfo("big")
    big.size = _MAX_MEMBER + 1
    header = big.tobuf(tarfile.USTAR_FORMAT)
    with pytest.raises(ValueError):
        _tar_members(header)


def test_spark_lanes(spark):
    """documents_as_zip/tar → records lanes: exact member rows per doc,
    malformed payloads degrade to zero rows without failing the job."""
    from seaexplorertools_spark.operators.archives import (
        documents_as_tar,
        documents_as_zip,
        tar_records,
        zip_records,
    )

    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr")],
        "doc_id long, text string, lang string",
    )
    for adapter, lane in ((documents_as_zip, zip_records), (documents_as_tar, tar_records)):
        rows = sorted(
            lane(adapter(docs)).collect(), key=lambda r: (r["media_id"], r["member_idx"])
        )
        assert [(r["media_id"], r["member_idx"], r["name"], r["text"]) for r in rows] == [
            (1, 0, "doc/1/body.txt", "hello world"),
            (1, 1, "doc/1/meta.txt", "lang=en"),
            (2, 0, "doc/2/body.txt", "bonjour"),
            (2, 1, "doc/2/meta.txt", "lang=fr"),
        ]
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [9, 10], "payload": [b"garbage bytes", None]})
    )
    assert zip_records(mixed).count() == 0
    assert tar_records(mixed).count() == 0
