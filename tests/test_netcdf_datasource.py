"""Spark 4 Python DataSource for NetCDF3 (sources/netcdf_ds.py): the
distributed scan path must equal the driver-side group read exactly, one
input partition per file, both layouts, and option validation."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from seaexplorertools_spark.sources.netcdf_ds import NetCDF3DataSource

from test_sources import _write_ad2cp_fixture


@pytest.fixture()
def mission(tmp_path):
    all_t, all_v, bt_t = _write_ad2cp_fixture(str(tmp_path))
    return str(tmp_path), all_t, all_v, bt_t


def test_ping_layout_matches_groups(spark, mission):
    tmp, all_t, _, _ = mission
    spark.dataSource.register(NetCDF3DataSource)
    df = (
        spark.read.format("netcdf3")
        .option("group", "Data/Average")
        .option("layout", "ping")
        .load(f"{tmp}/mission_*.nc")
    )
    # inferred schema: time_us + sorted 1-D vars as double
    assert df.columns[0] == "time_us"
    assert "Pressure" in df.columns and "Pitch" in df.columns
    assert "VelocityBeam1" not in df.columns  # 2-D, wrong layout
    rows = df.orderBy("time_us").collect()
    assert [r["time_us"] for r in rows] == sorted(all_t.astype(np.int64))
    # distributed: one partition per file
    assert df.rdd.getNumPartitions() == 2


def test_cells_layout_matches_groups(spark, mission):
    tmp, all_t, all_v, _ = mission
    spark.dataSource.register(NetCDF3DataSource)
    df = (
        spark.read.format("netcdf3")
        .option("group", "Data/Average")
        .option("layout", "cells")
        .load(f"{tmp}/mission_*.nc")
    )
    assert df.columns[:2] == ["time_us", "bin"]
    got = {
        (r["time_us"], r["bin"]): r["VelocityBeam1"]
        for r in df.collect()
    }
    n_bins = all_v.shape[1]
    assert len(got) == len(all_t) * n_bins
    for i, t in enumerate(all_t.astype(np.int64)):
        for b in range(n_bins):
            assert got[(t, b)] == pytest.approx(all_v[i, b] + 1, rel=1e-12)


def test_bt_group_and_validation(spark, mission):
    tmp, _, _, bt_t = mission
    spark.dataSource.register(NetCDF3DataSource)
    bt = (
        spark.read.format("netcdf3")
        .option("group", "Data/AverageBT")
        .load(f"{tmp}/mission_0.nc")
    )
    assert sorted(r["time_us"] for r in bt.collect()) == sorted(bt_t.astype(np.int64))
    with pytest.raises(Exception):
        spark.read.format("netcdf3").option("layout", "nope").load(
            f"{tmp}/mission_0.nc"
        ).schema
    with pytest.raises(Exception):
        spark.read.format("netcdf3").load(f"{tmp}/does_not_exist_*.nc").schema


def test_writer_roundtrip(spark, tmp_path, sf_dir):
    """Distributed NetCDF3 sink: every partition writes its own part
    file, the union of parts equals the DataFrame exactly, _SUCCESS
    lists the parts, and non-numeric columns are rejected."""
    import glob as _glob
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from seaexplorertools_spark.sources.netcdf3 import read_netcdf3

    spark.dataSource.register(NetCDF3DataSource)
    out = str(tmp_path / "nc_out")
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
        .filter(F.col("value").isNotNull())
        .repartition(4)
    )
    df.write.format("netcdf3").mode("append").save(out)

    parts = sorted(_glob.glob(f"{out}/part-*.nc"))
    assert 1 <= len(parts) <= 4
    assert os.path.exists(f"{out}/_SUCCESS")
    listed = set(open(f"{out}/_SUCCESS").read().split())
    assert listed == {os.path.basename(p) for p in parts}

    got = set()
    for p in parts:
        _, vs, _ = read_netcdf3(p)
        assert set(vs) == {"event_id", "user_id", "value"}
        for i in range(len(vs["event_id"])):
            got.add(
                (int(vs["event_id"][i]), int(vs["user_id"][i]), float(vs["value"][i]))
            )
    want = {
        (r["event_id"], r["user_id"], float(r["value"])) for r in df.collect()
    }
    assert got == want

    with pytest.raises(Exception):
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        ).write.format("netcdf3").mode("append").save(str(tmp_path / "bad"))


def test_stream_tail_directory(spark, tmp_path):
    """readStream over a growing mission directory: the first micro-batch
    sees file 0, a file landing later is picked up by the next batch,
    nothing is re-read (offset = processed-file set)."""
    import shutil

    from test_sources import _write_ad2cp_fixture

    stage = tmp_path / "stage"
    stage.mkdir()
    live = tmp_path / "live"
    live.mkdir()
    _write_ad2cp_fixture(str(stage))
    shutil.copy(stage / "mission_0.nc", live / "mission_0.nc")

    spark.dataSource.register(NetCDF3DataSource)
    stream = (
        spark.readStream.format("netcdf3")
        .option("group", "Data/Average")
        .option("layout", "ping")
        .load(f"{live}/mission_*.nc")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("nc_tail")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) n from nc_tail").collect()[0]["n"]
        assert n1 == 6  # file 0: T=6 pings
        shutil.copy(stage / "mission_1.nc", live / "mission_1.nc")
        q.processAllAvailable()
        rows = spark.sql(
            "select time_us, Pressure from nc_tail order by time_us"
        ).collect()
        assert len(rows) == 12  # both files, no re-read of file 0
        assert len({r["time_us"] for r in rows}) == 12
    finally:
        q.stop()


def test_writer_overwrite_and_orphan_sweep(spark, tmp_path, sf_dir):
    """mode('overwrite') clears prior parts; commit()'s orphan sweep is
    scoped to the committing JOB's uuid stamp: a same-job speculative
    leftover is removed, a foreign job's part file is never touched by an
    append commit (concurrent-writer safety), while append keeps prior
    committed parts."""
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path / "ovw")
    spark.dataSource.register(NetCDF3DataSource)
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "value")
        .filter(F.col("value").isNotNull())
        .limit(20)
        .repartition(2)
    )
    df.write.format("netcdf3").mode("append").save(out)
    first_parts = set(_glob.glob(f"{out}/part-*.nc"))
    assert first_parts

    # plant a FOREIGN-job orphan (stamp no append commit will carry):
    # another writer's in-flight part must survive this job's sweep
    foreign = f"{out}/part-99999-deadbeefdeadbeefdeadbeefdeadbeef-feed.nc"
    open(foreign, "wb").write(b"CDF\x01junk")
    # plant a SAME-job zombie: copy a committed part's name with this
    # job's stamp swapped in after the fact is impossible pre-commit, so
    # instead verify the scoped sweep via the glob pattern — a file that
    # matches an actual committed part's job stamp but is unlisted
    df.write.format("netcdf3").mode("append").save(out)
    assert os.path.exists(foreign)  # foreign stamp → never swept by append
    after_append = set(_glob.glob(f"{out}/part-*.nc")) - {foreign}
    assert first_parts <= after_append and len(after_append) > len(first_parts)

    df.write.format("netcdf3").mode("overwrite").save(out)
    after_ovw = set(_glob.glob(f"{out}/part-*.nc"))
    # overwrite clears EVERYTHING prior (committed parts + foreign orphan)
    assert not os.path.exists(foreign)
    assert after_ovw and after_ovw.isdisjoint(after_append)
    listed = set(open(f"{out}/_SUCCESS").read().split())
    assert listed == {os.path.basename(p) for p in after_ovw}


def test_commit_sweep_scoped_to_job_uuid(tmp_path):
    """Direct commit() semantics: a same-job unlisted part (zombie
    speculative attempt) is swept; a foreign job's part and prior
    manifest entries survive."""
    import os

    from pyspark.sql.types import DoubleType, StructField, StructType

    from seaexplorertools_spark.sources.netcdf_ds import (
        NetCDF3Writer,
        _NcCommit,
    )

    out = str(tmp_path / "scoped")
    os.makedirs(out)
    schema = StructType([StructField("v", DoubleType())])
    w = NetCDF3Writer(out, schema, overwrite=False)
    committed = f"part-00000-{w._job_id}-aaaa.nc"
    zombie = f"part-00001-{w._job_id}-bbbb.nc"
    foreign = f"part-00002-{'f' * 32}-cccc.nc"
    prior = f"part-00003-{'e' * 32}-dddd.nc"
    for name in (committed, zombie, foreign, prior):
        open(os.path.join(out, name), "wb").write(b"CDF\x01junk")
    with open(os.path.join(out, "_SUCCESS"), "w") as fh:
        fh.write(prior)  # an earlier job's committed manifest

    w.commit([_NcCommit(filename=committed, n_rows=1)])

    assert os.path.exists(os.path.join(out, committed))
    assert not os.path.exists(os.path.join(out, zombie))  # same job, unlisted
    assert os.path.exists(os.path.join(out, foreign))  # other job: untouched
    assert os.path.exists(os.path.join(out, prior))  # prior manifest entry
    listed = set(open(os.path.join(out, "_SUCCESS")).read().split())
    assert listed == {committed, prior}


def test_stream_offset_survives_lexicographic_inversion(spark, tmp_path):
    """mission_10.nc sorts BEFORE mission_9.nc lexicographically; the
    set-based offset must still read it exactly once and re-read
    nothing."""
    import shutil

    from test_sources import _write_ad2cp_fixture

    stage = tmp_path / "stage2"
    stage.mkdir()
    live = tmp_path / "live2"
    live.mkdir()
    _write_ad2cp_fixture(str(stage))
    # name the first file mission_9 so the later arrival mission_10
    # sorts BEFORE everything already processed
    shutil.copy(stage / "mission_0.nc", live / "mission_9.nc")

    spark.dataSource.register(NetCDF3DataSource)
    stream = (
        spark.readStream.format("netcdf3")
        .option("group", "Data/Average")
        .load(f"{live}/mission_*.nc")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("nc_tail_lex")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select count(*) n from nc_tail_lex").collect()[0]["n"] == 6
        shutil.copy(stage / "mission_1.nc", live / "mission_10.nc")
        q.processAllAvailable()
        rows = spark.sql("select time_us from nc_tail_lex").collect()
        assert len(rows) == 12  # new file read once, old file not re-read
        assert len({r["time_us"] for r in rows}) == 12
    finally:
        q.stop()


def _write_record_dim_mission(tmp: str, n_files: int = 2):
    """ad2cp-shaped files whose time dimension is the RECORD (unlimited)
    dim — the layout real appended missions have (the reference's own
    fixture files are this shape)."""
    from seaexplorertools_spark.sources.netcdf3 import write_netcdf3

    t0 = 1_800_000_000_000_000
    all_t = []
    for fi in range(n_files):
        T, B = 5, 3
        t = t0 + (fi * T + np.arange(T, dtype=np.float64)) * 1e6
        all_t.append(t)
        variables = {
            "Data_Average_time": (("time",), t),
            "Data_Average_Pressure": (("time",), np.linspace(2, 30, T)),
            "Data_Average_Pitch": (("time",), np.full(T, -17.0)),
        }
        for b in (1, 2):
            variables[f"Data_Average_VelocityBeam{b}"] = (
                ("time", "bin"),
                np.arange(T * B, dtype=np.float64).reshape(T, B) / (b + 1.0),
            )
        write_netcdf3(
            f"{tmp}/rec_{fi}.nc", {"time": None, "bin": B}, variables
        )
    return np.concatenate(all_t)


def test_record_dim_batch_scan(spark, tmp_path):
    """Both layouts over record-dimension files: the distributed scan
    decodes interleaved record slabs identically to fixed-dim files."""
    all_t = _write_record_dim_mission(str(tmp_path))
    spark.dataSource.register(NetCDF3DataSource)
    ping = (
        spark.read.format("netcdf3")
        .option("group", "Data/Average")
        .option("layout", "ping")
        .load(f"{tmp_path}/rec_*.nc")
    )
    rows = ping.orderBy("time_us").collect()
    assert [r["time_us"] for r in rows] == sorted(all_t.astype(np.int64))
    assert ping.rdd.getNumPartitions() == 2

    cells = (
        spark.read.format("netcdf3")
        .option("group", "Data/Average")
        .option("layout", "cells")
        .load(f"{tmp_path}/rec_*.nc")
    )
    got = cells.orderBy("time_us", "bin").collect()
    assert len(got) == len(all_t) * 3
    # spot-check the interleaved decode: VelocityBeam1 of file 0 row 2 bin 1
    want = (2 * 3 + 1) / 2.0
    hit = [
        r for r in got
        if r["time_us"] == int(all_t[2]) and r["bin"] == 1
    ]
    assert len(hit) == 1 and hit[0]["VelocityBeam1"] == pytest.approx(want)


def test_record_dim_stream_tail(spark, tmp_path):
    """Streaming tail over a growing RECORD-dim mission directory — the
    file-set offset semantics hold regardless of the on-disk layout."""
    import shutil

    stage = tmp_path / "rstage"
    stage.mkdir()
    live = tmp_path / "rlive"
    live.mkdir()
    _write_record_dim_mission(str(stage))
    shutil.copy(stage / "rec_0.nc", live / "rec_0.nc")

    spark.dataSource.register(NetCDF3DataSource)
    stream = (
        spark.readStream.format("netcdf3")
        .option("group", "Data/Average")
        .option("layout", "ping")
        .load(f"{live}/rec_*.nc")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("nc_rec_tail")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) n from nc_rec_tail").collect()[0]["n"]
        assert n1 == 5
        shutil.copy(stage / "rec_1.nc", live / "rec_1.nc")
        q.processAllAvailable()
        rows = spark.sql(
            "select time_us from nc_rec_tail order by time_us"
        ).collect()
        assert len(rows) == 10 and len({r["time_us"] for r in rows}) == 10
    finally:
        q.stop()
