"""Snapshot write / time-travel read (operators/versioning.py): pinned
versions stay byte-identical, the pointer commit is atomic, retention is
explicit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hive_release_spark.operators import versioning as V


def test_snapshot_write_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "ds")
    df1 = spark.range(0, 5).select("id", F.lit("a").alias("tag"))
    df2 = spark.range(0, 3).select("id", F.lit("b").alias("tag"))

    assert V.snapshot_write(df1, t) == 1
    assert V.snapshot_write(df2, t) == 2
    assert V.list_snapshots(t) == [1, 2]
    assert V.latest_snapshot(t) == 2

    latest = V.read_snapshot(spark, t)
    assert {r.tag for r in latest.collect()} == {"b"} and latest.count() == 3

    pinned = V.read_snapshot(spark, t, version=1)
    assert {r.tag for r in pinned.collect()} == {"a"} and pinned.count() == 5


def test_snapshot_dirs_are_immutable(spark, tmp_path):
    """A snapshot write must never overwrite an existing version dir —
    mode('error') guards the invariant even if the pointer is stale."""
    t = str(tmp_path / "ds")
    V.snapshot_write(spark.range(0, 2), t)
    # simulate a stale/lost pointer pointing before an existing dir
    with open(os.path.join(t, "_LATEST"), "w") as fh:
        fh.write("0")
    # next write recomputes from the pointer (0) -> v1 exists -> must fail
    with pytest.raises(Exception):
        V.snapshot_write(spark.range(0, 2), t)


def test_read_missing_snapshot_raises(spark, tmp_path):
    t = str(tmp_path / "ds")
    V.snapshot_write(spark.range(0, 2), t)
    with pytest.raises(FileNotFoundError):
        V.read_snapshot(spark, t, version=9)


def test_expire_keeps_recent_and_latest(spark, tmp_path):
    t = str(tmp_path / "ds")
    for i in range(4):
        V.snapshot_write(spark.range(0, i + 1), t)
    expired = V.expire_snapshots(t, keep_last=2)
    assert expired == [1, 2]
    assert V.list_snapshots(t) == [3, 4]
    assert V.read_snapshot(spark, t, version=3).count() == 3
