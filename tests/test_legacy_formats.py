"""SequenceFile / RCFile legacy ingest (SURVEY.md §2.G — closes the
VERDICT r7 "What's missing" #3 row).

SequenceFile runs on any session (Hadoop-core IO). RCFile rides
Spark's built-in Hive SerDe through STORED AS RCFILE tables, which
need a Hive-catalog session — catalogImplementation is fixed per JVM,
so that path (plus the SequenceFile byte-compat proof against Hive's
own LazySimpleSerDe) runs in a subprocess with its own SparkSession.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import textwrap

from pyspark.sql import Row

from hive_release_spark.sources.formats import (
    read_sequencefile,
    require_hive_catalog,
    write_sequencefile,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sequencefile_roundtrip_typed_with_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(id=1, name="alice", score=2.5, ok=True),
            Row(id=2, name=None, score=3.25, ok=False),
            Row(id=3, name="carol", score=None, ok=None),
        ]
    )
    path = str(tmp_path / "seq")
    write_sequencefile(df, path)
    back = read_sequencefile(
        spark, path, "id INT, name STRING, score DOUBLE, ok BOOLEAN"
    )
    assert back.schema.simpleString() == (
        "struct<id:int,name:string,score:double,ok:boolean>"
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_sequencefile_null_does_not_shift_columns(spark, tmp_path):
    """concat_ws silently drops nulls; the writer must emit the \\N
    sentinel instead or every field right of a NULL lands in the wrong
    column."""
    df = spark.createDataFrame(
        [(None, "keep", 7)], "a STRING, b STRING, c INT"
    )
    path = str(tmp_path / "seq_shift")
    write_sequencefile(df, path)
    row = read_sequencefile(spark, path, "a STRING, b STRING, c INT").first()
    assert row.a is None and row.b == "keep" and row.c == 7


def test_sequencefile_ignores_key_class(spark, tmp_path):
    """Hive writes BytesWritable keys; this module writes Text keys.
    The reader takes values() so both layouts read identically."""
    path = str(tmp_path / "seq_byteskey")
    spark.sparkContext.parallelize(
        [(bytearray(b""), "9\x01hive-style")], 1
    ).saveAsSequenceFile(path)
    row = read_sequencefile(spark, path, "id INT, tag STRING").first()
    assert (row.id, row.tag) == (9, "hive-style")


def test_sequencefile_roundtrips_a_real_table(spark, tmp_path):
    """Migration-shaped check: a TPC-H slice (bigint/int/double/date/
    string columns) survives the SequenceFile text layout byte-exactly."""
    from hive_release_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_shipdate", "l_returnflag",
    )
    path = str(tmp_path / "seq_lineitem")
    write_sequencefile(li, path)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in li.schema.fields
    )
    back = read_sequencefile(spark, path, ddl)
    assert back.count() == li.count()
    assert back.dtypes == li.dtypes
    # multiset compare: (l_orderkey, l_linenumber) is NOT unique in the
    # fixture, so sort whole-row tuples
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        map(tuple, li.collect()), key=str
    )


def test_sequencefile_rejects_colliding_serde_params(spark, tmp_path):
    """The nested-collection sentinels are fixed at \\x02/\\x03/\\N
    (ADVICE r8-3): a sep equal to a nested delimiter or a custom
    null_value combined with nested columns must fail loudly instead
    of writing silently corrupt / mixed-sentinel files."""
    import pytest

    nested = spark.createDataFrame(
        [(1, ["a", "b"])], "id INT, tags ARRAY<STRING>"
    )
    flat = spark.createDataFrame([(1, "x")], "id INT, s STRING")
    with pytest.raises(ValueError, match="nested-collection delimiters"):
        write_sequencefile(nested, str(tmp_path / "x1"), sep="\x02")
    with pytest.raises(ValueError, match="mixed-sentinel"):
        write_sequencefile(nested, str(tmp_path / "x2"), null_value="NULL")
    with pytest.raises(ValueError, match="nested-collection delimiters"):
        read_sequencefile(
            spark, str(tmp_path / "x3"), "id INT, tags ARRAY<STRING>",
            sep="\x03",
        )
    # flat schemas keep the full customization surface
    p = str(tmp_path / "flat_custom")
    write_sequencefile(flat, p, sep="\t", null_value="NULL")
    row = read_sequencefile(
        spark, p, "id INT, s STRING", sep="\t", null_value="NULL"
    ).first()
    assert (row.id, row.s) == (1, "x")


def test_rcfile_requires_hive_catalog(spark):
    import pytest

    with pytest.raises(RuntimeError, match="Hive-catalog session"):
        require_hive_catalog(spark)


def test_rcfile_and_hive_serde_compat_in_subprocess(tmp_path):
    """In a fresh Hive-catalog JVM: (1) RCFile write+read roundtrip
    through STORED AS RCFILE; (2) byte-compat BOTH ways for the native
    SequenceFile writer/reader vs Hive's LazySimpleSerDe — Hive reads
    our files, we read Hive's."""
    seq_native = str(tmp_path / "seq_native")
    work = str(tmp_path / "hivework")
    script = textwrap.dedent(
        f"""
        import os, sys
        sys.path.insert(0, {REPO!r})
        os.makedirs({work!r}, exist_ok=True)
        os.chdir({work!r})
        from pyspark.sql import Row, SparkSession
        from hive_release_spark.sources.formats import (
            read_avro_table, read_rcfile_table, read_sequencefile,
            write_avro_table, write_rcfile_table, write_sequencefile,
        )
        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.sql.warehouse.dir", os.path.join({work!r}, "wh"))
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .enableHiveSupport()
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        # explicit schema: Avro resolves reader-vs-writer schemas by
        # Avro rules (no long->int narrowing), so the declared read
        # schema must match what the writer table declared
        df = spark.createDataFrame(
            [(1, "alice", 2.5, ["a", "b"]), (2, None, 3.25, ["c"])],
            "id INT, name STRING, score DOUBLE, tags ARRAY<STRING>",
        )
        SCHEMA = "id INT, name STRING, score DOUBLE, tags ARRAY<STRING>"

        # 1) RCFile roundtrip via the Hive SerDe
        rc_path = os.path.join({work!r}, "rc_data")
        write_rcfile_table(df, "rc_w", rc_path)
        back = read_rcfile_table(
            spark, rc_path, SCHEMA, "rc_r"
        )
        assert sorted(back.collect()) == sorted(df.collect()), "rcfile"

        # 1a) existing-table guard (ADVICE r8-1): an identical re-read
        # reuses the verified table; a mismatched location or schema
        # raises instead of silently binding to the OLD table's data;
        # a re-WRITE with matching args appends (idempotent create)
        again = read_rcfile_table(spark, rc_path, SCHEMA, "rc_r")
        assert sorted(again.collect()) == sorted(df.collect()), "reread"
        other_path = os.path.join({work!r}, "rc_other")
        write_rcfile_table(df, "rc_other", other_path)
        try:
            read_rcfile_table(spark, other_path, SCHEMA, "rc_r")
            raise AssertionError("location mismatch not caught")
        except ValueError as e:
            assert "location" in str(e), e
        try:
            read_rcfile_table(
                spark, rc_path, "id INT, name STRING", "rc_r"
            )
            raise AssertionError("schema mismatch not caught")
        except ValueError as e:
            assert "schema" in str(e), e
        n_before = spark.table("rc_w").count()
        write_rcfile_table(df, "rc_w", rc_path)  # rerun: appends, no raise
        assert spark.table("rc_w").count() == 2 * n_before, "rerun append"

        # 1b) Avro roundtrip via Hive AvroSerDe (no spark-avro jar on
        # this classpath — VERDICT r7 "missing #1" now has a working
        # route) and the files are genuine Avro containers
        av_path = os.path.join({work!r}, "avro_data")
        write_avro_table(df, "av_w", av_path)
        av_back = read_avro_table(
            spark, av_path, SCHEMA, "av_r"
        )
        assert sorted(av_back.collect()) == sorted(df.collect()), "avro"
        import glob
        with open(sorted(glob.glob(av_path + "/part-*"))[0], "rb") as f:
            assert f.read(4) == b"Obj\\x01", "not an Avro container"

        # 2a) Hive's LazySimpleSerDe reads the NATIVE writer's files
        write_sequencefile(df, {seq_native!r})
        spark.sql(
            "CREATE EXTERNAL TABLE seq_ext (" + SCHEMA + ") STORED AS SEQUENCEFILE LOCATION '"
            + {seq_native!r} + "'"
        )
        assert sorted(spark.table("seq_ext").collect()) == sorted(
            df.collect()
        ), "hive reads native seq"

        # 2b) the native reader reads HIVE-written SequenceFile data
        seq_hive = os.path.join({work!r}, "seq_hive")
        spark.sql(
            "CREATE EXTERNAL TABLE seq_hw (" + SCHEMA + ") STORED AS SEQUENCEFILE LOCATION '" + seq_hive + "'"
        )
        df.write.mode("append").insertInto("seq_hw")
        got = read_sequencefile(spark, seq_hive, SCHEMA)
        assert sorted(got.collect()) == sorted(df.collect()), "native reads hive seq"
        print("LEGACY_FORMATS_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
    )
    assert "LEGACY_FORMATS_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
