"""Format roundtrips (SURVEY.md §2.G): parquet/orc/json/csv/delimited/
regex-parsed text + partitioned writes + bucketed tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_release_spark.sources import formats


def _df(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", 3.5)],
        "id BIGINT, name STRING, score DOUBLE",
    )


def _same(a, b, cols=("id", "name", "score")):
    ka = sorted(tuple(r[c] for c in cols) for r in a.collect())
    kb = sorted(tuple(r[c] for c in cols) for r in b.collect())
    return ka == kb


def test_roundtrip_parquet_orc_json(spark, tmp_path):
    df = _df(spark)
    for fmt in ("parquet", "orc", "json"):
        p = str(tmp_path / fmt)
        formats.write_table(df, p, fmt=fmt)
        back = formats.read_table(spark, p, fmt=fmt, schema=df.schema)
        assert _same(df, back), fmt


def test_roundtrip_csv_quoted(spark, tmp_path):
    df = spark.createDataFrame([(1, 'has,comma'), (2, 'has"quote')], "id BIGINT, s STRING")
    p = str(tmp_path / "csv")
    formats.write_table(df, p, fmt="csv", options={"quote": '"', "header": "true"})
    back = formats.read_table(
        spark, p, fmt="csv", schema=df.schema, options={"quote": '"', "header": "true"}
    )
    assert _same(df, back, cols=("id", "s"))


def test_roundtrip_hive_delimited(spark, tmp_path):
    """LazySimpleSerDe ^A-delimited text."""
    df = _df(spark)
    p = str(tmp_path / "delim")
    formats.write_delimited(df, p)
    back = formats.read_delimited(spark, p, df.schema)
    assert _same(df, back)


def test_roundtrip_hive_delimited_nested_collections(spark, tmp_path):
    """LazySimpleSerDe nested-collection delimiters (r8): array items
    join on \\x02, map key/value on \\x03 — Hive's default one-level
    table layout for complex columns in delimited text."""
    df = spark.createDataFrame(
        [
            (1, ["a", "b"], [1, 2, 3], {"x": 1.5, "y": 2.5}),
            (2, ["solo"], [7], {"z": 0.25}),
        ],
        "id INT, tags ARRAY<STRING>, nums ARRAY<INT>, m MAP<STRING, DOUBLE>",
    )
    p = str(tmp_path / "delim_nested")
    formats.write_delimited(df, p)
    back = formats.read_delimited(spark, p, df.schema)
    # nullability flags may differ after transform/cast; types must not
    assert back.schema.simpleString() == df.schema.simpleString()
    got = {r.id: r for r in back.collect()}
    want = {r.id: r for r in df.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k].tags == want[k].tags
        assert got[k].nums == want[k].nums
        assert got[k].m == want[k].m
    # the on-disk bytes really are Hive's layout, not quoted JSON-ish
    raw = formats.read_delimited(
        spark, p, "id INT, tags STRING, nums STRING, m STRING"
    ).filter(F.col("id") == 1).first()
    assert raw.tags == "a\x02b"
    assert raw.nums == "1\x022\x023"
    assert set(raw.m.split("\x02")) == {"x\x031.5", "y\x032.5"}


def test_empty_map_cell_decodes_without_crashing(spark, tmp_path):
    """ADVICE r8-2: an empty raw map cell used to split to [""] and
    feed a null key to map_from_arrays, which hard-fails at read time
    for non-string key types. An empty CELL now decodes as an EMPTY
    map for any key type — the one faithful reading of what the writer
    serialized. Two paths, two outcomes, both pinned:

    * SequenceFile (raw text split — empty fields survive): {} -> {};
    * csv-backed read_delimited (quoting off, so an unquoted empty
      field arrives as NULL before _lazy_serde_in runs): {} -> NULL —
      the top-level empty-vs-null text ambiguity, NOT a crash.
    """
    from hive_release_spark.sources.formats import (
        read_sequencefile,
        write_sequencefile,
    )

    df = spark.createDataFrame(
        [(1, {}, {}), (2, {"a": 1.0}, {7: "x"})],
        "id INT, ms MAP<STRING, DOUBLE>, mi MAP<INT, STRING>",
    )
    seq = str(tmp_path / "seq_empty_map")
    write_sequencefile(df, seq)
    back = {r.id: r for r in read_sequencefile(spark, seq, df.schema).collect()}
    assert back[1].ms == {} and back[1].mi == {}  # int keys: no more crash
    assert back[2].ms == {"a": 1.0} and back[2].mi == {7: "x"}

    p = str(tmp_path / "delim_empty_map")
    formats.write_delimited(df, p)
    dback = {
        r.id: r
        for r in formats.read_delimited(spark, p, df.schema).collect()
    }
    assert dback[1].ms is None and dback[1].mi is None  # csv "" -> NULL
    assert dback[2].ms == {"a": 1.0} and dback[2].mi == {7: "x"}


def test_delimited_binary_column_base64_roundtrip(spark, tmp_path):
    """BINARY columns ride text formats base64-encoded, Hive's
    LazySimpleSerDe behavior — a raw string cast corrupts non-UTF-8
    payloads (the multimodal tables' exact shape)."""
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\xff\xfe\x01junk")), (2, None)],
        "id INT, payload BINARY",
    )
    p = str(tmp_path / "delim_binary")
    formats.write_delimited(df, p)
    back = formats.read_delimited(spark, p, "id INT, payload BINARY")
    got = {r.id: r.payload for r in back.collect()}
    assert bytes(got[1]) == b"\x00\xff\xfe\x01junk"
    assert got[2] is None
    # the bytes on disk are base64 text, not raw binary
    raw = formats.read_delimited(spark, p, "id INT, payload STRING")
    import base64

    enc = {r.id: r.payload for r in raw.collect()}[1]
    assert base64.b64decode(enc) == b"\x00\xff\xfe\x01junk"


def test_delimited_struct_column_roundtrip(spark, tmp_path):
    """Struct columns: fields positional on the level-2 delimiter;
    NULL struct stays NULL (not a struct of sentinels), null FIELDS
    come back null."""
    df = spark.createDataFrame(
        [
            (1, ("alice", 30, 1.5)),
            (2, (None, 40, None)),
            (3, None),
        ],
        "id INT, who STRUCT<name: STRING, age: INT, score: DOUBLE>",
    )
    p = str(tmp_path / "delim_struct")
    formats.write_delimited(df, p)
    back = formats.read_delimited(spark, p, df.schema)
    got = {r.id: r.who for r in back.collect()}
    assert got[1] == ("alice", 30, 1.5)
    assert tuple(got[2]) == (None, 40, None)
    assert got[3] is None


def test_delimited_null_collection_elements_do_not_shift(spark, tmp_path):
    """array_join drops null elements and concat_ws drops null map
    values — both must become the \\N sentinel or everything after a
    null shifts position (the row-level concat_ws trap one level
    down)."""
    df = spark.createDataFrame(
        [(1, ["a", None, "c"], {"k1": None, "k2": 2.0})],
        "id INT, tags ARRAY<STRING>, m MAP<STRING, DOUBLE>",
    )
    p = str(tmp_path / "delim_null_elems")
    formats.write_delimited(df, p)
    row = formats.read_delimited(spark, p, df.schema).first()
    assert row.tags == ["a", None, "c"]
    assert row.m == {"k1": None, "k2": 2.0}


def test_regex_serde(spark, tmp_path):
    """RegexSerDe: schema-on-read over raw lines."""
    p = str(tmp_path / "log")
    spark.createDataFrame(
        [("2024-01-01 INFO started",), ("2024-01-02 WARN slow query",)], "value STRING"
    ).write.text(p)
    parsed = formats.read_regex(
        spark, p, r"^(\S+) (\S+) (.*)$", ["log_date", "level", "msg"]
    )
    got = {r.level for r in parsed.collect()}
    assert got == {"INFO", "WARN"}


def test_partitioned_write_dynamic_overwrite(spark, tmp_path):
    """Dynamic partition overwrite (Hive INSERT OVERWRITE ... PARTITION)."""
    p = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id BIGINT, ds STRING"
    )
    formats.write_table(df, p, partition_by=["ds"])
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        upd = spark.createDataFrame([(99, "2024-01-02")], "id BIGINT, ds STRING")
        upd.write.mode("overwrite").partitionBy("ds").parquet(p)
        # partition values come back type-inferred (dates) — stringify
        got = {(r.id, str(r.ds)) for r in spark.read.parquet(p).collect()}
        # partition 01-01 untouched, 01-02 replaced
        assert got == {(1, "2024-01-01"), (99, "2024-01-02")}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_avro_gated(spark):
    """Avro is an external Spark module; the probe must not blow up.
    In THIS container the spark-avro datasource jar is absent (only core
    avro-*.jar libs ship with Spark), so the gate must trip LOUDLY,
    naming the missing artifact (r01 VERDICT #7: no silent partials). If
    a future environment adds the jar, require_avro becomes a no-op and
    the roundtrip below exercises the real path."""
    import pytest

    if not formats.avro_available(spark):
        with pytest.raises(RuntimeError, match="spark-avro"):
            formats.require_avro(spark)
    else:
        formats.require_avro(spark)
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "a")
            df = spark.range(5)
            formats.write_table(df, p, fmt="avro")
            assert formats.read_table(spark, p, fmt="avro").count() == 5


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Schema evolution across file generations (Hive ALTER TABLE ADD
    COLUMNS over existing partitions — SURVEY.md §2.J/§2.G): old files
    lack the new column; a mergeSchema read unions the schemas and
    back-fills NULL, which is exactly Hive's missing-column read
    semantics. At 100 TB this is the norm, not the edge case."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(0, 3).select(F.col("id"), F.lit("old").alias("v")).write.parquet(p)
    spark.range(3, 5).select(
        F.col("id"), F.lit("new").alias("v"), (F.col("id") * 10).alias("extra")
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "extra"}
    rows = {r.id: (r.v, r.extra) for r in merged.collect()}
    assert rows == {
        0: ("old", None), 1: ("old", None), 2: ("old", None),
        3: ("new", 30), 4: ("new", 40),
    }


def test_csv_malformed_record_tolerance(spark, tmp_path):
    """Hive's LazySimpleSerDe never fails a query on a malformed row — it
    yields NULLs for uncastable fields. Spark's PERMISSIVE mode (default)
    is the same contract, with the corrupt record preserved in a side
    column for auditing; DROPMALFORMED implements Hive's 'skip bad rows'
    ingestion stance. Both arms pinned here."""
    import pyspark.sql.types as T

    p = str(tmp_path / "dirty.csv")
    with open(p, "w") as fh:
        fh.write("1,alpha,10.5\n")
        fh.write("2,beta,not_a_number\n")   # uncastable third field
        fh.write("3,gamma,7.25\n")

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(p)
    )
    rows = {r.id: (r.score, r._corrupt_record) for r in permissive.collect()}
    assert rows[1] == (10.5, None)
    assert rows[3] == (7.25, None)
    assert rows[2][0] is None and "not_a_number" in rows[2][1]

    dropped = (
        spark.read.schema(
            T.StructType(schema.fields[:3])
        ).option("mode", "DROPMALFORMED").csv(p)
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]


def test_parquet_codec_matrix_roundtrips(spark, tmp_path):
    """Every compression codec the deployment might set
    (spark.sql.parquet.compression.codec) must roundtrip losslessly
    and actually produce non-empty, codec-tagged files — a silent
    fallback to uncompressed is a storage-cost regression at 100 TB."""
    import glob
    import os

    from hive_release_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").limit(500)
    expect = sorted(map(tuple, li.collect()))
    for codec, tag in (
        ("snappy", "snappy"),
        ("zstd", "zstd"),
        ("gzip", "gz"),
        ("lz4", "lz4hadoop"),
    ):
        path = str(tmp_path / f"codec_{codec}")
        li.write.mode("overwrite").option("compression", codec).parquet(
            path
        )
        files = glob.glob(os.path.join(path, f"*.{tag}.parquet"))
        assert files, f"no {codec}-tagged parquet files in {path}"
        assert all(os.path.getsize(f) > 0 for f in files)
        back = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert back == expect, f"{codec} roundtrip mismatch"


def test_xml_roundtrip_preserves_rows_and_schema(spark, tmp_path):
    """Spark 4's native XML format: write/read the documents table and
    compare full row sets (ids, text, metadata) — the entry-level
    aggregate gate (source_xml_roundtrip) plus this row-level check
    cover both corruption classes (drops and mangling)."""
    from hive_release_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_xml")
    docs.write.mode("overwrite").format("xml").option(
        "rowTag", "doc"
    ).save(path)
    back = spark.read.format("xml").option("rowTag", "doc").load(path)
    assert sorted(back.columns) == sorted(docs.columns)
    a = sorted(map(tuple, docs.select(*sorted(docs.columns)).collect()))
    b = sorted(map(tuple, back.select(*sorted(docs.columns)).collect()))
    assert a == b
