"""register_hive_udf (SURVEY.md §2.I CREATE FUNCTION [USING JAR]):
real Hive 2.3 UDF/UDAF/UDTF classes from the on-classpath
hive-exec-2.3.10 jar execute through Spark's Hive function bridge —
including reflect2, previously documented as not carried. Needs a
Hive-catalog session (fixed per JVM), hence the subprocess."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_in_memory_catalog_raises_loudly(spark):
    import pytest

    from hive_release_spark.functions.hive import register_hive_udf

    with pytest.raises(RuntimeError, match="Hive-catalog session"):
        register_hive_udf(
            spark,
            "nope",
            "org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper",
        )


def test_real_hive_classes_execute_in_subprocess(tmp_path):
    """UDF (upper), the reflect2 gap, a UDAF (collect_list resolver),
    a UDTF (explode), and the USING JAR clause — all against Hive's
    own 2.3.10 bytecode."""
    work = str(tmp_path / "hivework")
    script = textwrap.dedent(
        f"""
        import os, sys
        sys.path.insert(0, {REPO!r})
        os.makedirs({work!r}, exist_ok=True)
        os.chdir({work!r})
        import glob
        from pyspark.sql import SparkSession
        from hive_release_spark.functions.hive import register_hive_udf
        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.sql.warehouse.dir", os.path.join({work!r}, "wh"))
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .enableHiveSupport()
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        G = "org.apache.hadoop.hive.ql.udf.generic."

        register_hive_udf(spark, "h_upper", G + "GenericUDFUpper")
        assert spark.sql("SELECT h_upper('abc') u").first().u == "ABC"

        register_hive_udf(spark, "h_reflect2", G + "GenericUDFReflect2")
        assert (
            spark.sql("SELECT h_reflect2('hi', 'toUpperCase') r").first().r
            == "HI"
        )

        register_hive_udf(spark, "h_collect", G + "GenericUDAFCollectList")
        row = spark.sql(
            "SELECT h_collect(c) l FROM (SELECT explode(array(1,2,3)) c)"
        ).first()
        assert sorted(row.l) == [1, 2, 3]

        register_hive_udf(spark, "h_explode", G + "GenericUDTFExplode")
        rows = spark.sql(
            "SELECT h_explode(array(7, 8)) AS (x)"
        ).collect()
        assert sorted(r.x for r in rows) == [7, 8]

        # USING JAR: point at the classpath jar that holds the class —
        # exercises the ADD JAR + load path a user's own jar takes
        jar = sorted(glob.glob("/opt/spark/jars/hive-exec-*.jar"))[0]
        register_hive_udf(
            spark, "h_lower", G + "GenericUDFLower", jar="file://" + jar
        )
        assert spark.sql("SELECT h_lower('ABC') l").first().l == "abc"
        print("HIVE_UDF_BRIDGE_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
    )
    assert "HIVE_UDF_BRIDGE_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
