"""The Hive 2.3 built-in function surface, Spark-native.

Sources: function names extracted from Hive's FunctionRegistry string
constants (``ql/exec/FunctionRegistry.java``, classes ``ql/udf/*`` +
``ql/udf/generic/*`` — SURVEY.md §2.H). Three tiers:

1. **Same-name**: the name exists in Spark SQL with matching semantics →
   exposed via ``call_function`` (JVM-side, codegen'd).
2. **Renamed/composed**: thin wrappers over Spark builtins (e.g. Hive
   ``ucase``→``upper``, ``div`` integer division, ``mask_first_n``).
3. **Genuine gaps** implemented here: in_file, replicate_rows,
   sort_array_by, UNIONTYPE helpers (SURVEY.md §1.2: Spark encodes
   Hive's UNIONTYPE as struct<tag:int, field0.., field1..>).

Not carried over (documented): ewah_bitmap family (tied to Hive's
removed index feature), get_splits (HS2-internal). ``ngrams``/
``context_ngrams`` live as DataFrame operators in
``hive_release_spark.llm.text`` (Spark has no UDAF extension point in
Python; the operator form is the scale-correct one).

Hive ``CREATE MACRO`` maps to plain Python functions returning Columns;
``CREATE FUNCTION ... USING JAR`` maps to ``spark.udf.register`` /
``spark.sql("CREATE FUNCTION ...")`` which Spark still supports.

Fourth tier (r8): :func:`register_hive_udf` runs REAL Hive 2.3
UDF/UDAF classes — the hive-exec 2.3.10 jar is on this classpath, so
a Hive-catalog session executes the reference's own bytecode
(GenericUDF/GenericUDAFResolver2/GenericUDTF, including ``reflect2``,
previously documented as not carried). A migration user's custom
``CREATE FUNCTION ... USING JAR`` classes load the same way.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under PEP 563
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else (F.lit(x) if not isinstance(x, str) else F.col(x))


def _call(name: str):
    def fn(*args):
        return F.call_function(name, *[_c(a) for a in args])

    fn.__name__ = name
    fn.__doc__ = f"Hive builtin `{name}` → Spark SQL function `{name}` (same name)."
    return fn


# Tier 1 — same name, same semantics in Spark SQL (verified against
# pyspark.sql.functions / Spark SQL function registry).
_SAME_NAME = """
abs acos add_months aes_decrypt aes_encrypt array array_contains ascii asin
assert_true atan avg base64 bin bround cast cbrt ceil ceiling char_length
character_length chr coalesce collect_list collect_set concat concat_ws conv
corr cos count covar_pop covar_samp crc32 cume_dist current_database
current_date current_timestamp current_user date_add date_format date_sub
datediff day dayofmonth dayofweek decode degrees dense_rank e element_at elt
encode exp explode factorial find_in_set first_value floor format_number
from_unixtime from_utc_timestamp get_json_object greatest grouping hash hex
histogram_numeric hour if initcap inline instr isnotnull isnull json_tuple
lag last_day last_value lead least length levenshtein like ln locate log log10
log2 lower lpad ltrim map map_keys map_values mask max md5 min minute mod
month months_between named_struct negative next_day ntile nullif nvl nvl2
octet_length parse_url percent_rank percentile percentile_approx pi pmod
posexplode positive pow power printf quarter radians rand randn rank reflect
regexp_extract regexp_replace repeat replace reverse rlike round row_number
rpad rtrim schema_of_json second sentences sha sha1 sha2 shiftleft shiftright
shiftrightunsigned sign signum sin size sort_array soundex space split sqrt
stack stddev_pop stddev_samp str_to_map struct substr substring
substring_index sum tan to_date to_json to_unix_timestamp to_utc_timestamp
translate trim trunc ucase unbase64 unhex unix_timestamp upper uuid var_pop
var_samp version weekofyear when xpath xpath_boolean xpath_double
xpath_float xpath_int xpath_long xpath_number xpath_short xpath_string year
""".split()
# NOT same-name despite existing in Spark (semantic mismatch):
# - Hive stddev/std/variance are POPULATION forms; Spark's same-named
#   functions are SAMPLE forms → explicit overrides below.
# Note: Hive `hash` is ObjectInspectorUtils.hashCode (Java-hashCode
# based) while Spark `hash` is Murmur3 — values differ across engines.
# Kept same-name (cross-engine hash stability was never a Hive
# contract); pipelines needing stable content keys should use md5/sha2.

FUNCTION_REGISTRY: dict[str, object] = {name: _call(name) for name in _SAME_NAME}


# ---------------------------------------------------------------------------
# Tier 2 — renamed / composed wrappers
# ---------------------------------------------------------------------------


def _register(name: str):
    def deco(fn):
        FUNCTION_REGISTRY[name] = fn
        return fn

    return deco


@_register("lcase")
def lcase(col) -> Column:
    """Hive lcase = lower."""
    return F.lower(_c(col))


@_register("div")
def div(a, b) -> Column:
    """Hive integer division: `a div b` truncates toward zero (Hive
    UDFOPLongDivide — integral domain).

    Uses Spark's exact integral `div`, not floating division: a double
    round-trip loses precision for |a| > 2^53 (off-by-one quotients).
    Zero divisor yields NULL (Hive semantics) even under ANSI sessions —
    the CaseWhen guard keeps the div branch unevaluated on those rows."""
    a, b = _c(a).cast("long"), _c(b).cast("long")
    return F.when(b == 0, F.lit(None).cast("long")).otherwise(
        F.call_function("div", a, b)
    )


@_register("std")
def std(col) -> Column:
    """Hive std = population stddev (GenericUDAFStd)."""
    return F.stddev_pop(_c(col))


@_register("stddev")
def stddev(col) -> Column:
    """Hive stddev = POPULATION stddev (GenericUDAFStd); Spark's
    same-named builtin is the SAMPLE form — mapped explicitly."""
    return F.stddev_pop(_c(col))


@_register("variance")
def variance(col) -> Column:
    """Hive variance = POPULATION variance (GenericUDAFVariance); Spark's
    same-named builtin is the SAMPLE form — mapped explicitly."""
    return F.var_pop(_c(col))


@_register("day_of_week")
def day_of_week(col) -> Column:
    return F.dayofweek(_c(col))


@_register("field")
def field(needle, *haystack) -> Column:
    """Hive UDFField: 1-based index of the first argument equal to
    ``needle`` (0 if absent). Spark has no same-name builtin →
    array_position composition."""
    return F.array_position(F.array(*[_c(h) for h in haystack]), _c(needle)).cast("int")


@_register("mask_hash")
def mask_hash(col) -> Column:
    """Hive mask_hash: md5 hex of the string (consistent masking join key)."""
    return F.md5(_c(col))


@_register("java_method")
def java_method(*args) -> Column:
    return F.call_function("java_method", *[_c(a) for a in args])


@_register("mask_first_n")
def mask_first_n(col, n: int = 4) -> Column:
    """Mask the first n characters (Hive GenericUDFMaskFirstN)."""
    col = _c(col)
    return F.concat(F.mask(F.substring(col, 1, n)), F.substring(col, n + 1, 2**31 - 1 - n))


@_register("mask_last_n")
def mask_last_n(col, n: int = 4) -> Column:
    col = _c(col)
    ln = F.length(col)
    head = col.substr(F.lit(1), F.greatest(ln - n, F.lit(0)))
    tail = col.substr(F.greatest(ln - n + 1, F.lit(1)), F.lit(n))
    return F.concat(head, F.mask(tail))


@_register("mask_show_first_n")
def mask_show_first_n(col, n: int = 4) -> Column:
    col = _c(col)
    return F.concat(F.substring(col, 1, n), F.mask(F.substring(col, n + 1, 2**31 - 1 - n)))


@_register("mask_show_last_n")
def mask_show_last_n(col, n: int = 4) -> Column:
    col = _c(col)
    ln = F.length(col)
    head = col.substr(F.lit(1), F.greatest(ln - n, F.lit(0)))
    tail = col.substr(F.greatest(ln - n + 1, F.lit(1)), F.lit(n))
    return F.concat(F.mask(head), tail)


# ---------------------------------------------------------------------------
# Tier 3 — genuine gaps implemented
# ---------------------------------------------------------------------------


# Above this many lines, in_file stops inlining a literal array (plan
# bloat: a 100k-line file would become a 100k-element expression) and
# ships the line set as a Spark broadcast variable instead.
_IN_FILE_LITERAL_MAX = 1000


@_register("in_file")
def in_file(col, filename: str) -> Column:
    """Hive GenericUDFInFile: true if the value equals any line of the
    file (same distribution model as Hive's map-side file load).

    Small files (≤ {max} lines) inline a literal array — pure JVM,
    codegen'd. Larger files ship the line set ONCE per executor as a
    Spark broadcast variable checked by an Arrow-batched pandas UDF —
    constant plan size regardless of file length. For filter contexts
    prefer :func:`in_file_filter`, whose broadcast semi-join stays fully
    JVM-side.""".format(max=_IN_FILE_LITERAL_MAX)
    with open(filename) as f:
        lines = [line.rstrip("\n") for line in f]
    if len(lines) <= _IN_FILE_LITERAL_MAX:
        return F.array_contains(F.array(*[F.lit(x) for x in lines]), _c(col))

    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(frozenset(lines))

    @pandas_udf(BooleanType())
    def _in_broadcast_set(s: pd.Series) -> pd.Series:
        return s.isin(bc.value)

    return _in_broadcast_set(_c(col))


def in_file_filter(df, col, filename: str, negate: bool = False):
    """Relational form of ``in_file`` for the common ``WHERE
    in_file(c, f)`` case: broadcast left-semi (or left-anti) join against
    the file's lines — the plan a 100 TB scan wants (no literal, no
    Python; the file side is a broadcast hash relation)."""
    spark = df.sparkSession
    with open(filename) as f:
        lines = [(line.rstrip("\n"),) for line in f]
    needles = spark.createDataFrame(lines, "__in_file_line STRING").distinct()
    cond = _c(col) == F.col("__in_file_line")
    how = "left_anti" if negate else "left_semi"
    return df.join(F.broadcast(needles), cond, how)


# ---------------------------------------------------------------------------
# bloom_filter / in_bloom_filter (Hive GenericUDAFBloomFilter /
# GenericUDFInBloomFilter — SURVEY.md §2.C). Spark covers the *runtime
# filtering* role with spark.sql.optimizer.runtime.bloomFilter, but a user
# porting `SELECT ... WHERE in_bloom_filter(x, bf)` needs the callable pair.
# Expression-composed: deterministic double hashing (h1 + i*h2 over
# xxhash64), bit_or aggregation over 64-bit words — all JVM-side builtins,
# map-side partial aggregation, no Python, no RNG.
# ---------------------------------------------------------------------------


def register_hive_udf(spark, name: str, class_name: str, jar: str | None = None):
    """Run a REAL Hive UDF/UDAF/UDTF class (SURVEY.md §2.I ``CREATE
    FUNCTION [USING JAR]``): registers ``class_name`` under ``name``
    via Spark's Hive function bridge and returns nothing — use the
    function from SQL afterwards.

    Requires a Hive-catalog session (the in-memory catalog's function
    registry has no Hive-UDF handler — it raises NO_HANDLER_FOR_UDAF);
    catalogImplementation is fixed per JVM, so like the RCFile path
    this runs in a dedicated ``enableHiveSupport()`` process. The
    hive-exec 2.3.10 jar already on this classpath supplies every
    built-in Hive 2.3 class (e.g.
    ``org.apache.hadoop.hive.ql.udf.generic.GenericUDFReflect2`` —
    works; see tests/test_hive_udf_bridge.py); pass ``jar`` for a
    user's own function jar (``USING JAR 'file:///...'``)."""
    from hive_release_spark.sources.formats import require_hive_catalog

    require_hive_catalog(spark)
    using = f" USING JAR '{jar}'" if jar else ""
    spark.sql(
        f"CREATE TEMPORARY FUNCTION {name} AS '{class_name}'{using}"
    )


def bloom_params(expected_entries: int, fpp: float = 0.05) -> tuple[int, int]:
    """Standard sizing: m = -n·ln(p)/ln2², k = m/n·ln2 (same formulas as
    Hive's BloomFilter.optimalNumOfBits/optimalNumOfHashFunctions)."""
    import math

    m = max(64, math.ceil(-expected_entries * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64  # whole 64-bit words
    k = max(1, round(m / expected_entries * math.log(2)))
    return m, k


def _bloom_positions(col, m: int, k: int) -> list[Column]:
    """k bit positions per value. All arithmetic is done mod m BEFORE the
    multiply-add so it can never overflow a long even under ANSI sessions
    (xxhash64 spans the full long range)."""
    c = _c(col)
    h1 = F.pmod(F.xxhash64(c), F.lit(m))
    h2 = F.pmod(F.xxhash64(F.lit(1), c), F.lit(m))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def bloom_filter_build(
    df, col, expected_entries: int = 10000, fpp: float = 0.05
) -> dict:
    """Aggregate a column into a bloom filter: the Hive
    ``bloom_filter(x, n)`` UDAF role. Returns ``{"m", "k", "words"}`` with
    the bitset as a sparse {word_index: 64-bit word} dict, fetched to the
    driver exactly like Hive returns the serialized filter to its client.
    The heavy lifting (k-position explode → bit_or per word) is
    distributed with map-side partial aggregation; only ~m/64 final words
    ever reach the driver."""
    m, k = bloom_params(expected_entries, fpp)
    pos = F.array(*_bloom_positions(col, m, k))
    words = (
        df.select(F.explode(pos).alias("bit"))
        .select(
            (F.col("bit") / 64).cast("int").alias("w"),
            # call_function: the python shiftleft wrapper only takes a
            # literal int shift, the SQL function takes a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("bit"), F.lit(64)).cast("int")
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    return {"m": m, "k": k, "words": {r.w: r.bits for r in words}}


@_register("in_bloom_filter")
def in_bloom_filter(col, bloom: dict) -> Column:
    """Hive GenericUDFInBloomFilter: membership probe against a filter
    built by :func:`bloom_filter_build`. No false negatives; false-positive
    rate ≈ the build's fpp. The bitset rides in the plan as one literal
    array of m/64 longs (e.g. 98 longs for n=1000 @ 5%)."""
    m, k = bloom["m"], bloom["k"]
    words = bloom["words"]
    # ONE array literal, not m/64 Literal+CreateArray nodes: the column
    # tree below references the bitset once per hash check, and at
    # sf0.1 sizing (~1 400 words x k=5 checks) the per-word form built
    # a ~7 000-node expression whose analysis/codegen dominated the
    # whole query (5 s for a 15 k-row probe, r8 rotating-leg finding)
    arr = F.lit([int(words.get(i, 0)) for i in range(m // 64)]).cast(
        "array<long>"
    )
    checks = []
    for p in _bloom_positions(col, m, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


@_register("bloom_filter")
def bloom_filter(*_args, **_kwargs):
    """Hive registers bloom_filter as a UDAF; a Column expression cannot
    aggregate, so the engine exposes the build step as the DataFrame-level
    :func:`bloom_filter_build` (same parameters, same filter semantics).
    This stub exists so a ported query fails with directions, not a
    missing-function error."""
    raise NotImplementedError(
        "bloom_filter is an aggregate: use "
        "hive_release_spark.functions.hive.bloom_filter_build(df, col, "
        "expected_entries, fpp), then in_bloom_filter(col, built_filter). "
        "For runtime join filtering, Spark's "
        "spark.sql.optimizer.runtime.bloomFilter.enabled covers the "
        "optimizer role automatically."
    )


@_register("replicate_rows")
def replicate_rows(n, *cols) -> Column:
    """Hive UDTFReplicateRows: emit each row n times →
    explode(array_repeat(struct(cols), n))."""
    return F.explode(F.array_repeat(F.struct(*[_c(c) for c in cols]), _c(n).cast("int")))


@_register("sort_array_by")
def sort_array_by(arr, field: str, asc: bool = True) -> Column:
    """Hive sort_array_by: sort an array<struct> by one struct field →
    array_sort with a comparator lambda."""
    arr = _c(arr)
    lt, gt = (-1, 1) if asc else (1, -1)
    return F.array_sort(
        arr,
        lambda a, b: F.when(a[field] < b[field], F.lit(lt))
        .when(a[field] > b[field], F.lit(gt))
        .otherwise(F.lit(0)),
    )


@_register("create_union")
def create_union(tag, *values) -> Column:
    """Hive UNIONTYPE constructor → Spark struct encoding
    struct<tag:int, field0, field1, ...> (SURVEY.md §1.2: this is the
    same encoding Spark's own Hive reader produces). Only the ACTIVE
    branch carries a value — inactive fields are NULL, exactly as the
    Hive ObjectInspector materializes a union (a union holds one value,
    not all of them)."""
    tag_c = _c(tag).cast("int")
    fields = [F.lit("tag"), tag_c]
    for i, v in enumerate(values):
        fields += [F.lit(f"field{i}"), F.when(tag_c == i, _c(v))]
    return F.named_struct(*fields)


@_register("extract_union")
def extract_union(u, tag: int | None = None) -> Column:
    """Hive GenericUDFExtractUnion: no tag → the full struct; with tag →
    that branch's value."""
    u = _c(u)
    return u if tag is None else u.getField(f"field{tag}")
