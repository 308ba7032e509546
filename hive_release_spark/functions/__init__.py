"""Hive scalar/UDAF/UDTF function surface (SURVEY.md §2.H).

``FUNCTION_REGISTRY`` maps every Hive 2.3 FunctionRegistry name this
engine supports to a Python callable returning a Spark Column (or, for
generators/UDAFs, the documented Spark equivalent). Coverage is
enumerable: ``python -c "from hive_release_spark.functions import
FUNCTION_REGISTRY; print(len(FUNCTION_REGISTRY))"``.
"""

from hive_release_spark.functions.hive import (  # noqa: F401
    FUNCTION_REGISTRY,
    create_union,
    extract_union,
    in_file,
    mask_first_n,
    mask_last_n,
    mask_show_first_n,
    mask_show_last_n,
    replicate_rows,
    sort_array_by,
)
