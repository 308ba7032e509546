"""Regenerate tools/plan_exchange_ledger.json: per-entry count of
numbered Exchange blocks in the formatted plan at sf0.001 (AQE
pre-finalization), under the test session's conf.

Run after a deliberate plan change:  python tools/gen_exchange_ledger.py
The sweep test (tests/test_registry_plan_sweep.py) fails any entry
whose count GREW vs this ledger — a shuffle regression — and asks for
a conscious regeneration instead of a silent one.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_release_spark.queries import REGISTRY  # noqa: E402
from hive_release_spark.session import get_session  # noqa: E402

EXCHANGE_RX = re.compile(r"\(\d+\) Exchange")
OUT = Path(__file__).resolve().parent / "plan_exchange_ledger.json"


def main() -> None:
    # conf mirrors tests/conftest.py's session exactly: Exchange-node
    # counts are partition-count-independent, but keeping the confs
    # identical removes the question rather than relying on that.
    spark = get_session(
        app_name="gen_exchange_ledger",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    ledger = {}
    for name, q in REGISTRY.items():
        # mirror the sweep: clean cache per entry, so counts are the
        # clean-session plans, independent of registry iteration order
        # (CacheManager substitutes live call-time persists otherwise)
        spark.catalog.clearCache()
        plan = q.fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().explainString(mode)
        ledger[name] = len(EXCHANGE_RX.findall(plan))
    OUT.write_text(json.dumps(ledger, indent=0, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({len(ledger)} entries)")


if __name__ == "__main__":
    main()
