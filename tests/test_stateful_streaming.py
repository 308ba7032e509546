"""Arbitrary stateful streaming (SURVEY.md §2.K):
applyInPandasWithState — the Spark replacement for custom stateful
operators (Hive has none; its 'streaming' was ACID ingest only)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hive_release_spark.catalog import load_table
from hive_release_spark.streaming import pipelines as P
from tests.conftest import SF_SMOKE


def test_apply_in_pandas_with_state_counts(spark):
    """Running per-user event counts kept in explicit GroupState; with a
    single availableNow batch the final state must equal the batch
    groupBy counts."""

    def count_events(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    stream = P.load_events_stream(spark, SF_SMOKE)
    counted = stream.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType="user_id BIGINT, n BIGINT",
        stateStructType="n BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = P.run_available_now(counted, "t_stateful_test", output_mode="update")
    got = {
        (r.user_id, r["max(n)"]) for r in out.groupBy("user_id").max("n").collect()
    }
    batch = {
        (r.user_id, r["count"])
        for r in load_table(spark, SF_SMOKE, "events").groupBy("user_id").count().collect()
    }
    assert got == batch
