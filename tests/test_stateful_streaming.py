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


def test_transform_with_state_in_pandas_running_max(spark):
    """transformWithStateInPandas (Spark 4's successor to
    applyInPandasWithState: StatefulProcessor + typed state handles,
    RocksDB-backed): running per-user max value; final state must match
    the batch groupBy max.

    ENVIRONMENT GATE: the transformWithState Python state-server protocol
    requires the `protobuf` package (pyspark/sql/streaming/proto/*), which
    this container does not ship — verified by running the query to the
    ImportError. applyInPandasWithState (protobuf-free, covered above) is
    the arbitrary-stateful path exercised here; this test auto-activates
    wherever protobuf is installed."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState state protocol needs protobuf (absent in container)",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._mx = handle.getValueState("mx", "mx DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            mx = self._mx.get()[0] if self._mx.exists() else float("-inf")
            for pdf in rows:
                mx = max(mx, float(pdf["value"].max()))
            self._mx.update((mx,))
            yield pd.DataFrame({"user_id": [key[0]], "max_value": [mx]})

        def close(self) -> None:
            pass

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = P.load_events_stream(spark, SF_SMOKE)
        out_stream = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningMax(),
            outputStructType="user_id BIGINT, max_value DOUBLE",
            outputMode="Update",
            timeMode="None",
        )
        out = P.run_available_now(out_stream, "t_tws_test", output_mode="update")
        got = {
            (r.user_id, r["max(max_value)"])
            for r in out.groupBy("user_id").max("max_value").collect()
        }
        events = load_table(spark, SF_SMOKE, "events")
        batch = {
            (r.user_id, r["max(value)"])
            for r in events.groupBy("user_id").max("value").collect()
        }
        assert got == batch
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
