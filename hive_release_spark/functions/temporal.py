"""Temporal robustness helpers (r12 temporal-edges axis).

A 100 TB crawl carries corrupt timestamps — far-future values from
mis-parsed dates, misconfigured clocks, deliberate junk. The temporal
axis (tests/test_empty_input.py ``--make-time``) measured exactly how
they break things:

* **Watermark poisoning**: one year-9999 event advances an event-time
  watermark centuries, silently dropping the ENTIRE legitimate stream
  as "late" — the worst possible failure mode (not a crash; an empty
  result that looks finished).
* **Interval-arithmetic ceiling**: ``ts + gap`` on a far-future value
  exceeds the calendar (year 10000), which Spark computes internally
  (µs are int64) but cannot collect, and whose oracle replay diverges.
* **The datetime64[ns] ceiling**: any kernel shipping timestamps
  through a nanosecond pandas/Arrow boundary overflows past
  2262-04-11 (see operators/matchpath.py for the µs-integer ordering
  device that avoids the boundary entirely).

The adjudicated contract: event-time kernels whose semantics depend on
a bounded time axis (watermarks, session gaps, interval endpoints)
require timestamps BELOW a declared validity ceiling; at/after it the
row is crawl corruption with no position on the business-time axis —
dropped scan-side (the same shape as the r10 NULL-event-time contract
and the NaN-axis ``finite()`` device). Pre-1970 values stay: negative
epochs are legitimate historical data and mechanically sound.

The ceiling is 2200-01-01: far past any real event stream, yet leaving
headroom inside every representation the engine touches (calendar
year 9999, pandas ns 2262, +months interval arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Declared event-time validity ceiling (exclusive).
TS_VALID_MAX = "2200-01-01 00:00:00"


def ts_valid(c: Column | str) -> Column:
    """Boolean: ``c`` is a valid business-time instant (non-NULL and
    before :data:`TS_VALID_MAX`). NULL input yields NULL, which
    filters the row exactly like the r10 NULL-event-time contract.
    Oracle twin: :func:`ts_valid_sql`."""
    c = F.col(c) if isinstance(c, str) else c
    # NTZ comparison on both sides: the loaders produce TIMESTAMP_NTZ,
    # and for a classic TIMESTAMP column the cast is value-exact under
    # the pinned-UTC session (the asof.py:164 precedent).
    return c.cast("timestamp_ntz") < F.lit(TS_VALID_MAX).cast("timestamp_ntz")


def ts_valid_sql(x: str) -> str:
    """DuckDB twin of :func:`ts_valid` — textual SQL fragment."""
    return f"{x} < TIMESTAMP '{TS_VALID_MAX}'"
