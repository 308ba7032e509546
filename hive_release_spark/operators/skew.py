"""Skew-handling joins (SURVEY.md §2.B / §4.1 SkewJoinOptimizer).

Two mechanisms, mirroring Hive's:

1. **AQE skew join** (GenMRSkewJoinProcessor analogue) — free: the
   session factory enables ``spark.sql.adaptive.skewJoin`` which splits
   oversized partitions at runtime. Nothing to call.
2. **Salted join** (compile-time SkewJoinOptimizer analogue) — for when
   the skew is known and the other side is replicable: explode the small
   side into N salt replicas, scatter the big side's hot keys across the
   N salts, join on (key, salt). Deterministic, no RNG: the salt is
   pmod(hash(whole row), N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side's hot
    keys scattered over ``n_salts`` partitions.

    The small side is replicated n_salts× (explode), so keep it
    broadcast-sized × n_salts. Result equals a plain join exactly for
    ``how`` in {inner, left, left_semi, left_anti} — the replication is
    invisible from the big side. Right/full outer are REJECTED: each
    unmatched small-side row would surface once per salt replica."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "unmatched small-side rows would appear once per salt replica"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_small = small.withColumn("__salt", F.explode(salts))
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
