"""Relational operators Spark lacks as single primitives.

The reference has no joins at all (SURVEY.md §2.3) — this module exists for
the extended surface: as-of joins for time-series enrichment, expressed the
scale-friendly way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    strict: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the latest right
    row with ``right_time <= left_time`` (``<`` when ``strict``) and the same
    ``on`` key.

    Implementation is the union-and-carry-forward pattern, NOT a range join:
    tag both inputs, sort within each key by time, and carry the last-seen
    right payload forward with ``last(..., ignorenulls=True)``. One shuffle on
    the key, no pair explosion — at 100 TB a naive inequality join explodes to
    |left|x|right| per key while this stays O(|left| + |right|) rows.

    Equal-timestamp semantics: with ``strict`` the right row sorts *after* a
    left row at the same instant (so it doesn't match); otherwise before.
    """
    lcols = left.columns
    marker = 0 if strict else 1  # left's sort position vs right at equal time

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(marker).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1 - marker).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in right_payload],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}" if c in lcols else c)
            for c in right_payload
        ],
    )
    out_payload = [f"{c}{suffix}" if c in lcols else c for c in right_payload]
    return carried.where(F.col("__side") == marker).select(*lcols, *out_payload)
