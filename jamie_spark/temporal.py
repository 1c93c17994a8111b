"""Temporal relational operators: as-of join and bounded range join.

Spark has no native ASOF or interval join; the naive encodings are
scale-killers (a theta-join on ``r.ts <= l.ts`` degenerates to
broadcast-nested-loop, a per-key crossJoin is O(n^2) in the key's row
count). These are the standard compositions that stay shuffle-bounded:

* ``asof_join``    — NO join at all: union both sides, one sort within the
                     key partition, propagate the last-seen right row with
                     ``last(..., ignorenulls=True)``. One shuffle total,
                     skew behavior identical to any per-key window.
* ``range_count``  — time-BUCKETED self equi-join: each left row joins only
                     its own and the next bucket(s) (buckets sized to the
                     horizon), then the exact interval filter. Fanout is
                     bounded by ceil(horizon/bucket)+1 ~= 2 buckets per row
                     instead of the whole key group.

No counterpart in the reference (single-node, no temporal tables); the
oracle twin is DuckDB's native ASOF JOIN / an interval join, so the
composition is value-checked row-for-row.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def asof_join(
    left: "DataFrame",
    right: "DataFrame",
    on: str = "user_id",
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_right",
    direction: str = "backward",
) -> "DataFrame":
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` within the same ``on`` key (backward as-of,
    DuckDB/pandas ``merge_asof`` semantics, match inclusive at equality);
    ``direction="forward"`` attaches the EARLIEST right row with
    ``right.ts >= left.ts`` instead.

    Implementation: tag and union the two inputs, sort each key partition by
    (ts, side) with the right side ordered FIRST at equal timestamps (that is
    what makes the equality match inclusive) — descending ts for the forward
    direction, which turns "earliest following" into "last seen" under the
    same window — then carry the last right ROW forward with an
    unbounded-preceding window. The payload travels as ONE struct, not
    per-column: per-column ``last(ignorenulls)`` would skip a legitimately
    NULL value (attaching a stale older row's value) and could stitch
    different output columns from different right rows — asof semantics
    attach exactly one right row or none. Left rows with no admissible
    right row keep nulls. If the right side can hold several rows at the
    same (key, ts), deduplicate it first — which row "wins" a tie is
    otherwise engine-dependent in every asof implementation.

    Cost: exactly one shuffle (the window partitioning) over left+right —
    compare a sort-merge theta-join, which Spark cannot express as anything
    better than a nested loop here.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    from pyspark.sql.types import StructField, StructType

    rstruct = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct).alias("_r"),
        *[F.col(c) for c in left.columns if c not in (on, ts)],
    )
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, ts)],
    )
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the whole right row travels as one struct: a right row with NULL
    # fields is still a non-null struct, so it is never skipped over
    filled = l_tag.unionByName(r_tag).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_rm")
    )
    return filled.where(F.col("_side") == 1).select(
        *[c for c in filled.columns if c not in ("_side", "_r", "_rm")],
        *[F.col(f"_rm.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_count(
    events: "DataFrame",
    horizon_sec: int,
    on: str = "user_id",
    ts: str = "ts",
) -> "DataFrame":
    """Per event: how many LATER events of the same key fall inside
    ``(ts, ts + horizon_sec]`` — the bounded-interval self-join (feature
    engineering's "activity in the next hour", burst detection, etc.).

    Implementation: bucket timestamps by ``horizon_sec``; a matching pair is
    always in the same or the next bucket, so the self-join is a plain
    equi-join on (key, bucket) with the right side exploded into its own and
    previous bucket ids — per-row fanout exactly 2, independent of key
    cardinality — followed by the exact interval predicate. The naive
    formulation (equi-join on key alone + interval filter) explodes as the
    SQUARE of the hottest key's row count; this stays linear with constant 2.

    The domain is the DISTINCT (key, ts) event times — duplicate rows at one
    timestamp would otherwise multiply both sides of the count. All interval
    arithmetic runs on integer MICROSECONDS (unix_micros), the timestamp's
    native resolution — truncating to seconds would silently shift the
    interval boundaries.
    """
    horizon_us = horizon_sec * 1_000_000
    e = (
        events.select(on, ts)
        .distinct()
        .select(
            F.col(on),
            F.col(ts),
            # parquet event times read as TIMESTAMP_NTZ; the cast re-types to
            # the session zone (UTC in this deployment) without changing the
            # wall-clock value, and unix_micros is then exact
            F.unix_micros(F.col(ts).cast("timestamp")).alias("_us"),
        )
        .withColumn("_bucket", F.floor(F.col("_us") / horizon_us))
    )
    probe = e.select(
        F.col(on), F.col("_us").alias("_us_r"),
        F.explode(
            F.array(F.col("_bucket"), F.col("_bucket") - 1)
        ).alias("_bucket"),
    )
    joined = e.join(probe, [on, "_bucket"]).where(
        (F.col("_us_r") > F.col("_us"))
        & (F.col("_us_r") <= F.col("_us") + horizon_us)
    )
    counts = joined.groupBy(on, ts).agg(F.count(F.lit(1)).alias("n_next"))
    return (
        e.select(on, ts)
        .join(counts, [on, ts], "left")
        .select(on, ts, F.coalesce("n_next", F.lit(0)).alias("n_next"))
    )


def latest_snapshot(
    df: "DataFrame",
    key_cols: list[str],
    ts_col: str,
    cutoff,
    tiebreak_cols: tuple[str, ...] = (),
) -> "DataFrame":
    """As-of state snapshot (the SCD "current row" query): for every key,
    the single row with the greatest ``ts_col`` <= ``cutoff`` — how a
    versioned KG answers "what did we believe about (subj, pred) at time
    T?" as assertions are re-observed across crawls.

    One shuffle on the key columns; the window is per-KEY (bounded group
    size), never a global sort. Ties on the timestamp are broken by
    ``tiebreak_cols`` DESC so the winner is total-ordered and the result
    engine-portable (pass the value column(s); identical full-row
    duplicates need no tiebreak — every candidate winner is the same row).
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.where(F.col(ts_col) <= F.lit(cutoff))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot_diff(
    df: "DataFrame",
    key_cols: list[str],
    ts_col: str,
    t0,
    t1,
    value_cols: tuple[str, ...],
    tiebreak_cols: tuple[str, ...] = (),
) -> "DataFrame":
    """KG change detection between two as-of times: for every key, compare
    the belief at ``t0`` with the belief at ``t1`` and emit the keys that
    differ — ``added`` (no belief at t0), ``removed`` (no belief at t1 —
    possible when the ledger is compacted/retracted, impossible for a pure
    append-only ledger), or ``changed`` (both present, any value column
    differs, null-safe). Unchanged keys are dropped. Returns
    (key..., old_<v>..., new_<v>..., change).

    Scale shape: two per-key snapshot windows (each one shuffle on the key
    columns, bounded group size) feeding a key-partitioned full-outer
    join — the join reuses the snapshots' partitioning, so the diff costs
    one extra co-partitioned merge, never a global sort. Presence is
    tracked by explicit marker columns, not value null-ness, so null
    values diff correctly.
    """
    olds = [F.col(v).alias(f"old_{v}") for v in value_cols]
    news = [F.col(v).alias(f"new_{v}") for v in value_cols]
    a = latest_snapshot(df, key_cols, ts_col, t0, tiebreak_cols).select(
        *key_cols, *olds
    ).withColumn("_in_old", F.lit(True))
    b = latest_snapshot(df, key_cols, ts_col, t1, tiebreak_cols).select(
        *key_cols, *news
    ).withColumn("_in_new", F.lit(True))
    j = a.join(b, key_cols, "full_outer")
    differs = F.lit(False)
    for v in value_cols:
        differs = differs | ~F.col(f"old_{v}").eqNullSafe(F.col(f"new_{v}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.where(
            F.col("_in_old").isNull() | F.col("_in_new").isNull() | differs
        )
        .select(
            *key_cols,
            *[f"old_{v}" for v in value_cols],
            *[f"new_{v}" for v in value_cols],
            change.alias("change"),
        )
    )


def valid_intervals(
    df: "DataFrame",
    key_cols: list[str],
    ts_col: str,
    order_cols: tuple[str, ...] = (),
) -> "DataFrame":
    """SCD-2 interval materialization: each observation becomes a version
    row valid from its own timestamp until the NEXT observation of the same
    key (NULL = still current) — the other half of KG versioning next to
    :func:`latest_snapshot`.

    Version order within a key is (``ts_col``, *order_cols*) ASC — pass the
    value column(s) so simultaneous observations get a deterministic,
    engine-portable order. Same single-shuffle per-key window shape.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
