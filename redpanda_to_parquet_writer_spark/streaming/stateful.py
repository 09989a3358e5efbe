"""Custom stateful streaming operator: cross-batch offset-gap detection.

The reference's external-completeness check (V2, collector:1433-1472)
compares total counts to watermarks AFTER a run. A streaming engine can
do better: detect missing offsets the moment they're visible, across
micro-batch boundaries. Spark has no builtin for "gap in a monotonically
increasing per-key sequence across batches" — this is the
`applyInPandasWithState` case (custom per-key state = the highest offset
seen so far).

Scale shape: state is ONE long per Kafka partition (thousands of keys at
most), batches arrive Arrow-vectorized, gap detection is a NumPy diff —
no per-row Python.

Batch counterpart (oracle-testable): `offset_gaps_batch` computes the
same gaps with a lag window.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

GAP_OUTPUT_SCHEMA = "kafka_partition long, gap_start long, gap_end long, n_missing long"
GAP_STATE_SCHEMA = "last_offset long"


def _gap_func(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
    import numpy as np
    import pandas as pd

    last = state.get[0] if state.exists else None
    chunks = [pdf["kafka_offset"].to_numpy() for pdf in pdfs]
    if not chunks:
        return
    offsets = np.unique(np.concatenate(chunks))  # sorted + deduped
    gaps: list[tuple[int, int, int, int]] = []
    prev = last
    for o in offsets.tolist():
        if prev is not None and o > prev + 1:
            gaps.append((key[0], prev + 1, o - 1, o - prev - 1))
        prev = o if prev is None else max(prev, o)
    state.update((int(prev),))
    if gaps:
        yield pd.DataFrame(
            gaps, columns=["kafka_partition", "gap_start", "gap_end", "n_missing"]
        )


def detect_offset_gaps(df: DataFrame) -> DataFrame:
    """Streaming per-partition offset-gap stream.

    Input needs `kafka_partition` and `kafka_offset` columns. Emits one
    row per detected gap (append mode); gaps spanning micro-batches are
    caught because the highest seen offset persists in group state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        df.select("kafka_partition", "kafka_offset")
        .groupBy("kafka_partition")
        .applyInPandasWithState(
            _gap_func,
            GAP_OUTPUT_SCHEMA,
            GAP_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


#: offset-span bucket for the two-level gap scan (same role as
#: sampling.PREFIX_SPAN): the within-bucket lag window holds at most
#: one span of offsets per task, never a whole kafka partition
GAP_SPAN = 1 << 20


def offset_gaps_batch(
    df: DataFrame,
    partition_col: str = "kafka_partition",
    offset_col: str = "kafka_offset",
) -> DataFrame:
    """Batch formulation of the same gaps, two-level (r12): a lag
    window partitioned by the kafka partition alone is the r11
    disqualifier shape — |topic|/|partitions| offsets in ONE window
    task at scale. Decomposed exactly like the grouped prefix sums:

      1. within-bucket lag, window on (partition, offset DIV span) —
         finds every gap except at bucket boundaries;
      2. per-bucket max offsets — read off the WINDOWED frame (the
         greatest(o, prev) wrapper consumes the lag column so both
         branches read identical columns and the window-input exchange
         is REUSED: one scan);
      3. a bucket-first row's predecessor is the previous NON-EMPTY
         bucket's max (buckets exist only when non-empty and offsets
         are monotone in the bucket id), computed by a lag over the
         TINY per-bucket frame and joined back.

    Identical rows to the flat per-partition lag (bitwise-gated): every
    distinct offset sees the same predecessor, only the task shape
    changed.
    """
    rows = (
        df.select(F.col(partition_col), F.col(offset_col).cast("long"))
        .distinct()
        .withColumn("__b", F.expr(f"{offset_col} DIV {GAP_SPAN}"))
        .filter(F.col("__b").isNotNull())
    )
    w_in = Window.partitionBy(partition_col, "__b").orderBy(offset_col)
    bucketed = rows.withColumn("__prev_in", F.lag(offset_col).over(w_in))
    # greatest(o, prev_in) == o (prev_in < o within a bucket); the
    # wrapper exists so this branch consumes __prev_in too and the
    # shared exchange canonicalizes identically (r12 symmetry rule)
    bmax = bucketed.groupBy(partition_col, "__b").agg(
        F.max(
            F.greatest(F.col(offset_col), F.coalesce("__prev_in", F.col(offset_col)))
        ).alias("__bmax")
    )
    w_b = Window.partitionBy(partition_col).orderBy(F.col("__b").asc())
    boundary = bmax.withColumn("__prev_bmax", F.lag("__bmax").over(w_b)).select(
        partition_col, "__b", "__prev_bmax"
    )
    return (
        bucketed.join(boundary, [partition_col, "__b"])
        .withColumn("__prev", F.coalesce("__prev_in", "__prev_bmax"))
        .filter(F.col(offset_col) > F.col("__prev") + 1)
        .select(
            F.col(partition_col).alias("kafka_partition"),
            (F.col("__prev") + 1).alias("gap_start"),
            (F.col(offset_col) - 1).alias("gap_end"),
            (F.col(offset_col) - F.col("__prev") - 1).alias("n_missing"),
        )
    )
