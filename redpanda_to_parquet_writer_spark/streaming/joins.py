"""Stream-stream joins with watermarked state (T9 extension).

The reference has no joins across streams at all; Spark's stream-stream
join is the canonical way to correlate two live topics (e.g. clicks vs
purchases, quotes vs trades) with bounded state:

  - both sides carry a watermark (how late data may arrive);
  - the join condition carries a TIME BOUND relating the two event
    times, so Spark can drop state older than watermark + bound;
  - without the bound, state grows forever — at 100 TB/day that's the
    difference between a runnable query and an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join left events to right events with the same key where the right
    event happened within `lookback` BEFORE the left event
    (attribution shape: click <- preceding purchase/quote).

    Both inputs may be streaming (watermarks applied) or batch (the same
    condition runs as a plain join — useful for backfill parity).
    Right columns come back suffixed `_r`.
    """
    lhs = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rhs = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    rhs = rhs.select(
        F.col(key).alias(f"{key}_r"),
        F.col(right_ts).alias(f"{right_ts}_r"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_ts}_r") <= F.col(left_ts))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return lhs.join(rhs, on=cond, how=how)
