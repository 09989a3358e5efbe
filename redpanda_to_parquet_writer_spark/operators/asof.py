"""Temporal joins Spark lacks as builtins: as-of (backward) join and
binned interval (range) join.

For each left row, attach the most recent right row with the same key and
`right.ts <= left.ts` (DuckDB/kdb ASOF semantics, as used for
trade-vs-quote joins on market data like the reference's topics).

Scale formulation: NOT a range join (which explodes to |L|·|R| candidate
pairs before filtering). Union both sides tagged, then one window pass:

    union -> partition by key, order by (ts, side) -> last(right-row
    struct, ignoreNulls) over rows unbounded preceding -> keep left rows

One shuffle on the key, linear work, no pair blowup — the standard
log-structured merge trick. Right rows order BEFORE left rows at equal
ts, so a right row with ts == left.ts matches (ASOF <=). The carried
right row is ONE struct, so all attached columns come from the SAME
matched row even when some of its fields are null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows + latest right `value_cols` at or
    before each left timestamp (null when no right row precedes).

    `left` and `right` must share `key_cols` and `ts_col`; right columns
    arrive renamed `<col><suffix>`, plus `<ts_col><suffix>` (the matched
    right timestamp).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in key_cols and c != ts_col
    ]
    carried = [ts_col, *value_cols]

    rstruct = F.struct(*[F.col(c).alias(c) for c in carried])
    rhs = right.select(
        *key_cols, F.col(ts_col), F.lit(0).alias("__side"), rstruct.alias("__r")
    )
    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(rhs.schema["__r"].dataType)
    )
    # right rows first at equal ts (side 0 < 1) so ts == matches
    merged = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in carried
    ]
    return matched.filter(F.col("__side") == 1).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    key_cols: list[str] | None = None,
    bin_width: int = 3_600_000_000,
    max_bins: int = 10_000,
) -> DataFrame:
    """Point-in-interval (range) join: rows where
    `lo <= point <= hi` (and keys match).

    Spark plans a raw BETWEEN join as broadcast-nested-loop or cartesian —
    |P|·|I| pair work at scale. Binning makes it an equi-join: each point
    hashes to bin floor(p/w); each interval explodes to every bin it
    overlaps (ceil(len/w)+1 rows). The join shuffles on (keys, bin); the
    exact BETWEEN predicate then filters bin-collisions. Pick `bin_width`
    near the typical interval length so intervals explode to ~2 bins.

    A (point, interval) pair can only meet in the point's own bin, so no
    dedup is needed.

    Dirty-data guards: inverted intervals (lo > hi) and intervals wider
    than `max_bins` buckets are dropped rather than letting one corrupt
    row (e.g. a nanos value in a micros column) drive `sequence` to
    materialize billions of elements and kill the job. Size `max_bins`
    to the widest legitimate interval / bin_width.
    """
    key_cols = key_cols or []
    pb = points.withColumn("__bin", F.floor(F.col(point_col) / F.lit(bin_width)))
    lo_bin = F.floor(F.col(lo_col) / F.lit(bin_width))
    hi_bin = F.floor(F.col(hi_col) / F.lit(bin_width))
    ib = (
        intervals.filter(
            (F.col(lo_col) <= F.col(hi_col))
            & (hi_bin - lo_bin < F.lit(max_bins))
        )
        .withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    )
    return (
        pb.join(ib, on=[*key_cols, "__bin"])
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__bin")
    )


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    grid_start: int,
    grid_step: int,
    grid_points: int,
) -> DataFrame:
    """Per-key LOCF resampling onto a fixed time grid — the
    irregular-events → regular-time-series operator (metrics dashboards,
    feature snapshots), implemented as a REAL Arrow grouped-map
    (`applyInPandas`) with the groups BUCKET-AMORTIZED: grouping
    directly on the key hands Arrow one tiny pandas frame per key, and
    at ~10-100 events/key the per-group Python-call + Arrow-batch
    overhead dominates the actual work (measured at sf0.1: 2.7s per-key
    vs 0.5s bucketed for identical output). So the grouped-map groups on
    `hash(key) % n_buckets` instead, and inside each bucket one stable
    sort + boundary scan vectorizes EVERY key's `searchsorted` LOCF —
    the pattern any grouped-pandas pipeline over high-cardinality /
    small-group keys needs at scale. Grid points before a key's first
    event stay null.

    Scale shape: still ONE shuffle (on the bucket), NumPy inside the
    batch — no per-row Python, and the bucket count tracks cluster
    parallelism so every core gets work regardless of key cardinality.
    Grid timestamps are exact integers and carried values are stored
    doubles (no arithmetic), so the result is engine-exact; ties at the
    same (key, ts) break deterministically on `tiebreak_col` (last
    wins), mirroring the oracle's max-tiebreak dedup.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import AtomicType

    key_type = df.schema[key_col].dataType
    if not isinstance(key_type, AtomicType):
        raise ValueError(
            f"resample_locf: key column {key_col!r} must be an atomic type "
            f"(int/string/...), got {key_type.simpleString()}"
        )
    grid = np.arange(grid_points, dtype=np.int64) * grid_step + grid_start
    # output key type mirrors the input key type — integral and string
    # keys both round-trip through Arrow unchanged
    out_schema = (
        f"{key_col} {key_type.simpleString()}, grid_ts long, {value_col} double"
    )
    # enough buckets that every core stays busy even under skewed key
    # hashing; the bucket value itself never leaves the plan
    n_buckets = df.sparkSession.sparkContext.defaultParallelism * 2
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))

    def resample(pdf: pd.DataFrame) -> pd.DataFrame:
        # one stable sort over the whole bucket, then per-key slices by
        # boundary scan — identical per-key semantics to sorting each
        # key's frame alone, without the per-key group overhead
        pdf = pdf.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        # deterministic tie collapse: last (max tiebreak) per (key, ts)
        pdf = pdf.drop_duplicates(subset=[key_col, ts_col], keep="last")
        keys = pdf[key_col].to_numpy()
        ts_all = pdf[ts_col].to_numpy(dtype=np.int64)
        vals_all = pdf[value_col].to_numpy(dtype=np.float64)
        # NULL-safe boundary scan: a NULL key is ONE group (matching
        # both groupBy-on-the-key semantics and the JVM twin's window
        # partitioning) — raw != would split it per row, since NaN !=
        # NaN and Arrow hands null int/string keys to pandas as NaN/None
        k = pdf[key_col]
        new_grp = (k.ne(k.shift()) & ~(k.isna() & k.shift().isna())).to_numpy()
        # row 0 always starts a group (the mask computes False there
        # when the bucket's first key is itself NULL)
        starts = np.concatenate(
            ([0], np.nonzero(new_grp[1:])[0] + 1, [len(keys)])
        )
        out_vals = np.empty(grid_points * (len(starts) - 1), dtype=np.float64)
        missing = np.empty_like(out_vals, dtype=bool)
        for g, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
            idx = np.searchsorted(ts_all[s:e], grid, side="right") - 1
            sl = slice(g * grid_points, (g + 1) * grid_points)
            out_vals[sl] = vals_all[s:e][np.maximum(idx, 0)]
            missing[sl] = idx < 0
        # nullable Float64 so pre-first-event grid points become real
        # SQL NULLs through Arrow (NaN would not hash-match the oracle)
        vals_col = pd.array(out_vals, dtype="Float64")
        vals_col[missing] = pd.NA
        return pd.DataFrame(
            {
                key_col: np.repeat(keys[starts[:-1]], grid_points),
                "grid_ts": np.tile(grid, len(starts) - 1),
                value_col: vals_col,
            }
        )

    return (
        df.withColumn("__rs_bucket", bucket)
        .groupBy("__rs_bucket")
        .applyInPandas(resample, schema=out_schema)
    )


def resample_locf_sql(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    grid_start: int,
    grid_step: int,
    grid_points: int,
) -> DataFrame:
    """Pure-JVM twin of `resample_locf` — identical semantics, zero
    Python in the hot path: the grid materializes via
    `sequence`+`explode` per key, unions with the observations, and one
    `last(value, ignorenulls=True)` row-frame window carries the last
    observation forward onto each grid row. This is the default scale
    path (whole-stage codegen, no Arrow serialization); the grouped-map
    variant stays as the pandas-UDF surface proof.

    Tie handling needs no pre-aggregation: ordering the window by
    (ts, is_grid, tiebreak) puts the max-tiebreak event LAST among
    same-timestamp observations, so `last(...)` picks exactly the row
    the Arrow twin's keep-last dedup picks.

    NULL observations carry forward as NULL (identical to the Arrow
    twin): the window takes the last non-null STRUCT-wrapped
    observation — observation rows always wrap (a struct of a null
    value is itself non-null), grid rows contribute null structs — and
    the value is extracted afterwards, so `ignorenulls` skips grid
    rows, never null-valued observations.

    Scale shape: one column-pruned scan for the distinct key set, one
    for observations, ONE key shuffle for the window (the distinct's
    partial aggregate is map-side combined). Grid rows cost
    |keys| x grid_points — the output size, nothing more.
    """
    from pyspark.sql import Window

    grid_end = grid_start + grid_step * (grid_points - 1)
    # null placeholders typed from the INPUT schema so the union is
    # type-exact for any value/tiebreak column types (string tiebreaks
    # included)
    value_type = df.schema[value_col].dataType.simpleString()
    tiebreak_type = df.schema[tiebreak_col].dataType.simpleString()
    grid = (
        df.select(key_col)
        .distinct()
        .select(
            key_col,
            F.explode(
                F.sequence(F.lit(grid_start), F.lit(grid_end), F.lit(grid_step))
            ).alias(ts_col),
        )
        .withColumn(value_col, F.lit(None).cast(value_type))
        .withColumn(tiebreak_col, F.lit(None).cast(tiebreak_type))
        .withColumn("__is_grid", F.lit(1))
    )
    obs = df.select(key_col, ts_col, value_col, tiebreak_col).withColumn(
        "__is_grid", F.lit(0)
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__is_grid", tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_struct = F.when(
        F.col("__is_grid") == 0, F.struct(F.col(value_col).alias("v"))
    )
    return (
        obs.unionByName(grid)
        .withColumn("__locf", F.last(obs_struct, ignorenulls=True).over(w))
        .filter(F.col("__is_grid") == 1)
        .select(
            key_col,
            F.col(ts_col).alias("grid_ts"),
            F.col("__locf.v").alias(value_col),
        )
    )
