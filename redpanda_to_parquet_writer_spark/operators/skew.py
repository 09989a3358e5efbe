"""Skew-mitigation join helpers.

AQE's skew-join split (on by default in session.py) handles most skew at
runtime. These helpers cover the cases AQE can't: extreme hot keys in
shuffle joins where one key exceeds a single executor's memory, and
broadcast-threshold misses.

`salted_join`: explode the small side R times, salt the big side with
pmod(rand-free deterministic salt, R) — the hot key's rows spread over R
reducers. Deterministic salting (hash of a row-unique column) keeps the
operator reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: spreads each join key over
    `salt_buckets` shuffle partitions.

    The big side gets a deterministic salt from `salt_source` (any
    roughly-unique column) or, by default, xxhash64 over the FULL row —
    salting on the join key itself would put every row of the hot key in
    one bucket, i.e. zero mitigation. The small side is exploded once
    per bucket — costing |small| * buckets rows, which is the explicit
    trade against reducer skew.

    Only inner/left/semi/anti joins are valid: for right/full outer the
    exploded small-side copies that miss their bucket would surface as
    spurious null-padded rows.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r} (small side is exploded)")
    salt_input = (
        [F.col(salt_source)]
        if salt_source is not None
        else [F.col(c) for c in big.columns]
    )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_input), F.lit(salt_buckets)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(salted_small, on=on + ["__salt"], how=how).drop("__salt")
