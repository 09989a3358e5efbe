"""Distributed graph analytics over edge-list DataFrames.

Triangle counting uses the classic oriented-wedge formulation (each
undirected edge stored once as a < b; wedges x<y<z from two oriented
edges; a LEFT SEMI join against the closing edge (x,z) confirms
triangles — every triangle counted exactly once). Extension scope: the
reference (a Kafka→Parquet collector + Polars reader) has no graph
surface; this serves the co-occurrence / dedup-cluster analytics a
training-data pipeline layers on top.

Scale notes (100-TB shape):
- The edge list is persisted across the counting actions — without it
  the whole upstream lineage (e.g. basket explode + distinct) re-runs
  once per consumer (edges feeds e1/e2/closing plus its own count:
  4x otherwise).
- Wedges are persisted across their count + semi-join (2 consumers).
- `max_degree` is the heavy-hitter guard for power-law graphs: a hub
  of degree d contributes O(d^2) wedges, so one celebrity vertex can
  dwarf the rest of the job. Capping drops all edges incident to
  vertices above the cap BEFORE wedge enumeration (the same
  hot-bucket-cap pattern as LSH `max_bucket_size`,
  operators/similarity.py:81) — an explicit, documented approximation:
  triangles through dropped hubs are not counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def degree_cap_edges(edges: DataFrame, max_degree: int) -> DataFrame:
    """Drop every edge incident to a vertex whose (undirected) degree
    exceeds `max_degree`. The heavy-vertex set is the tail above the
    cap — at most 2|E|/max_degree vertices — so both anti-joins
    broadcast; the big edge list never shuffles. Callers should persist
    `edges` first: the degree aggregate is a second consumer of it."""
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    heavy = deg.filter(F.col("deg") > max_degree).select("v")
    return (
        edges.join(F.broadcast(heavy.select(F.col("v").alias("a"))), "a", "left_anti")
        .join(F.broadcast(heavy.select(F.col("v").alias("b"))), "b", "left_anti")
    )


def oriented_triangle_stats(
    edges: DataFrame, max_degree: int | None = None
) -> tuple[int, int, int]:
    """Count (edges, wedges, triangles) over an oriented low->high edge
    list with ONE computation of each intermediate. The edge list is
    persisted for its multiple consumers (e1/e2/closing + its own
    count) and unpersisted before returning; the wedge set — the
    O(sum d²) blowup that must NEVER be cached (49M rows at sf0.1,
    arbitrarily large on real graphs) — streams through a SINGLE pass:
    a left join against the (unique-keyed) closing edges feeds one
    aggregate computing wedge count and triangle count together.
    Returns exact integer counts (driver-side O(1) state). When
    `max_degree` is set, all three counts describe the capped graph."""
    raw = edges.persist(StorageLevel.MEMORY_AND_DISK)
    capped = raw
    try:
        if max_degree is not None:
            capped = degree_cap_edges(raw, max_degree).persist(
                StorageLevel.MEMORY_AND_DISK
            )
        n_edges = capped.count()
        e1 = capped.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = capped.select(F.col("a").alias("y"), F.col("b").alias("z"))
        wedges = e1.join(e2, "y").select("x", "z")
        # closing edges have UNIQUE (x, z) keys (the edge list is
        # distinct), so the left join preserves the wedge count and
        # count(__closed) counts exactly the closed wedges = triangles
        closing = capped.select(
            F.col("a").alias("x"), F.col("b").alias("z"), F.lit(1).alias("__closed")
        )
        row = (
            wedges.join(closing, ["x", "z"], "left")
            .agg(
                F.count(F.lit(1)).alias("n_wedges"),
                F.count("__closed").alias("n_triangles"),
            )
            .collect()[0]
        )
        n_wedges, n_triangles = int(row["n_wedges"]), int(row["n_triangles"])
    finally:
        if capped is not raw:
            capped.unpersist()
        raw.unpersist()
    return n_edges, n_wedges, n_triangles
