#!/usr/bin/env python
"""Third-decade probe: does ANN SERVING stay flat while scans grow
linearly, across sf0.1 -> sf1 -> sf10 (100x the bench corpus)?

This is the claim the 100-TB design rests on — an indexed query batch
reads n_probe/n_centroids of the corpus via directory pruning, so its
cost tracks the query batch, not corpus size — probed here one decade
beyond SCALING_CURVE's sf1 point. Full-registry timing/correctness at
sf10 is NOT the goal (that's the sf1 campaign); this synthesizes ONLY
the tables the probe and decade scripts read:

  - embeddings (x10 from the sf1 fixture): keys shift per replica;
    each replica r>0 applies rotate-by-r THEN negate-first-r-dims — a
    distinct orthogonal transform per replica, so norms and
    within-replica geometry are exact while cross-replica cosines
    decorrelate (the reflection breaks the rotation-sum collisions a
    second bare rotation round would create against sf1's replicas).
  - lineitem / documents (x10): key shifts only — the probe's scan
    queries (pricing_summary, docs_fingerprint) are row-proportional
    regardless of values, and no dedup/near-dup query runs here.

Output: one JSON line appended to SCALING_CURVE_r10.jsonl with
min-of-2-after-warm timings per query per decade. Serving queries build
their index eagerly at plan build (cached per sf_dir) — the timed save
is pure serving, which is exactly the claim under test.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from redpanda_to_parquet_writer_spark.config import EngineConfig  # noqa: E402
from redpanda_to_parquet_writer_spark.plans import QUERIES  # noqa: E402
from redpanda_to_parquet_writer_spark.session import get_spark  # noqa: E402

SF1_DIR = os.path.join(ROOT, ".scaling_sf1")
SF10_DIR = os.path.join(ROOT, ".scaling_sf10")
REPLICAS = 10

#: serving (expected ~flat) vs scan (expected ~linear) contrast set
SERVING = ["ann_ivf_indexed_topk", "ann_ivfadc_indexed_topk"]
SCANS = ["pricing_summary", "docs_fingerprint"]


def synthesize_sf10() -> None:
    import duckdb

    os.makedirs(SF10_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in ("lineitem", "documents", "embeddings", "events"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF1_DIR}/{t}.parquet'"
        )
    dim = int(con.execute("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0])

    def union(table: str, selects) -> str:
        return " UNION ALL ".join(
            f"SELECT {', '.join(selects(i))} FROM {table}" for i in range(REPLICAS)
        )

    li_pad = int(con.execute("SELECT max(l_orderkey)+1 FROM lineitem").fetchone()[0])
    con.execute(
        "COPY ({}) TO '{}/lineitem.parquet' (FORMAT PARQUET)".format(
            union(
                "lineitem",
                lambda i: [
                    f"l_orderkey + {i * li_pad} AS l_orderkey",
                    "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                    "l_linestatus", "l_shipdate",
                ],
            ),
            SF10_DIR,
        )
    )
    print("synthesized lineitem", flush=True)
    doc_pad = int(con.execute("SELECT max(doc_id)+1 FROM documents").fetchone()[0])
    con.execute(
        "COPY ({}) TO '{}/documents.parquet' (FORMAT PARQUET)".format(
            union(
                "documents",
                lambda i: [
                    f"doc_id + {i * doc_pad} AS doc_id",
                    "text", "lang", "source", "n_chars",
                ],
            ),
            SF10_DIR,
        )
    )
    print("synthesized documents", flush=True)
    # events (x10, r13): event_id and user_id shift per replica (user
    # series stay disjoint and same-length — bounded window keys stay
    # bounded), ts/type/value unchanged so (type, hour) buckets get 10x
    # hotter — the skew case the r11/r12 event-side rewrites exist for
    ev_pad = int(con.execute("SELECT max(event_id)+1 FROM events").fetchone()[0])
    u_pad = int(con.execute("SELECT max(user_id)+1 FROM events").fetchone()[0])
    con.execute(
        "COPY ({}) TO '{}/events.parquet' (FORMAT PARQUET)".format(
            union(
                "events",
                lambda i: [
                    f"event_id + {i * ev_pad} AS event_id",
                    "ts",
                    f"user_id + {i * u_pad} AS user_id",
                    "event_type", "value", "props",
                ],
            ),
            SF10_DIR,
        )
    )
    print("synthesized events", flush=True)
    vec_pad = int(con.execute("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0])

    def emb_select(i):
        if i == 0:
            e = "embedding"
        else:
            # rotate by i, then negate the first i dims of the rotated
            # vector: a distinct orthogonal transform per replica
            rot = f"embedding[{i + 1}:{dim}] || embedding[1:{i}]"
            e = (
                f"list_transform(list_zip({rot}, range(1, {dim + 1})),"
                f" z -> CASE WHEN z[2] <= {i} THEN -z[1] ELSE z[1] END)"
            )
        return [f"vec_id + {i * vec_pad} AS vec_id", f"CAST({e} AS FLOAT[]) AS embedding", "label"]

    con.execute(
        "COPY ({}) TO '{}/embeddings.parquet' (FORMAT PARQUET)".format(
            union("embeddings", emb_select), SF10_DIR
        )
    )
    print("synthesized embeddings", flush=True)


def main() -> None:
    if not os.path.exists(os.path.join(SF1_DIR, "embeddings.parquet")):
        raise SystemExit("run scripts/scaling_sf1.py --synth-only first")
    if not os.path.exists(os.path.join(SF10_DIR, "embeddings.parquet")):
        synthesize_sf10()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g"),
        ),
        app_name="scaling_sf10_probe",
    )
    out: dict[str, dict[str, float]] = {}
    for sf, d in (("0.1", "/root/testdata/sf0.1"), ("1", SF1_DIR), ("10", SF10_DIR)):
        for name in SERVING + SCANS:
            t_build0 = time.perf_counter()
            df = QUERIES[name](spark, d)  # eager index build happens here
            build = time.perf_counter() - t_build0
            df.write.mode("overwrite").format("noop").save()  # warm
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            out.setdefault(name, {})[sf] = round(min(runs), 4)
            out[name][f"{sf}_build"] = round(build, 2)
            print(f"sf{sf} {name}: serve={min(runs):.3f}s (plan+index build {build:.1f}s)", flush=True)
    line = {
        "metric": "sf10_serving_flatness_probe",
        "note": (
            "Three-decade serving-vs-scan contrast (sf0.1/1/10, 100x corpus): "
            "indexed ANN serving cost must track the query batch "
            "(n_probe/n_centroids directory pruning), not corpus size, while "
            "full-scan aggregates grow with rows. Timings are min-of-2 after "
            "warm; *_build records the one-time eager plan+index build."
        ),
        "queries": out,
    }
    print(json.dumps(line), flush=True)
    with open(os.path.join(ROOT, "SCALING_CURVE_r10.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
