"""Payload decode (P1): MessagePack / JSON -> columns, with fallback.

Reference chain (collector:223-256): try msgpack -> try JSON -> keep
``raw_value`` string. Format is sampled once per topic (S5,
collector:172-220) so the hot path runs ONE decoder, not a per-row
try/except cascade.

Spark realization:
  - JSON: `from_json` with a schema inferred from a driver-side sample
    (per micro-batch or per topic) — JVM-side, codegen'd, no Python.
  - MessagePack: no builtin, so an Arrow-vectorized pandas_udf
    bytes -> JSON string, then the same `from_json`. Import-gated: the
    container has no msgpack, so the UDF raises a clear error if used
    without the library (SURVEY 2.11).
  - Fallback: rows whose decode returned null keep `raw_value`
    (collector:241,256,402).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

try:  # not in the test container; real deployments pip-install it
    import msgpack  # type: ignore

    HAS_MSGPACK = True
except ImportError:
    msgpack = None
    HAS_MSGPACK = False


def infer_json_schema(spark: SparkSession, json_strings: list[str]) -> StructType:
    """Infer a unioned schema from a sample of JSON documents (driver-side).

    The per-topic analogue of the reference's dynamic Polars inference
    (collector:1225): sample N docs, let Spark's JSON reader merge their
    schemas. Sampling is bounded, so this is O(sample), not O(data).
    """
    df = spark.read.json(spark.createDataFrame([(s,) for s in json_strings], ["value"]).rdd.map(lambda r: r.value))
    # undecodable sample docs make the JSON reader add its corrupt-record
    # column; that's an inference artifact, not payload schema
    return StructType([f for f in df.schema.fields if f.name != "_corrupt_record"])


CORRUPT_COL = "_corrupt_payload"


def decode_json(df: DataFrame, schema: StructType, value_col: str = "value") -> DataFrame:
    """JSON bytes/string -> struct column `decoded` + `raw_value` fallback.

    Rows that fail to parse keep `raw_value` (collector:241). PERMISSIVE
    from_json yields an all-null struct for garbage (not a null struct),
    so failure detection uses the corrupt-record column instead.
    """
    from pyspark.sql.types import StructField

    as_string = F.col(value_col).cast("string")
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    decoded = F.from_json(
        as_string, with_corrupt, {"columnNameOfCorruptRecord": CORRUPT_COL}
    )
    return (
        df.withColumn("decoded", decoded)
        .withColumn("raw_value", F.col(f"decoded.{CORRUPT_COL}"))
        .withColumn("decoded", F.col("decoded").dropFields(CORRUPT_COL))
    )


def msgpack_to_json_udf():
    """Arrow-vectorized msgpack-bytes -> JSON-string decoder.

    pandas_udf so bytes move via Arrow batches, not per-row pickling
    (the reference's one Python hot loop, made vectorized; SURVEY 4
    "msgpack UDF throughput" risk).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not HAS_MSGPACK:
        raise ImportError(
            "msgpack is not installed; msgpack decode is unavailable in this "
            "environment (JSON decode is unaffected)"
        )

    @pandas_udf(StringType())
    def _decode(values: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            try:
                return json.dumps(
                    msgpack.unpackb(bytes(b), raw=False), separators=(",", ":")
                )
            except Exception:
                return None

        return values.map(one)

    return _decode


def detect_format(sample_values: list[bytes], threshold: float = 0.9) -> str:
    """Format sampler (S5, collector:172-220): majority vote over a sample.

    >90% msgpack-decodable -> 'msgpack', else 'json'. Driver-side over a
    bounded sample; the verdict is cached per topic by the caller.
    """
    if not sample_values:
        return "json"
    if not HAS_MSGPACK:
        return "json"
    ok = 0
    for b in sample_values:
        try:
            msgpack.unpackb(bytes(b), raw=False)
            ok += 1
        except Exception:
            pass
    return "msgpack" if ok / len(sample_values) > threshold else "json"
