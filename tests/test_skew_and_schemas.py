"""Skew-mitigation join helper + declared schema catalogs (V3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_to_parquet_writer_spark.operators.profile import schema_conformance
from redpanda_to_parquet_writer_spark.operators.skew import salted_join
from redpanda_to_parquet_writer_spark.schemas import (
    OPT_SCHEMA,
    SEC_TYPE_SCHEMAS,
    STK_SCHEMA,
)
from redpanda_to_parquet_writer_spark.sources.parquet import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting is a physical rewrite only — result set identical to the
    plain equi-join, including rows whose key misses the small side."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    small = part.withColumnRenamed("p_partkey", "l_partkey")

    plain = lineitem.join(small, on=["l_partkey"], how="inner")
    salted = salted_join(lineitem, small, on=["l_partkey"], salt_buckets=8)

    assert salted.count() == plain.count()
    key = ["l_partkey", "l_orderkey", "l_quantity", "p_brand"]
    assert (
        salted.select(key).exceptAll(plain.select(key)).count() == 0
        and plain.select(key).exceptAll(salted.select(key)).count() == 0
    )


def test_salted_join_left_outer(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    # small side covering only half the key space -> unmatched rows survive
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 2 == 0)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    plain = lineitem.join(part, on=["l_partkey"], how="left")
    salted = salted_join(lineitem, part, on=["l_partkey"], salt_buckets=4, how="left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("p_brand").isNull()).count()
        == plain.filter(F.col("p_brand").isNull()).count()
    )


def test_schema_catalogs_wellformed():
    assert set(SEC_TYPE_SCHEMAS) == {
        "IND", "FUT", "OPT", "STK", "BAG", "ACCOUNT_VALUES",
    }
    for name, schema in SEC_TYPE_SCHEMAS.items():
        field_names = [f.name for f in schema.fields]
        assert len(field_names) == len(set(field_names)), f"{name} has dup fields"
    # OPT extends the market fields with greeks (reader:113-170)
    opt_fields = {f.name for f in OPT_SCHEMA.fields}
    assert {"strike", "right", "expiry", "delta", "gamma"} <= opt_fields


def test_schema_conformance_against_catalog(spark):
    """V3 report: a frame with some STK fields + an extra column yields the
    expected Missing/Present/Extra partition (reader:445-489)."""
    df = spark.createDataFrame(
        [("AAPL", 1.0, 189.0, 42)],
        "symbol string, spread double, last double, bogus int",
    )
    report = schema_conformance(df, STK_SCHEMA)
    assert report.present == ["last", "spread", "symbol"]
    assert "bid" in report.missing and "volume" in report.missing
    assert report.extra == ["bogus"]
    assert not report.conformant


def test_typed_rows_materialization(spark):
    from redpanda_to_parquet_writer_spark.reader import typed_rows

    df = spark.createDataFrame(
        [("AAPL", 189.0, None), ("MSFT", 402.5, 100.0)],
        "symbol string, last double, bid double",
    )
    rows = typed_rows(df, "STK")
    assert len(rows) == 2
    # declared-but-absent fields materialize as None
    assert rows[0]["volume"] is None and rows[0]["symbol"] == "AAPL"
    # required fields drop rows null in those fields only
    filtered = typed_rows(df, "STK", required=("bid",))
    assert [r["symbol"] for r in filtered] == ["MSFT"]
