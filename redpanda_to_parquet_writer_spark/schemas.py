"""Declared entity schema catalogs (V3 inputs).

The reference declares six dataclass schemas keyed by sec_type
(parquet_to_polars.py:51-267) and validates actual files against them
(Missing/Present/Extra report, reader:445-489). Spark-side these are
StructType catalogs; `operators.profile.schema_conformance` does the diff.

Field sets transcribed from FIXTURES.md sections 3-4 (which derives them
from reader:51-267). All market-data fields nullable — the reference's
dataclasses default-to-None on required fields at materialization time.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, True)


#: common base fields for all market-data sec types (reader:54-68)
BASE_FIELDS = [
    _f("conId", LongType()),
    _f("symbol", StringType()),
    _f("local_symbol", StringType()),
    _f("symbol_key", StringType()),
    _f("currency", StringType()),
    _f("exchange", StringType()),
    _f("sec_type", StringType()),
    _f("timestamp", StringType()),
    _f("unix_timestamp_ms", LongType()),
    _f("mid_price", DoubleType()),
    _f("spread", DoubleType()),
    _f("has_liquidity", BooleanType()),
]

_MARKET_FIELDS = [
    _f("last", DoubleType()),
    _f("last_size", LongType()),
    _f("bid", DoubleType()),
    _f("bid_size", LongType()),
    _f("ask", DoubleType()),
    _f("ask_size", LongType()),
    _f("high", DoubleType()),
    _f("low", DoubleType()),
    _f("close", DoubleType()),
    _f("volume", LongType()),
]

#: IND (IndexMarketData, reader:51-76)
IND_SCHEMA = StructType(
    BASE_FIELDS
    + [
        _f("close", DoubleType()),
        _f("last", DoubleType()),
        _f("last_size", LongType()),
        _f("high", DoubleType()),
        _f("low", DoubleType()),
        _f("index_value", DoubleType()),
    ]
)

#: FUT (FuturesMarketData, reader:79-110)
FUT_SCHEMA = StructType(BASE_FIELDS + _MARKET_FIELDS)

#: STK (StockMarketData, reader:173-202)
STK_SCHEMA = StructType(BASE_FIELDS + _MARKET_FIELDS)

#: OPT (OptionsMarketData, reader:113-170)
OPT_SCHEMA = StructType(
    BASE_FIELDS
    + _MARKET_FIELDS
    + [
        _f("strike", DoubleType()),
        _f("right", StringType()),
        _f("expiry", StringType()),
        _f("putOpenInterest", LongType()),
        _f("callOpenInterest", LongType()),
        _f("implied_vol", DoubleType()),
        _f("delta", DoubleType()),
        _f("gamma", DoubleType()),
        _f("theta", DoubleType()),
        _f("vega", DoubleType()),
        _f("underlying_price", DoubleType()),
        _f("CallGammaExposure", DoubleType()),
        _f("PutGammaExposure", DoubleType()),
        _f("net_gamma_exposure", DoubleType()),
        _f("volume_weighted_call_gamma", DoubleType()),
        _f("volume_weighted_put_gamma", DoubleType()),
        _f("volume_weighted_net_gamma", DoubleType()),
        _f("dte_weight", DoubleType()),
        _f("volume_weight", DoubleType()),
        _f("combined_weight", DoubleType()),
        _f("days_to_expiration", LongType()),
        _f("minutes_to_expiration", LongType()),
    ]
)

#: BAG (MultiLegOptionsData, reader:205-257). conId is a comma-separated
#: STRING for combos; combo_legs stores as a JSON string per the flatten
#: rule (lists -> JSON, collector:279-280).
BAG_SCHEMA = StructType(
    [f for f in BASE_FIELDS if f.name != "conId"]
    + [
        _f("conId", StringType()),
        _f("strategy_type", StringType()),
        _f("center_strike", DoubleType()),
        _f("wing_width", LongType()),
        _f("expiration", StringType()),
        _f("combo_legs", StringType()),
        _f("leg_count", LongType()),
        _f("leg_actions", StringType()),
        _f("leg_conIds", StringType()),
        _f("days_to_expiration", LongType()),
        _f("minutes_to_expiration", LongType()),
    ]
    + _MARKET_FIELDS
)

#: ACCOUNT_VALUES (reader:260-267)
ACCOUNT_VALUES_SCHEMA = StructType(
    [
        _f("account", StringType()),
        _f("timestamp", StringType()),
        _f("values", MapType(StringType(), StringType())),
        _f("raw_count", LongType()),
        _f("processed_count", LongType()),
    ]
)

#: sec_type -> declared schema (the dataclass map, reader:279-286)
SEC_TYPE_SCHEMAS: dict[str, StructType] = {
    "IND": IND_SCHEMA,
    "FUT": FUT_SCHEMA,
    "OPT": OPT_SCHEMA,
    "STK": STK_SCHEMA,
    "BAG": BAG_SCHEMA,
    "ACCOUNT_VALUES": ACCOUNT_VALUES_SCHEMA,
}
