"""Explicit StructTypes for the forex rate-observation tables.

The reference declares these inline as SQLite DDL (CREATE TABLE IF NOT
EXISTS at /root/reference/etl/csv_loader.py:123-135,
etl/api_fetcher.py:131-142, etl/web_scraper.py:130-141); here they are
engine-level schema contracts. Promotions over the reference's
all-TEXT storage: date → DateType, timestamptz → TimestampType (UTC
session), exchange_rate stays double for parity (DecimalType(18,6)
would be the money-safe upgrade). The autoincrement surrogate ``id``
is dropped — the natural key (currency[_name], timestamptz) is what
idempotent loads enforce (UNIQUE + INSERT OR IGNORE in the reference;
anti-join append here).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Kaggle daily-forex history CSV (source file for the CSV pipeline,
# cf. etl/config.py:28 + the column list at etl/csv_loader.py:197).
RAW_HISTORY_CSV = T.StructType(
    [
        T.StructField("currency", T.StringType()),
        T.StructField("base_currency", T.StringType()),
        T.StructField("currency_name", T.StringType()),
        T.StructField("exchange_rate", T.DoubleType()),
        T.StructField("date", T.StringType()),  # parsed with coerce-to-null later
    ]
)

# forex_rates_history (etl/csv_loader.py:123-135), sans id/created_at.
HISTORY_ROW = T.StructType(
    [
        T.StructField("currency", T.StringType()),
        T.StructField("base_currency", T.StringType()),
        T.StructField("currency_name", T.StringType()),
        T.StructField("exchange_rate", T.DoubleType()),
        T.StructField("date", T.DateType()),
        T.StructField("timestamptz", T.TimestampType()),
    ]
)

# forex_rates_api (etl/api_fetcher.py:131-142).
API_ROW = T.StructType(
    [
        T.StructField("currency", T.StringType()),
        T.StructField("base_currency", T.StringType()),
        T.StructField("exchange_rate", T.DoubleType()),
        T.StructField("date", T.DateType()),
        T.StructField("timestamptz", T.TimestampType()),
    ]
)

# forex_rates_scraped (etl/web_scraper.py:130-141).
SCRAPED_ROW = T.StructType(
    [
        T.StructField("currency_name", T.StringType()),
        T.StructField("base_currency", T.StringType()),
        T.StructField("exchange_rate", T.DoubleType()),
        T.StructField("date", T.DateType()),
        T.StructField("timestamptz", T.TimestampType()),
    ]
)

# Natural dedup keys per table (the UNIQUE constraints).
HISTORY_KEYS = ["currency", "timestamptz"]
API_KEYS = ["currency", "timestamptz"]
SCRAPED_KEYS = ["currency_name", "timestamptz"]
