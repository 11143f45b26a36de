"""Explicit raw-CSV schemas per FA file family.

The reference infers schemas from the first 1000 rows with
``ignore_errors=True`` (fa-etl.py:60,161,227,297). At 100 TB inference
is an extra pass and is sample-fragile (a county whose first 1000 FIPS
codes look numeric would lose leading zeros), so we declare every
column. Code-like columns are ``string`` end-to-end — the reference's
``str.pad_start`` restoration (fa-etl.py:69,170-173) only works when
the value was never truncated to an int in the first place. Numeric
casts happen in the transforms, nulling malformed cells exactly like
``ignore_errors``/``strict=False`` (PERMISSIVE mode + ANSI off).

Only the columns the pipeline selects are declared; PERMISSIVE mode
drops extra tokens on ragged rows like ``truncate_ragged_lines=True``.
Real FA extracts carry more columns — pass ``extra_cols`` to
``family_schema`` to widen without touching the pipeline.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable=True) for n, t in fields])


#: Deed (sales) raw columns — selected at fa-etl.py:61.
DEED_SCHEMA = _struct(
    ("PropertyID", T.StringType()),
    ("SaleAmt", T.StringType()),
    ("RecordingDate", T.StringType()),  # YYYYMMDD compact string
    ("FIPS", T.StringType()),
    ("FATimeStamp", T.StringType()),
    ("FATransactionID", T.StringType()),
    ("TransactionType", T.StringType()),
    ("SaleDate", T.StringType()),
)

#: Prop / Annual raw columns — selected at fa-etl.py:162.
PROP_SCHEMA = _struct(
    ("PropertyID", T.StringType()),
    ("PropertyClassID", T.StringType()),
    ("FATimeStamp", T.StringType()),
    ("SitusLatitude", T.DoubleType()),
    ("SitusLongitude", T.DoubleType()),
    ("SitusFullStreetAddress", T.StringType()),
    ("SitusCity", T.StringType()),
    ("SitusState", T.StringType()),
    ("SitusZIP5", T.StringType()),
    ("FIPS", T.StringType()),
    ("SitusCensusTract", T.StringType()),
    ("SitusCensusBlock", T.StringType()),
    ("SitusGeoStatusCode", T.StringType()),
)

#: TaxHist raw columns — selected at fa-etl.py:228.
TAXHIST_SCHEMA = _struct(
    ("PropertyID", T.StringType()),
    ("TaxYear", T.StringType()),
    ("TaxAmt", T.StringType()),
)

#: ValHist (wide assessment history) raw columns — selected at fa-etl.py:298.
VALHIST_SCHEMA = _struct(
    ("PropertyID", T.StringType()),
    ("AssdTotalValue", T.StringType()),
    ("AssdYear", T.StringType()),
    ("MarketTotalValue", T.StringType()),
    ("MarketValueYear", T.StringType()),
    ("ApprTotalValue", T.StringType()),
    ("ApprYear", T.StringType()),
    ("TaxableYear", T.StringType()),
)

#: family key → (schema, converter dispatch name)
FAMILY_SCHEMAS = {
    "deed": DEED_SCHEMA,
    "prop": PROP_SCHEMA,
    "taxhist": TAXHIST_SCHEMA,
    "valhist": VALHIST_SCHEMA,
}


def family_schema(
    family: str, extra_cols: list[tuple[str, T.DataType]] | None = None
) -> T.StructType:
    """Schema for a family, optionally widened with extra raw columns
    (real FA extracts have hundreds; we only type what we select)."""
    base = FAMILY_SCHEMAS[family]
    if not extra_cols:
        return base
    return T.StructType(
        list(base.fields)
        + [T.StructField(n, t, nullable=True) for n, t in extra_cols]
    )
