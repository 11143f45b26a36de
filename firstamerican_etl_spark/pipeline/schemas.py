"""Staged-schema contracts per FA family.

Raw ingestion is header-named and all-string (see
``convert.read_family_csv`` — an explicit positional CSV schema would
silently misalign on real extracts that carry hundreds of columns), so
the typed contract lives HERE, on the staged outputs: each convert
stage must produce exactly these columns with exactly these types.
``assert_staged_schema`` is called by the golden tests and is available
to production runs as a write-time guard — schema drift in an upstream
extract surfaces as a loud diff, not as silently-null columns three
joins later.

Types follow SURVEY.md §1.2: ids/amounts/years long, code columns
string (leading zeros — fa-etl.py:69,170-173), compact dates DateType,
lat/long double, TaxAmtAdjusted double (the /100 division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable=True) for n, t in fields])


_str = T.StringType()
_long = T.LongType()
_date = T.DateType()
_dbl = T.DoubleType()
_int = T.IntegerType()

#: convert.clean_deed output (fa-etl.py:61-83)
STAGED_DEED = _s(
    ("PropertyID", _long), ("SaleAmt", _long), ("RecordingDate", _date),
    ("FIPS", _str), ("FATimeStamp", _date), ("FATransactionID", _str),
    ("TransactionType", _str), ("SaleDate", _date),
    ("RecordingYearSlice", _str), ("FATransactionID_1", _str),
    ("RecordingYear", _long), ("SaleYear", _int), ("FATimeStampYear", _int),
    ("SaleFlag", _int),
)

#: convert.rank_deed output (fa-etl.py:96-106)
RANKED_DEED = _s(("PropertyID", _long), ("SaleAmt", _long), ("RecordingYear", _long))

#: convert.clean_prop output (fa-etl.py:162-177)
STAGED_PROP = _s(
    ("PropertyID", _long), ("PropertyClassID", _str), ("FATimeStamp", _date),
    ("SitusLatitude", _dbl), ("SitusLongitude", _dbl),
    ("SitusFullStreetAddress", _str), ("SitusCity", _str), ("SitusState", _str),
    ("SitusZIP5", _str), ("FIPS", _str), ("SitusCensusTract", _str),
    ("SitusCensusBlock", _str), ("SitusGeoStatusCode", _str),
    ("FIPS_SitusCensusTract", _str),
)

#: convert.clean_taxhist output (fa-etl.py:228-235)
STAGED_TAXHIST = _s(
    ("PropertyID", _long), ("TaxYear", _long), ("TaxAmt", _long),
    ("TaxAmtAdjusted", _dbl),
)

#: convert.clean_valhist output (fa-etl.py:297-309)
STAGED_VALHIST = _s(
    ("PropertyID", _long), ("AssdTotalValue", _long), ("AssdYear", _long),
    ("MarketTotalValue", _long), ("MarketValueYear", _long),
    ("ApprTotalValue", _long), ("ApprYear", _long), ("TaxableYear", _long),
)

#: convert.valhist_long output (fa-etl.py:394-419)
RANKED_VALHIST = _s(
    ("PropertyID", _long), ("Year", _long), ("Value", _long),
    ("MarketTotalValue", _long), ("ApprTotalValue", _long),
)

STAGED_SCHEMAS = {
    "deed": STAGED_DEED,
    "ranked_deed": RANKED_DEED,
    "prop": STAGED_PROP,
    "taxhist": STAGED_TAXHIST,
    "valhist": STAGED_VALHIST,
    "ranked_valhist": RANKED_VALHIST,
}


def assert_staged_schema(df: DataFrame, family: str) -> DataFrame:
    """Raise if ``df`` deviates from the declared staged contract
    (column names, order, and types; nullability ignored). Returns the
    DataFrame for chaining."""
    expected = STAGED_SCHEMAS[family]
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in expected.fields]
    if got != want:
        raise TypeError(
            f"staged schema drift for {family!r}:\n  got  {got}\n  want {want}"
        )
    return df
