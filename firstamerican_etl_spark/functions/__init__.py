from firstamerican_etl_spark.functions.scalar import (
    cast_long,
    cast_string,
    coalesce_cascade,
    compact_date,
    concat_with_fallback,
    domain_whitelist,
    flag_when,
    lpad_code,
    null_column,
    nullif_zero,
    year_of,
    year_slice,
)

__all__ = [
    "cast_long",
    "cast_string",
    "coalesce_cascade",
    "compact_date",
    "concat_with_fallback",
    "domain_whitelist",
    "flag_when",
    "lpad_code",
    "null_column",
    "nullif_zero",
    "year_of",
    "year_slice",
]
