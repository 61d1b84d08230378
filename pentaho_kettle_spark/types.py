"""Kettle ValueMeta type system → Spark types + lenient coercion builders.

Reference: core/src/main/java/org/pentaho/di/core/row/ValueMetaInterface.java
(type constants) and ValueMetaBase.java#convertData (lenient string→X parsing
with conversion masks). Here every coercion is a Catalyst *expression builder*
(Column -> Column) — never per-row Python — so conversions stay inside
whole-stage codegen.

Deviations (documented per SURVEY §1.2):
  - TYPE_DATE carries time-of-day → TimestampType (NOT DateType).
  - TYPE_BIGNUMBER (unbounded BigDecimal) → DecimalType(38, s) precision cap.
  - TYPE_TIMESTAMP ns → µs truncation (Spark timestamps are µs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Kettle type name (as it appears in .ktr XML / ValueMetaFactory) → Spark type.
KETTLE_TO_SPARK: dict[str, T.DataType] = {
    "Number": T.DoubleType(),
    "String": T.StringType(),
    "Date": T.TimestampType(),  # Kettle Date includes time of day
    "Boolean": T.BooleanType(),
    "Integer": T.LongType(),  # Kettle Integer is always 64-bit
    "BigNumber": T.DecimalType(38, 18),
    "Serializable": T.BinaryType(),
    "Binary": T.BinaryType(),
    "Timestamp": T.TimestampType(),
    "Internet Address": T.StringType(),
}

# Kettle trim types (ValueMetaInterface#TRIM_TYPE_*)
TRIM_NONE, TRIM_LEFT, TRIM_RIGHT, TRIM_BOTH = "none", "left", "right", "both"


def apply_trim(col: Column, trim_type: str) -> Column:
    return {
        TRIM_NONE: col,
        TRIM_LEFT: F.ltrim(col),
        TRIM_RIGHT: F.rtrim(col),
        TRIM_BOTH: F.trim(col),
    }[trim_type]


def coerce_to_boolean(col: Column) -> Column:
    """Kettle lenient string→boolean: 'Y','TRUE','YES','1' (any case) → true.

    Ref: ValueMetaBase#convertStringToBoolean.
    """
    up = F.upper(F.trim(col.cast("string")))
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
        up.isin("Y", "TRUE", "YES", "1")
    )


def coerce_to_integer(col: Column, mask: str | None = None) -> Column:
    """Lenient string→long; with a grouping mask, strip separators first."""
    c = col.cast("string")
    if mask and "," in mask:
        c = F.regexp_replace(c, ",", "")
    return F.trim(c).cast("long")


def coerce_to_number(col: Column, mask: str | None = None, grouping: str = ",") -> Column:
    c = col.cast("string")
    if mask and grouping in mask:
        c = F.regexp_replace(c, F.lit(grouping), F.lit(""))
    return F.trim(c).cast("double")


def coerce_to_date(col: Column, mask: str | None = None) -> Column:
    """String→timestamp with an explicit conversion mask (Java SimpleDateFormat
    masks map ~1:1 to Spark datetime patterns for the common cases)."""
    if mask:
        return F.to_timestamp(col.cast("string"), mask)
    return F.coalesce(
        F.to_timestamp(col.cast("string"), "yyyy-MM-dd HH:mm:ss"),
        F.to_timestamp(col.cast("string"), "yyyy/MM/dd HH:mm:ss"),
        F.to_timestamp(col.cast("string"), "yyyy-MM-dd"),
    )


def coerce_to_string(col: Column, mask: str | None = None) -> Column:
    """X→string honoring a format mask (dates: Java pattern; numbers: printf)."""
    if mask:
        return F.date_format(col, mask)
    return col.cast("string")


def cast_to_kettle_type(col: Column, kettle_type: str, mask: str | None = None) -> Column:
    if kettle_type == "Boolean":
        return coerce_to_boolean(col)
    if kettle_type == "Integer":
        return coerce_to_integer(col, mask)
    if kettle_type == "Number":
        return coerce_to_number(col, mask)
    if kettle_type in ("Date", "Timestamp"):
        return coerce_to_date(col, mask)
    if kettle_type == "String":
        return coerce_to_string(col, mask)
    return col.cast(KETTLE_TO_SPARK[kettle_type])
