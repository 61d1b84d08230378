"""String-shaping steps (SURVEY §2.2).

Reference kernels: stringoperations/StringOperations.java,
replacestring/ReplaceString.java, stringcut/StringCut.java,
fieldsplitter/FieldSplitter.java, splitfieldtorows/SplitFieldToRows.java,
concatfields/ConcatFields.java. All pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pentaho_kettle_spark.types import apply_trim


def string_operations(
    df: DataFrame,
    field: str,
    trim_type: str = "none",
    case: str | None = None,  # upper | lower | initcap
    digits: str | None = None,  # only | remove
    remove_special: str | None = None,  # regex char class to strip
    pad: tuple[str, int, str] | None = None,  # (left|right, len, char)
    out_field: str | None = None,
) -> DataFrame:
    c = F.col(field)
    c = apply_trim(c, trim_type)
    if case == "upper":
        c = F.upper(c)
    elif case == "lower":
        c = F.lower(c)
    elif case == "initcap":
        c = F.initcap(c)
    if digits == "only":
        c = F.regexp_replace(c, "[^0-9]", "")
    elif digits == "remove":
        c = F.regexp_replace(c, "[0-9]", "")
    if remove_special:
        c = F.regexp_replace(c, remove_special, "")
    if pad:
        side, ln, ch = pad
        c = F.lpad(c, ln, ch) if side == "left" else F.rpad(c, ln, ch)
    return df.withColumn(out_field or field, c)


def replace_in_string(
    df: DataFrame,
    field: str,
    search: str,
    replace: str,
    use_regex: bool = False,
    whole_word: bool = False,
    case_sensitive: bool = True,
    out_field: str | None = None,
) -> DataFrame:
    c = F.col(field)
    pat = search if use_regex else _regex_quote(search)
    if whole_word:
        pat = rf"\b{pat}\b"
    if not case_sensitive:
        pat = f"(?i){pat}"
    return df.withColumn(out_field or field, F.regexp_replace(c, pat, replace))


def _regex_quote(s: str) -> str:
    import re

    return re.escape(s)


def strings_cut(df: DataFrame, field: str, start: int, end: int, out_field: str | None = None) -> DataFrame:
    """Kettle cut positions are 0-based [start, end) — substring is 1-based."""
    return df.withColumn(out_field or field, F.substring(F.col(field), start + 1, end - start))


def split_fields(
    df: DataFrame, field: str, delimiter: str, new_fields: list[str], drop_source: bool = True
) -> DataFrame:
    parts = F.split(F.col(field), _regex_quote(delimiter))
    for i, nf in enumerate(new_fields):
        df = df.withColumn(nf, parts.getItem(i))
    return df.drop(field) if drop_source else df


def split_field_to_rows(
    df: DataFrame,
    field: str,
    delimiter: str,
    new_field: str,
    rownum_field: str | None = None,
    is_regex: bool = False,
) -> DataFrame:
    pat = delimiter if is_regex else _regex_quote(delimiter)
    parts = F.split(F.col(field), pat)
    if rownum_field:
        df = df.select("*", F.posexplode(parts).alias(rownum_field, new_field))
        df = df.withColumn(rownum_field, F.col(rownum_field) + 1)  # Kettle rownum is 1-based
    else:
        df = df.select("*", F.explode(parts).alias(new_field))
    return df.drop(field)


def concat_fields(
    df: DataFrame, fields: list[str], separator: str, out_field: str
) -> DataFrame:
    return df.withColumn(out_field, F.concat_ws(separator, *[F.col(f) for f in fields]))


def regex_eval(
    df: DataFrame,
    field: str,
    pattern: str,
    result_field: str = "result",
    capture_fields: list[str] | None = None,
) -> DataFrame:
    """regexeval/RegexEval.java: match flag + capture groups → new fields."""
    c = F.col(field)
    df = df.withColumn(result_field, c.rlike(pattern))
    for i, cf in enumerate(capture_fields or [], start=1):
        df = df.withColumn(cf, F.when(F.col(result_field), F.regexp_extract(c, pattern, i)))
    return df
