"""Sources: csv round-trip, fixed-width, raw text with header skip, json
path extraction, generators, filesystem scans (SURVEY §2.1)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pentaho_kettle_spark.sources import (
    csv_input,
    csv_output,
    data_grid,
    fixed_input,
    get_system_data,
    random_value,
    row_generator,
    text_file_input,
)
from pentaho_kettle_spark.sources.files import json_path_fields
from pentaho_kettle_spark.sources.generators import get_filenames, get_files_rows_count


def test_csv_roundtrip(spark, tmp_path):
    df = data_grid(spark, [(1, "a,b", 2.5), (2, 'q"x', None)], "id int, s string, v double")
    out = str(tmp_path / "csv")
    csv_output(df, out, header=True, single_file=True)
    back = csv_input(spark, out, schema="id int, s string, v double", header=True)
    got = sorted(back.collect(), key=lambda r: r.id)
    assert got[0].s == "a,b" and got[0].v == 2.5
    assert got[1].s == 'q"x' and got[1].v is None


def test_fixed_width(spark, tmp_path):
    p = str(tmp_path / "fixed.txt")
    with open(p, "w") as f:
        f.write("alice  042\nbob    007\n")
    df = fixed_input(spark, p, [("name", 0, 7, "String"), ("num", 7, 3, "Integer")])
    got = {r.name: r.num for r in df.collect()}
    assert got == {"alice": 42, "bob": 7}


def test_text_input_header_skip_and_filter(spark, tmp_path):
    p = str(tmp_path / "t.txt")
    with open(p, "w") as f:
        f.write("HEADER\nrow-1\nrow-2\nskip-me\n")
    df = text_file_input(spark, p, skip_header_lines=1, filter_regex=r"^row-")
    assert sorted(r.line for r in df.collect()) == ["row-1", "row-2"]


def test_json_path_fields(spark):
    df = spark.createDataFrame([('{"a": {"b": 7}, "c": "x"}',)], "j string")
    out = json_path_fields(df, "j", {"ab": "$.a.b", "c": "$.c"})
    r = out.collect()[0]
    assert r.ab == "7" and r.c == "x"


def test_row_generator_and_system_data(spark):
    df = row_generator(spark, 5, constants={"k": "v"}, rownum_field="rn")
    rows = sorted(df.collect(), key=lambda r: r.rn)
    assert len(rows) == 5 and rows[0].k == "v" and rows[0].rn == 1
    sd = get_system_data(spark, {"now": "system_date", "ver": "spark_version"})
    assert sd.count() == 1 and sd.collect()[0].ver == spark.version


def test_random_value_seeded_deterministic(spark):
    df = row_generator(spark, 3, rownum_field="rn").coalesce(1)
    a = random_value(df, {"r": "number"}, seed=7).select("r").collect()
    b = random_value(df, {"r": "number"}, seed=7).select("r").collect()
    assert a == b


def test_filesystem_scans(spark, tmp_path):
    (tmp_path / "x.csv").write_text("a\n1\n")
    (tmp_path / "y.csv").write_text("a\n1\n2\n")
    (tmp_path / "sub").mkdir()
    df = get_filenames(spark, str(tmp_path), pattern="*.csv")
    assert sorted(r.short_filename for r in df.collect()) == ["x.csv", "y.csv"]
    rc = get_files_rows_count(spark, "/root/testdata/sf0.001/region.parquet")
    assert rc.collect()[0].rows == 5
