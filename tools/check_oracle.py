"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, schema
(column names), and order-insensitive values (exact after the queries' own
rounding). Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from pentaho_kettle_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_CHECK_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]").astype("int64")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].astype("float64")
        elif str(pdf[c].dtype) in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            pdf[c] = pdf[c].astype("int64")
        elif str(pdf[c].dtype) == "decimal":
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def main(names: list[str]) -> int:
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = names or list(qs)
    failures = []
    for name in targets:
        t0 = time.time()
        try:
            got = qs[name](spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            if len(got) == 0 and name != "simhash_candidates":
                failures.append(name)
                print(f"FAIL {name}: 0 rows from rows-only query")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, w = _normalize(got), _normalize(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} != {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"columns {list(g.columns)} != {list(w.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status.append(f"values: {str(e).splitlines()[-1][:200]}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"PASS {name} ({len(g)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(targets) - len(failures)}/{len(targets)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
