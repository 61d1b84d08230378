"""Golden tests for the real-Iceberg SQL path (tableio/iceberg.py).

No Iceberg jar exists in the sandbox, so the runtime class cannot execute —
these pin the generated SQL text exactly: the MERGE INTO clause structure
(LWW guard, delete/update/insert arms), the bucketed CREATE TABLE, and the
schema-evolution ALTERs. The semantics they encode are the same contract
ParquetSnapshotTableIO implements (and hash-verifies against DuckDB), so a
textual pin is the strongest in-sandbox check available. No SparkSession
needed — pure string builders."""

from __future__ import annotations

import re

import pytest

from pentaho_kettle_spark.tableio.iceberg import (
    create_table_sql,
    evolve_sql,
    merge_sql,
)


def _norm(sql: str) -> str:
    return re.sub(r"\s+", " ", sql).strip()


def test_merge_sql_golden():
    sql = _norm(
        merge_sql(
            "lake.db.transcripts",
            "chg_view",
            key_cols=["conv_id", "turn_idx"],
            data_cols=["role", "text", "tool", "ts"],
            lww_col="ts",
        )
    )
    assert sql == _norm(
        """
        MERGE INTO lake.db.transcripts t
        USING chg_view s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.op = 'D'
          AND (s.ts > t.ts OR (s.ts = t.ts AND s._seq > t._seq)) THEN DELETE
        WHEN MATCHED AND s.op <> 'D'
          AND (s.ts > t.ts OR (s.ts = t.ts AND s._seq > t._seq)) THEN UPDATE SET
          t.role = s.role, t.text = s.text, t.tool = s.tool, t.ts = s.ts,
          t._seq = s._seq
        WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT
          (conv_id, turn_idx, role, text, tool, ts, _seq)
          VALUES (s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts, s._seq)
        """
    )


def test_merge_sql_clause_order_and_guard():
    """Structural invariants that must survive any reformatting: the delete
    arm precedes update, both carry the strictly-newer LWW guard, and the
    insert arm excludes tombstones (a delete for an absent key is a no-op —
    same as ParquetSnapshotTableIO's delete_noop outcome)."""
    sql = merge_sql("t", "s", ["k"], ["v"], lww_col="ts")
    i_del = sql.index("THEN DELETE")
    i_upd = sql.index("THEN UPDATE")
    i_ins = sql.index("THEN INSERT")
    assert i_del < i_upd < i_ins
    assert sql.count("s.ts > t.ts OR (s.ts = t.ts AND s._seq > t._seq)") == 2
    assert "WHEN NOT MATCHED AND s.op <> 'D'" in sql


def test_create_table_sql_golden():
    sql = create_table_sql(
        "lake.db.transcripts",
        "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP",
        key_col="conv_id",
        n_buckets=256,
    )
    assert "PARTITIONED BY (bucket(256, conv_id))" in sql
    assert "_seq BIGINT" in sql  # the idempotence stamp rides in the table
    assert "'format-version'='2'" in sql  # row-level deletes need v2
    assert "USING iceberg" in sql


def test_evolve_sql_golden():
    t = "lake.db.transcripts"
    assert (
        evolve_sql(t, {"action": "add", "name": "lang", "type": "STRING"})
        == f"ALTER TABLE {t} ADD COLUMN lang STRING"
    )
    assert (
        evolve_sql(t, {"action": "rename", "from": "tool", "to": "tool_name"})
        == f"ALTER TABLE {t} RENAME COLUMN tool TO tool_name"
    )
    assert (
        evolve_sql(t, {"action": "widen", "name": "turn_idx", "type": "BIGINT"})
        == f"ALTER TABLE {t} ALTER COLUMN turn_idx TYPE BIGINT"
    )
    with pytest.raises(ValueError, match="unknown schema action"):
        evolve_sql(t, {"action": "drop", "name": "x"})
