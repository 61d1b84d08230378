"""Real-Iceberg table IO — the production path, gated on the runtime jar.

The sandbox has no Iceberg jar and no network (SURVEY §7), so this module is
exercised only for its SQL generation (unit-testable string building); on a
real cluster it is the drop-in replacement for ParquetSnapshotTableIO:
the same collapsed-changes contract (one row per key, `op` ∈ {U, D},
`_seq`), applied with one atomic `MERGE INTO`.

Enable with a session built like:
    SparkSession.builder
      .config("spark.sql.extensions",
              "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
      .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
      .config("spark.sql.catalog.lake.type", "hadoop")
      .config("spark.sql.catalog.lake.warehouse", "<path>")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def merge_sql(
    table: str,
    source_view: str,
    key_cols: list[str],
    data_cols: list[str],
    lww_col: str = "ts",
) -> str:
    """MERGE INTO with LWW guard: an incoming row only overwrites when its
    (lww, _seq) stamp is strictly newer — identical semantics to
    ParquetSnapshotTableIO.merge_apply (tombstones become real DELETEs here;
    Iceberg's snapshot isolation plays the manifest's role)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in data_cols + ["_seq"])
    ins_cols = ", ".join(key_cols + data_cols + ["_seq"])
    ins_vals = ", ".join(f"s.{c}" for c in key_cols + data_cols + ["_seq"])
    newer = f"(s.{lww_col} > t.{lww_col} OR (s.{lww_col} = t.{lww_col} AND s._seq > t._seq))"
    return f"""
        MERGE INTO {table} t
        USING {source_view} s
        ON {on}
        WHEN MATCHED AND s.op = 'D' AND {newer} THEN DELETE
        WHEN MATCHED AND s.op <> 'D' AND {newer} THEN UPDATE SET {sets}
        WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ({ins_cols}) VALUES ({ins_vals})
    """


def create_table_sql(
    table: str, data_cols_ddl: str, key_col: str, n_buckets: int = 64
) -> str:
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({data_cols_ddl}, _seq BIGINT) "
        f"USING iceberg PARTITIONED BY (bucket({n_buckets}, {key_col})) "
        "TBLPROPERTIES ('write.merge.mode'='copy-on-write', 'format-version'='2')"
    )


def evolve_sql(table: str, action: dict) -> str:
    """One schema-evolution action → its ALTER TABLE statement (same action
    dicts ParquetSnapshotTableIO.evolve_schema takes — add/rename/widen)."""
    kind = action["action"]
    if kind == "add":
        return f"ALTER TABLE {table} ADD COLUMN {action['name']} {action['type']}"
    if kind == "rename":
        return f"ALTER TABLE {table} RENAME COLUMN {action['from']} TO {action['to']}"
    if kind == "widen":
        return f"ALTER TABLE {table} ALTER COLUMN {action['name']} TYPE {action['type']}"
    raise ValueError(f"unknown schema action {kind!r}")


class IcebergTableIO:
    """merge_apply-compatible facade over a real Iceberg table."""

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
        lww_col: str = "ts",
    ):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use ParquetSnapshotTableIO"
            )
        self.spark = spark
        self.table = table
        self.key_cols = list(key_cols)
        self.lww_col = lww_col

    def create(self, data_cols_ddl: str, n_buckets: int = 64) -> None:
        self.spark.sql(
            create_table_sql(self.table, data_cols_ddl, self.key_cols[0], n_buckets)
        )

    def merge_apply(self, changes: DataFrame, batch_id: str | None = None) -> dict:
        import hashlib

        data_cols = [c for c in changes.columns if c not in (*self.key_cols, "op", "_seq")]
        # md5, not hash(): str hash is salted per process (PYTHONHASHSEED),
        # md5 keeps the temp view name stable across driver restarts
        digest = hashlib.md5(str(batch_id).encode()).hexdigest()[:8]
        view = f"_pks_changes_{digest}"
        changes.createOrReplaceTempView(view)
        self.spark.sql(merge_sql(self.table, view, self.key_cols, data_cols, self.lww_col))
        self.spark.catalog.dropTempView(view)
        return {"batch_id": batch_id, "table": self.table}

    def read(self) -> DataFrame:
        return self.spark.table(self.table).drop("_seq")

    def evolve_schema(self, actions: list[dict]) -> None:
        for a in actions:
            self.spark.sql(evolve_sql(self.table, a))
