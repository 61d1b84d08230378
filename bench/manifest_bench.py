"""Commit write-amplification micro-bench for the two-level manifest layout.

At 10^10 events a table holds thousands of buckets and tens of thousands of
file entries; the metadata path must not rewrite the full inventory per
commit. This bench builds a metadata-only table (no Spark needed) with
`n_buckets` buckets × `files_per_bucket` entries, then commits a stream of
single-bucket changes and reports:

  * bytes written per commit under the two-level layout (snapshot JSON with
    per-bucket pointers + ONE new content-addressed bucket manifest), and
  * the full-inventory JSON size an inline layout would rewrite per commit,

plus wall time per commit. Run: python bench/manifest_bench.py [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T  # noqa: E402

from pentaho_kettle_spark.tableio.parquet_snapshot import (  # noqa: E402
    ParquetSnapshotTableIO,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _entry(b: int, i: int) -> dict:
    return {
        "path": f"data/w-{b:04x}{i:08x}/_bucket={b}/part-00000.parquet",
        "schema_version": 0,
        "rows": 10_000 + i,
        "kind": "base",
        "lww_min": 1_700_000_000_000_000 + i,
        "lww_max": 1_700_000_100_000_000 + i,
    }


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dn, fns in os.walk(root):
        for fn in fns:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def main() -> None:
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    files_per_bucket = 8
    n_commits = 50
    root = tempfile.mkdtemp(prefix="pks_manifest_bench_")
    try:
        t = ParquetSnapshotTableIO(None, root, n_buckets=n_buckets)
        t.init_empty(SCHEMA)

        def _seed(cur: dict) -> dict:
            out = dict(cur)
            out["files"] = {
                str(b): [_entry(b, i) for i in range(files_per_bucket)]
                for b in range(n_buckets)
            }
            return out

        t._commit_mutation(_seed)
        inline_size = len(
            json.dumps(t.current_manifest()["files"], separators=(",", ":"))
        )

        before = _tree_bytes(root)
        t0 = time.perf_counter()
        for c in range(n_commits):
            bucket = str(c % n_buckets)

            def _touch(cur: dict, _b=bucket, _c=c) -> dict:
                out = dict(cur)
                files = dict(out["files"])
                files[_b] = [*files[_b], _entry(int(_b), 1_000_000 + _c)]
                out["files"] = files
                return out

            t._commit_mutation(_touch)
        wall = time.perf_counter() - t0
        written = _tree_bytes(root) - before

        per_commit = written / n_commits

        # ledger flatness: seed a long batch history, re-measure — per-commit
        # bytes must not grow with history (segments are frozen + reused)
        def _seed_history(cur: dict) -> dict:
            out = dict(cur)
            out["committed_batches"] = [f"hist-{i}" for i in range(5000)]
            out["lineage"] = [
                {"batch_id": f"hist-{i}", "mode": "mor"} for i in range(5000)
            ]
            return out

        t._commit_mutation(_seed_history)
        before2 = _tree_bytes(root)
        for c in range(n_commits):
            bucket = str((n_commits + c) % n_buckets)

            def _touch2(cur: dict, _b=bucket, _c=c) -> dict:
                out = dict(cur)
                files = dict(out["files"])
                files[_b] = [*files[_b], _entry(int(_b), 2_000_000 + _c)]
                out["files"] = files
                out["committed_batches"] = [*cur["committed_batches"], f"x{_c}"]
                out["lineage"] = [*cur["lineage"],
                                  {"batch_id": f"x{_c}", "mode": "mor"}]
                return out

            t._commit_mutation(_touch2)
        per_commit_deep = (_tree_bytes(root) - before2) / n_commits

        print(json.dumps({
            "n_buckets": n_buckets,
            "files_per_bucket": files_per_bucket,
            "commits": n_commits,
            "bytes_written_per_commit": round(per_commit),
            "bytes_per_commit_after_5000_batches": round(per_commit_deep),
            "inline_inventory_bytes": inline_size,
            "write_amplification_vs_inline": round(per_commit / inline_size, 4),
            "ms_per_commit": round(wall / n_commits * 1e3, 2),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
