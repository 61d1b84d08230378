"""Stage an sf1-scale copy of the driver's sf0.1 testdata (judge round-5
item: run the headline bench at sf1 so sub-second query noise stops
dominating round-over-round deltas).

Method: replicate each sf0.1 table 10× with CONSISTENTLY shifted keys —
every foreign key moves by the same stride as its primary key, so join
cardinalities scale linearly exactly like a larger TPC-H scale factor
(nation/region stay fixed, as in TPC-H). documents/embeddings get shifted
ids with replica-tagged text/vectors so dedup/ANN queries see realistic
near-duplicate structure (replicas of a document ARE near-duplicates —
the same property a 10× crawl would have).

Usage: python tools/gen_sf1.py [out_dir]   (default /dev/shm/pks_sf1)
Writes one parquet dir per table; ~10× sf0.1 ≈ 170 MB on tmpfs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
COPIES = 10

# primary-key strides (max key in sf0.1, rounded up to a clean stride)
STRIDES = {
    "c_custkey": 200_000,
    "s_suppkey": 10_000,
    "p_partkey": 200_000,
    "o_orderkey": 1_000_000,
    "event_id": 1_000_000,
    "user_id": 100_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

TABLES = {
    # table -> (shifted key columns, passthrough replication)
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FK_STRIDE = {  # fk column -> the pk stride it must follow
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
}


def main(out_dir: str = "/dev/shm/pks_sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, keys in TABLES.items():
        src = f"{SRC}/{t}.parquet"
        out = f"{out_dir}/{t}.parquet"
        if not keys:  # fixed dimensions replicate once (TPC-H semantics)
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{out}' (FORMAT PARQUET)")
            continue
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        exprs = []
        for c in cols:
            stride = STRIDES.get(FK_STRIDE.get(c, c))
            if c in keys and stride:
                exprs.append(f"({c} + i.i * {stride}) AS {c}")
            elif t == "documents" and c == "text":
                # replica marker keeps replicas NEAR-duplicates, not exact
                exprs.append("CASE WHEN i.i = 0 THEN text ELSE "
                             "text || ' r' || i.i END AS text")
            elif t == "events" and c == "ts":
                exprs.append(f"ts + INTERVAL (i.i) HOUR AS ts")
            else:
                exprs.append(c)
        q = (
            f"COPY (SELECT {', '.join(exprs)} FROM '{src}', "
            f"(SELECT unnest(range({COPIES})) AS i) i ORDER BY i.i) "
            f"TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        con.sql(q)
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t:12s} -> {n:,} rows")
    print(f"staged at {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/pks_sf1")
