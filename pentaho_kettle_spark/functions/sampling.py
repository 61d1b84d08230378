"""Deterministic sampling for training-data pipelines: stratified quota
sampling (the "training mix" op — k docs per language/source/quality
bucket) and hash-based train/eval splitting. Everything is a pure
function of the row's id, so runs are reproducible, resumable, and
oracle-checkable bit-for-bit — no RNG state anywhere.

Reference surface: the closest Kettle steps are Sample rows and Reservoir
sampling (SURVEY §2.2, `samplerows/SampleRows.java`,
`reservoirsampling/ReservoirSampling.java`); both are stream-global and
non-deterministic under parallel split. These are their corpus-scale,
deterministic replacements.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

_M = 1_000_000


def _unit_hash(col: Column, hash_fn=F.xxhash64) -> Column:
    """Deterministic uniform draw in [0, 1): pmod-folded 64-bit hash.
    Sign-safe on both engines (Spark % follows the dividend; the explicit
    double-pmod makes the result non-negative everywhere)."""
    h = hash_fn(col)
    return ((h % _M + _M) % _M) / F.lit(float(_M))


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    oversample: float = 2.0,
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Exactly `n_per_stratum` rows per stratum (fewer when the stratum is
    smaller), chosen as the stratum's smallest id-hashes — a deterministic
    quota sample that is stable across reruns, partitionings, and engines.

    Scale shape (the naive plan — one row_number window partitioned by
    stratum — funnels EVERY row of a hot stratum through one reducer; at
    100 TB a dominant language would serialize the job):

      1. per-stratum counts: map-side-combined groupBy, rows = |strata| —
         broadcast back.
      2. hash prefilter: keep rows whose unit-hash < oversample·k/count —
         a scan-side predicate that cuts each stratum to ≈oversample·k
         rows no matter how big it is (the binomial lower tail makes
         undershoot vanishingly unlikely at oversample=2).
      3. exact finalize: row_number over (stratum, hash, id) on the ≈k·|strata|
         survivors — the window now sorts thousands of rows, not billions.

    Strata with count ≤ oversample·k skip the prefilter entirely (exact by
    construction). For larger strata the prefilter keeps the expected
    oversample·k smallest-hash candidates; at oversample=2 the chance it
    prunes a true top-k row is the binomial lower tail P(X<k | mean 2k) —
    ~1e-8 at k=50 and shrinking with k. The DuckDB twin
    (oracle_sqlgen.stratified_sample_sql) mirrors the prefilter, so
    cross-engine equality is exact regardless.
    """
    u = _unit_hash(F.col(id_col), hash_fn)
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_n"))
    keep_p = F.least(
        F.lit(1.0), F.lit(float(oversample) * n_per_stratum) / F.col("_n")
    )
    survivors = (
        df.withColumn("_u", u)
        .join(F.broadcast(counts), list(strata))
        .filter((F.col("_u") < keep_p) | (F.col("_n") <= F.lit(n_per_stratum)))
    )
    w = Window.partitionBy(*strata).orderBy(F.col("_u"), F.col(id_col))
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .select(*df.columns)  # USING-join moved strata cols to the front
    )


def train_eval_split(
    df: DataFrame,
    eval_frac: float,
    id_col: str = "doc_id",
    salt: str = "split",
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Adds a `split` column ('train' / 'eval') from a salted id-hash: a
    document lands in the same split in every run, on every cluster, and
    after any upstream re-shard — the property a contamination-safe
    held-out set needs (pair with dedup.decontaminate to police it).
    Pure projection, zero shuffles. Change `salt` to draw an independent
    split without touching the data."""
    u = _unit_hash(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")), hash_fn)
    return df.withColumn(
        "split", F.when(u < eval_frac, F.lit("eval")).otherwise(F.lit("train"))
    )
