"""Hot-key detection by sampling (feeds the salted two-phase collapse).

At 10^10-event scale a Zipf-skewed conversation key saturates one reducer;
the reference had no answer to this (SURVEY §4.1: a hot key saturates one
step copy). We detect hot keys on a small sample — cheap, one narrow pass —
and salt only those, leaving the cold majority on the single-shuffle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    events: DataFrame,
    key_cols: list[str] | None = None,
    sample_fraction: float = 0.01,
    hot_threshold_share: float = 0.001,
    max_hot_keys: int = 1000,
) -> DataFrame:
    """Keys whose sampled share of events exceeds `hot_threshold_share`.

    Returns a SMALL DataFrame (≤ max_hot_keys rows) suitable for broadcast.
    """
    key_cols = key_cols or ["conv_id", "turn_idx"]
    sample = events.sample(fraction=sample_fraction, seed=42)
    counts = sample.groupBy(*key_cols).count()
    # threshold in sampled counts: share * sampled_total ≈ share * (E * frac)
    sampled_total = sample.count()
    thresh = max(int(hot_threshold_share * sampled_total), 2)
    return (
        counts.filter(F.col("count") >= thresh)
        .orderBy(F.desc("count"))
        .limit(max_hot_keys)
        .select(*key_cols)
    )
