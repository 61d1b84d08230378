"""Arrow-vectorized string-similarity UDFs for functions Catalyst lacks.

Used by Calculator (JARO/JARO_WINKLER) and Fuzzy Match (SURVEY §2.3,
fuzzymatch/FuzzyMatch.java). These are pandas_udfs — batch-vectorized via
Arrow, never row-at-a-time Python UDFs (input_hint mandate). The inner loop
is pure-python per pair; acceptable because fuzzy scoring is applied to the
*candidate pairs after* a broadcast equi-prefilter, not to the raw stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


def _jaro_sim(s1: str, s2: str) -> float:
    if s1 is None or s2 is None:
        return None
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jaro_winkler_sim(s1: str, s2: str) -> float:
    j = _jaro_sim(s1, s2)
    if j is None:
        return None
    prefix = 0
    for a, b in zip((s1 or "")[:4], (s2 or "")[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * 0.1 * (1 - j)


@pandas_udf("double")
def jaro_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_jaro_sim(x, y) for x, y in zip(a, b)], dtype="float64")


@pandas_udf("double")
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_jaro_winkler_sim(x, y) for x, y in zip(a, b)], dtype="float64")
