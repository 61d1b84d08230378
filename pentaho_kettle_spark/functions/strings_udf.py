"""Arrow-vectorized string-similarity UDFs for functions Catalyst lacks.

Used by Calculator (JARO/JARO_WINKLER) and Fuzzy Match (SURVEY §2.3,
fuzzymatch/FuzzyMatch.java). These are pandas_udfs — batch-vectorized via
Arrow, never row-at-a-time Python UDFs (input_hint mandate). The inner loop
is pure-python per pair; acceptable because fuzzy scoring is applied to the
*candidate pairs after* a broadcast equi-prefilter, not to the raw stream.
"""

from __future__ import annotations

import functools

import pandas as pd


@functools.lru_cache(maxsize=None)
def _udf(kernel_name: str, return_type: str):
    """Build (once) an Arrow-vectorized pandas_udf around a module kernel.
    Lazy because pandas_udf needs an active SparkSession to parse the return
    type — importing this module must stay session-free."""
    from pyspark.sql.functions import pandas_udf

    kernel = globals()[kernel_name]

    if kernel_name in ("_metaphone", "_adler32"):
        def one(a: pd.Series) -> pd.Series:
            return pd.Series([kernel(x) for x in a], dtype="object"
                             if return_type == "string" else "Int64")
        return pandas_udf(one, return_type)

    def two(a: pd.Series, b: pd.Series) -> pd.Series:
        dtype = "float64" if return_type == "double" else "Int32"
        return pd.Series([kernel(x, y) for x, y in zip(a, b)], dtype=dtype)
    return pandas_udf(two, return_type)


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


def jaro_udf(a, b):
    return _udf("_jaro_sim", "double")(a, b)


def jaro_winkler_udf(a, b):
    return _udf("_jaro_winkler_sim", "double")(a, b)

# ---------------------------------------------------------------------------
# Calculator phonetic / edit-distance kernels (SURVEY §2.2,
# calculator/CalculatorMetaFunction.java: METAPHONE, DAMERAU_LEVENSHTEIN,
# NEEDLEMAN_WUNSCH, CHECKSUM_ADLER32). No external lib (jellyfish etc.) is
# installed, so these are self-contained pure-python kernels behind Arrow-
# batched pandas_udfs.
# ---------------------------------------------------------------------------

# a set, NOT a string: `"" in "AEIOU"` is True (substring test), which would
# treat end-of-word as a following vowel
_VOWELS = set("AEIOU")


def _metaphone(word: str, max_len: int = 4) -> str:
    """Classic Lawrence Philips Metaphone (the algorithm Kettle calls via
    Apache Commons Codec), maxCodeLen=4."""
    if word is None:
        return None
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    if not w:
        return ""
    # initial-pair transformations
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[:1] == "X":
        w = "S" + w[1:]
    elif w[:2] == "WH":
        w = "W" + w[2:]
    out = []
    n = len(w)
    i = 0
    while i < n and len(out) < max_len:
        c = w[i]
        # skip doubled letters except C
        if c != "C" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and i > 0 and w[i - 1] == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                if i > 0 and w[i - 1] == "S":
                    out.append("K")
                else:
                    out.append("X")
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EIY":
                out.append("J")
                i += 1  # consume the G with the D
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                # GH silent unless followed by a vowel (or at word start)
                if i + 2 < n and w[i + 2] in _VOWELS:
                    out.append("K")
                # else silent; the H is consumed below
                i += 1
            elif nxt == "N":
                pass  # GN / GNED: silent G
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            prev = w[i - 1] if i > 0 else ""
            if prev in _VOWELS and nxt not in _VOWELS:
                pass  # silent
            elif prev in "CSPTG":
                pass  # part of a digraph handled by the previous letter
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if not (i > 0 and w[i - 1] == "C"):
                out.append("K")
        elif c == "P":
            out.append("F" if nxt == "H" else "P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
            elif nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            elif nxt == "H":
                out.append("0")  # theta
                i += 1
            elif not (nxt == "C" and nxt2 == "H"):
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out[:max_len])


def _damerau_levenshtein(a: str, b: str) -> int:
    """Optimal-string-alignment Damerau-Levenshtein (adjacent transposition
    costs 1) — the variant Kettle's ValueDataUtil computes."""
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                prev2 is not None
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        prev2, prev = prev, cur
    return prev[lb]


def _needleman_wunsch(a: str, b: str, match: int = 1, mismatch: int = -1, gap: int = -1) -> int:
    """Global-alignment score (match +1 / mismatch -1 / gap -1), the NW
    scoring Kettle exposes as a Calculator function."""
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    prev = [j * gap for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [i * gap] + [0] * lb
        for j in range(1, lb + 1):
            diag = prev[j - 1] + (match if a[i - 1] == b[j - 1] else mismatch)
            cur[j] = max(diag, prev[j] + gap, cur[j - 1] + gap)
        prev = cur
    return prev[lb]


def _adler32(x: str):
    import zlib

    return zlib.adler32(x.encode("utf-8")) if x is not None else None


def metaphone_udf(a):
    return _udf("_metaphone", "string")(a)


def damerau_levenshtein_udf(a, b):
    return _udf("_damerau_levenshtein", "int")(a, b)


def needleman_wunsch_udf(a, b):
    return _udf("_needleman_wunsch", "int")(a, b)


def adler32_udf(a):
    return _udf("_adler32", "long")(a)
