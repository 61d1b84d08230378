"""Arrow-vectorized string-similarity UDFs for functions Catalyst lacks.

Used by Calculator (JARO/JARO_WINKLER) and Fuzzy Match (SURVEY §2.3,
fuzzymatch/FuzzyMatch.java). These are pandas_udfs — batch-vectorized via
Arrow, never row-at-a-time Python UDFs (input_hint mandate). The inner loop
is pure-python per pair, so pair count is the cost driver: fuzzy_match
defaults to the reference's full broadcast crossJoin (fine for small
lookups) and offers opt-in candidate blocking (length-band / first-letter /
soundex equi-join — operators/joins.py fuzzy_match `blocking=`) to keep the
scored pair count sub-quadratic at scale.
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

    if kernel_name in ("_metaphone", "_double_metaphone", "_adler32"):
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


# ---------------------------------------------------------------------------
# Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000) — the
# algorithm Kettle's CalculatorMetaFunction DOUBLE_METAPHONE calls through
# Apache Commons Codec. Pure-python port of the published algorithm
# (primary + alternate encodings, maxCodeLen=4); primary is what Kettle
# returns. Written from the published algorithm description, not copied.
# ---------------------------------------------------------------------------

_DM_VOWELS = set("AEIOUY")
_DM_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_DM_L_T_K_S_N_M_B_Z = {"L", "T", "K", "S", "N", "M", "B", "Z"}
_DM_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER"
)


class _DMResult:
    __slots__ = ("primary", "alternate", "maxlen")

    def __init__(self, maxlen=4):
        self.primary = []
        self.alternate = []
        self.maxlen = maxlen

    def append(self, p, a=None):
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s):
        room = self.maxlen - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s):
        room = self.maxlen - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def complete(self):
        return len(self.primary) >= self.maxlen and len(self.alternate) >= self.maxlen


def _double_metaphone(word: str, max_len: int = 4, alternate: bool = False) -> str:
    if word is None:
        return None
    w = word.strip().upper()
    if not w:
        return ""
    n = len(w)

    def ch(i):
        return w[i] if 0 <= i < n else ""

    def vowel(i):
        return ch(i) in _DM_VOWELS

    def has(start, length, *strs):
        if start < 0 or start + length > n:
            return False
        return w[start : start + length] in strs

    slavo = ("W" in w) or ("K" in w) or ("CZ" in w) or ("WITZ" in w)
    r = _DMResult(max_len)
    i = 1 if w[:2] in _DM_SILENT_START else 0

    while i < n and not r.complete():
        c = w[i]
        if c in _DM_VOWELS:
            if i == 0:
                r.append("A")
            i += 1
        elif c == "B":
            r.append("P")
            i += 2 if ch(i + 1) == "B" else 1
        elif c == "Ç":  # C-cedilla
            r.append("S")
            i += 1
        elif c == "C":
            if (
                i > 1
                and not vowel(i - 2)
                and has(i - 1, 3, "ACH")
                and ch(i + 2) != "I"
                and (ch(i + 2) != "E" or has(i - 2, 6, "BACHER", "MACHER"))
            ):
                r.append("K")
                i += 2
            elif i == 0 and has(i, 6, "CAESAR"):
                r.append("S")
                i += 2
            elif has(i, 2, "CH"):
                if i > 0 and has(i, 4, "CHAE"):
                    r.append("K", "X")
                elif (
                    i == 0
                    and (has(i + 1, 5, "HARAC", "HARIS")
                         or has(i + 1, 3, "HOR", "HYM", "HIA", "HEM"))
                    and not has(0, 5, "CHORE")
                ):
                    r.append("K")
                elif (
                    has(0, 4, "VAN ", "VON ")
                    or has(0, 3, "SCH")
                    or has(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or has(i + 2, 1, "T", "S")
                    or (
                        (has(i - 1, 1, "A", "O", "U", "E") or i == 0)
                        and (has(i + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
                             or i + 1 == n - 1)
                    )
                ):
                    r.append("K")
                else:
                    if i > 0:
                        if has(0, 2, "MC"):
                            r.append("K")
                        else:
                            r.append("X", "K")
                    else:
                        r.append("X")
                i += 2
            elif has(i, 2, "CZ") and not has(i - 2, 4, "WICZ"):
                r.append("S", "X")
                i += 2
            elif has(i + 1, 3, "CIA"):
                r.append("X")
                i += 3
            elif has(i, 2, "CC") and not (i == 1 and ch(0) == "M"):
                if has(i + 2, 1, "I", "E", "H") and not has(i + 2, 2, "HU"):
                    if (i == 1 and ch(i - 1) == "A") or has(i - 1, 5, "UCCEE", "UCCES"):
                        r.append("KS")
                    else:
                        r.append("X")
                    i += 3
                else:
                    r.append("K")
                    i += 2
            elif has(i, 2, "CK", "CG", "CQ"):
                r.append("K")
                i += 2
            elif has(i, 2, "CI", "CE", "CY"):
                if has(i, 3, "CIO", "CIE", "CIA"):
                    r.append("S", "X")
                else:
                    r.append("S")
                i += 2
            else:
                r.append("K")
                if has(i + 1, 2, " C", " Q", " G"):
                    i += 3
                elif has(i + 1, 1, "C", "K", "Q") and not has(i + 1, 2, "CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if has(i, 2, "DG"):
                if has(i + 2, 1, "I", "E", "Y"):
                    r.append("J")
                    i += 3
                else:
                    r.append("TK")
                    i += 2
            elif has(i, 2, "DT", "DD"):
                r.append("T")
                i += 2
            else:
                r.append("T")
                i += 1
        elif c == "F":
            r.append("F")
            i += 2 if ch(i + 1) == "F" else 1
        elif c == "G":
            if ch(i + 1) == "H":
                if i > 0 and not vowel(i - 1):
                    r.append("K")
                    i += 2
                elif i == 0:
                    r.append("J" if ch(i + 2) == "I" else "K")
                    i += 2
                elif (
                    (i > 1 and has(i - 2, 1, "B", "H", "D"))
                    or (i > 2 and has(i - 3, 1, "B", "H", "D"))
                    or (i > 3 and has(i - 4, 1, "B", "H"))
                ):
                    i += 2  # silent
                else:
                    if i > 2 and ch(i - 1) == "U" and has(i - 3, 1, "C", "G", "L", "R", "T"):
                        r.append("F")
                    elif i > 0 and ch(i - 1) != "I":
                        r.append("K")
                    i += 2
            elif ch(i + 1) == "N":
                if i == 1 and vowel(0) and not slavo:
                    r.append_primary("KN")
                    r.append_alternate("N")
                elif not has(i + 2, 2, "EY") and ch(i + 1) != "Y" and not slavo:
                    r.append_primary("N")
                    r.append_alternate("KN")
                else:
                    r.append("KN")
                i += 2
            elif has(i + 1, 2, "LI") and not slavo:
                r.append_primary("KL")
                r.append_alternate("L")
                i += 2
            elif i == 0 and (
                ch(i + 1) == "Y" or has(i + 1, 2, *_DM_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
            ):
                r.append("K", "J")
                i += 2
            elif (
                (has(i + 1, 2, "ER") or ch(i + 1) == "Y")
                and not has(0, 6, "DANGER", "RANGER", "MANGER")
                and not has(i - 1, 1, "E", "I")
                and not has(i - 1, 3, "RGY", "OGY")
            ):
                r.append("K", "J")
                i += 2
            elif has(i + 1, 1, "E", "I", "Y") or has(i - 1, 4, "AGGI", "OGGI"):
                if has(0, 4, "VAN ", "VON ") or has(0, 3, "SCH") or has(i + 1, 2, "ET"):
                    r.append("K")
                elif has(i + 1, 3, "IER"):
                    r.append("J")
                else:
                    r.append("J", "K")
                i += 2
            elif ch(i + 1) == "G":
                r.append("K")
                i += 2
            else:
                r.append("K")
                i += 1
        elif c == "H":
            if (i == 0 or vowel(i - 1)) and vowel(i + 1):
                r.append("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if has(i, 4, "JOSE") or has(0, 4, "SAN "):
                if (i == 0 and (ch(i + 4) == " " or n == 4)) or has(0, 4, "SAN "):
                    r.append("H")
                else:
                    r.append("J", "H")
                i += 1
            else:
                if i == 0 and not has(i, 4, "JOSE"):
                    r.append("J", "A")
                elif (
                    vowel(i - 1)
                    and not slavo
                    and (ch(i + 1) == "A" or ch(i + 1) == "O")
                ):
                    r.append("J", "H")
                elif i == n - 1:
                    r.append("J", " ")
                elif not (ch(i + 1) in _DM_L_T_K_S_N_M_B_Z) and not has(
                    i - 1, 1, "S", "K", "L"
                ):
                    r.append("J")
                i += 2 if ch(i + 1) == "J" else 1
        elif c == "K":
            r.append("K")
            i += 2 if ch(i + 1) == "K" else 1
        elif c == "L":
            if ch(i + 1) == "L":
                cond_l0 = (
                    i == n - 3 and has(i - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (has(n - 2, 2, "AS", "OS") or has(n - 1, 1, "A", "O"))
                    and has(i - 1, 4, "ALLE")
                )
                if cond_l0:
                    r.append_primary("L")
                else:
                    r.append("L")
                i += 2
            else:
                r.append("L")
                i += 1
        elif c == "M":
            r.append("M")
            cond_m0 = ch(i + 1) == "M" or (
                has(i - 1, 3, "UMB") and (i + 1 == n - 1 or has(i + 2, 2, "ER"))
            )
            i += 2 if cond_m0 else 1
        elif c == "N":
            r.append("N")
            i += 2 if ch(i + 1) == "N" else 1
        elif c == "Ñ":  # N-tilde
            r.append("N")
            i += 1
        elif c == "P":
            if ch(i + 1) == "H":
                r.append("F")
                i += 2
            else:
                r.append("P")
                i += 2 if has(i + 1, 1, "P", "B") else 1
        elif c == "Q":
            r.append("K")
            i += 2 if ch(i + 1) == "Q" else 1
        elif c == "R":
            if (
                i == n - 1
                and not slavo
                and has(i - 2, 2, "IE")
                and not has(i - 4, 2, "ME", "MA")
            ):
                r.append_alternate("R")
            else:
                r.append("R")
            i += 2 if ch(i + 1) == "R" else 1
        elif c == "S":
            if has(i - 1, 3, "ISL", "YSL"):
                i += 1  # silent
            elif i == 0 and has(i, 5, "SUGAR"):
                r.append("X", "S")
                i += 1
            elif has(i, 2, "SH"):
                if has(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    r.append("S")
                else:
                    r.append("X")
                i += 2
            elif has(i, 3, "SIO", "SIA") or has(i, 4, "SIAN"):
                if slavo:
                    r.append("S")
                else:
                    r.append("S", "X")
                i += 3
            elif (i == 0 and has(i + 1, 1, "M", "N", "L", "W")) or has(i + 1, 1, "Z"):
                r.append("S", "X")
                i += 2 if has(i + 1, 1, "Z") else 1
            elif has(i, 2, "SC"):
                if ch(i + 2) == "H":
                    if has(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if has(i + 3, 2, "ER", "EN"):
                            r.append_primary("X")
                            r.append_alternate("SK")
                        else:
                            r.append("SK")
                    else:
                        if i == 0 and not vowel(3) and ch(3) != "W":
                            r.append("X", "S")
                        else:
                            r.append("X")
                elif has(i + 2, 1, "I", "E", "Y"):
                    r.append("S")
                else:
                    r.append("SK")
                i += 3
            else:
                if i == n - 1 and has(i - 2, 2, "AI", "OI"):
                    r.append_alternate("S")
                else:
                    r.append("S")
                i += 2 if has(i + 1, 1, "S", "Z") else 1
        elif c == "T":
            if has(i, 4, "TION"):
                r.append("X")
                i += 3
            elif has(i, 3, "TIA", "TCH"):
                r.append("X")
                i += 3
            elif has(i, 2, "TH") or has(i, 3, "TTH"):
                if has(i + 2, 2, "OM", "AM") or has(0, 4, "VAN ", "VON ") or has(0, 3, "SCH"):
                    r.append("T")
                else:
                    r.append("0", "T")
                i += 2
            else:
                r.append("T")
                i += 2 if has(i + 1, 1, "T", "D") else 1
        elif c == "V":
            r.append("F")
            i += 2 if ch(i + 1) == "V" else 1
        elif c == "W":
            if has(i, 2, "WR"):
                r.append("R")
                i += 2
            elif i == 0 and (vowel(i + 1) or has(i, 2, "WH")):
                if vowel(i + 1):
                    r.append("A", "F")
                else:
                    r.append("A")
                i += 1
            elif (
                (i == n - 1 and vowel(i - 1))
                or has(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or has(0, 3, "SCH")
            ):
                r.append_alternate("F")
                i += 1
            elif has(i, 4, "WICZ", "WITZ"):
                r.append_primary("TS")
                r.append_alternate("FX")
                i += 4
            else:
                i += 1
        elif c == "X":
            if i == 0:
                r.append("S")
                i += 1
            else:
                if not (i == n - 1 and (has(i - 3, 3, "IAU", "EAU") or has(i - 2, 2, "AU", "OU"))):
                    r.append("KS")
                i += 2 if has(i + 1, 1, "C", "X") else 1
        elif c == "Z":
            if ch(i + 1) == "H":
                r.append("J")
                i += 2
            else:
                if has(i + 1, 2, "ZO", "ZI", "ZA") or (slavo and i > 0 and ch(i - 1) != "T"):
                    r.append_primary("S")
                    r.append_alternate("TS")
                else:
                    r.append("S")
                i += 2 if ch(i + 1) == "Z" else 1
        else:
            i += 1

    return "".join((r.alternate if alternate else r.primary)[:max_len])


def double_metaphone_udf(a):
    return _udf("_double_metaphone", "string")(a)
