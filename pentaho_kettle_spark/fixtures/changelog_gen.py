"""Deterministic synthetic transcript change-log generator + sequential oracle.

Implements FIXTURES.md §F2: an ordered stream of insert/update/delete events
over the transcripts table keyed (conv_id, turn_idx), with Zipf-skewed
conversations, bounded out-of-order delivery, verbatim duplicate re-delivery,
and deliberately-late updates (must lose under LWW).

The *oracle* (``pandas_oracle_apply``) applies the log single-threaded in seq
order with last-writer-wins-on-(ts, seq) semantics — the trivially-correct
reference implementation every distributed replay must match bit-for-bit.

LWW semantics (the engine contract, see cdc/lww.py):
  Per key, an event applies iff (ts, seq) > current (ts, seq) lexicographically.
  An applied D leaves a *tombstone* (the key stays in state with its (ts, seq)
  so an even-later-arriving but older U still loses). The visible table is the
  non-tombstone rows.

Everything is seeded (numpy default_rng) — no wall clock anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
CHANGELOG_COLUMNS = ["seq", "op", *TRANSCRIPT_COLUMNS, "ingest_ts"]

_ROLES = np.array(["system", "user", "assistant", "tool"])
_TOOLS = np.array(["bash", "search", "browser", "editor"])
_VOCAB = np.array(
    (
        "key agg row scan slow fast table value part hash batch window spark "
        "order data column join small line customer query merge event turn "
        "stream shuffle plan filter sort group state commit replay delta"
    ).split()
)
_BASE_TS = np.datetime64("2026-01-01T00:00:00", "us")


def _gen_texts(rng: np.random.Generator, n: int, min_words: int = 4, max_words: int = 40) -> np.ndarray:
    """Deterministic synthetic sentences, ~20-250 chars.

    The join loop costs ~47s per million rows, so large n samples from a
    200k-sentence pool instead (distinct texts aren't a correctness
    property anywhere — real transcripts repeat text too)."""
    pool_n = min(n, 200_000)
    lengths = rng.integers(min_words, max_words + 1, size=pool_n)
    codes = rng.integers(0, len(_VOCAB), size=int(lengths.sum()))
    words = _VOCAB[codes]
    out = np.empty(pool_n, dtype=object)
    pos = 0
    for i, ln in enumerate(lengths):
        out[i] = " ".join(words[pos : pos + ln])
        pos += ln
    if pool_n == n:
        return out
    return out[rng.integers(0, pool_n, size=n)]


def gen_changelog(
    n_events: int,
    n_convs: int,
    seed: int = 42,
    zipf_a: float | None = 1.2,
    dup_frac: float = 0.01,
    late_frac: float = 0.005,
    ooo_window: int = 500,
    op_mix: tuple[float, float, float] = (0.70, 0.25, 0.05),
) -> pd.DataFrame:
    """Generate the change log in *delivery order* (out-of-order vs seq).

    Returns a pandas DataFrame with CHANGELOG_COLUMNS. ``seq`` is the global
    origin order (monotonic, unique except for re-delivered duplicates which
    repeat their original seq verbatim).
    """
    rng = np.random.default_rng(seed)
    E = n_events

    # --- conversation assignment: Zipf-skewed (hot conv_ids); zipf_a=None
    # gives a uniform distribution (the no-skew control in BASELINE.md) ---
    if zipf_a is None:
        conv = rng.integers(0, n_convs, size=E).astype(np.int64)
    else:
        ranks = rng.zipf(zipf_a, size=E)
        conv = ((ranks - 1) % n_convs).astype(np.int64)

    # --- op choice, then force I where the conv has no rows yet ---
    u = rng.random(E)
    op = np.where(u < op_mix[0], 0, np.where(u < op_mix[0] + op_mix[1], 1, 2))  # 0=I 1=U 2=D

    s = pd.Series(op == 0)
    grp = pd.Series(conv)
    inserts_before = s.groupby(grp).cumsum() - s  # I-count in this conv before event i
    op = np.where((inserts_before.values == 0), 0, op)
    # recompute with the flips applied
    s = pd.Series(op == 0)
    inserts_before = (s.groupby(grp).cumsum() - s).values.astype(np.int64)

    # updates/deletes target EARLY turns disproportionately (rng^5 → turn 0
    # of a hot conversation accumulates a real hot KEY, the thing the salted
    # two-phase merge exists for; uniform turns would dilute conversation
    # skew into per-key uniformity and never exercise it)
    turn_idx = np.where(
        op == 0,
        inserts_before,
        np.floor(rng.random(E) ** 5 * np.maximum(inserts_before, 1)).astype(np.int64),
    ).astype(np.int32)

    # --- timestamps: globally monotone in origin order (hence per-conv) ---
    gaps = rng.integers(1, 2_000_000, size=E)  # µs gaps
    ts = _BASE_TS + np.cumsum(gaps).astype("timedelta64[us]")
    # late updates: ts pushed far into the past → must lose under LWW
    late = (op == 1) & (rng.random(E) < late_frac / max(op_mix[1], 1e-9))
    ts = np.where(late, ts - np.timedelta64(3650, "D").astype("timedelta64[us]"), ts)

    # --- payload ---
    role_codes = rng.integers(0, len(_ROLES), size=E)
    role = _ROLES[role_codes].astype(object)
    text = _gen_texts(rng, E).astype(object)
    tool = np.where(role == "tool", _TOOLS[rng.integers(0, len(_TOOLS), size=E)], None)
    # deletes carry keys + ts only
    is_del = op == 2
    role[is_del] = None
    text[is_del] = None
    tool = np.where(is_del, None, tool)

    seq = np.arange(E, dtype=np.int64)
    df = pd.DataFrame(
        {
            "seq": seq,
            "op": np.array(["I", "U", "D"], dtype=object)[op],
            "conv_id": np.char.add("conv-", np.char.zfill(conv.astype("U8"), 8)).astype(object),
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts).astype("datetime64[us]"),
        }
    )

    # --- duplicates: re-emit verbatim, later in delivery ---
    n_dup = int(E * dup_frac)
    if n_dup:
        dup_idx = rng.choice(E, size=n_dup, replace=False)
        df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)

    # --- bounded out-of-order delivery: shuffle within ±ooo_window of origin ---
    jitter = rng.uniform(-ooo_window, ooo_window, size=len(df))
    delivery = np.argsort(df["seq"].values + jitter, kind="stable")
    df = df.iloc[delivery].reset_index(drop=True)

    df["ingest_ts"] = pd.Series(
        _BASE_TS + (np.arange(len(df)) * np.timedelta64(1000, "us"))
    ).astype("datetime64[us]")
    return df


def pandas_oracle_apply(changelog: pd.DataFrame, base: pd.DataFrame | None = None) -> pd.DataFrame:
    """Single-threaded reference apply: seq order, LWW on (ts, seq), tombstones.

    Returns the final visible transcripts table sorted by (conv_id, turn_idx),
    with system columns dropped. This is the bit-for-bit target for every
    distributed replay (any partitioning / batching / resume point).
    """
    state: dict[tuple[str, int], tuple] = {}
    if base is not None:
        for r in base.itertuples(index=False):
            state[(r.conv_id, int(r.turn_idx))] = (
                r.ts,
                -1,
                False,
                (r.role, r.text, r.tool, r.ts),
            )

    log = changelog.sort_values(["seq", "ts"], kind="stable")
    for r in log.itertuples(index=False):
        key = (r.conv_id, int(r.turn_idx))
        cur = state.get(key)
        stamp = (r.ts, int(r.seq))
        if cur is not None and stamp <= (cur[0], cur[1]):
            continue  # stale or duplicate → loses LWW
        if r.op == "D":
            state[key] = (r.ts, int(r.seq), True, None)
        else:
            state[key] = (r.ts, int(r.seq), False, (r.role, r.text, r.tool, r.ts))

    rows = [
        (k[0], k[1], v[3][0], v[3][1], v[3][2], v[3][3])
        for k, v in state.items()
        if not v[2]
    ]
    out = pd.DataFrame(rows, columns=TRANSCRIPT_COLUMNS)
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
