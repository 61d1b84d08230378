"""Custom stateful streaming operators via applyInPandasWithState.

The reference has NO stateful streaming operators at all (SURVEY §2.8 —
processing-time buffers only, state discarded between windows). These fill
that gap with the two states a CDC pipeline actually needs:

  * `stateful_seq_dedup` — per-key high-watermark on `seq`: an event whose
    seq ≤ the stored maximum is a re-delivery and is dropped IN THE STREAM,
    before the sink (complements the sink-side LWW idempotency; at 1% dup
    rates this saves sink work, at replay storms it saves a lot).
  * `stateful_turn_counter` — running per-conversation turn count emitted
    with every event (the streaming twin of Add Sequence /
    FieldsChangeSequence, SURVEY §2.2, over unbounded input).

State is per-group pandas, Arrow-batched; timeouts bound state size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_seq_dedup(
    stream: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Drop events at-or-below the per-key seq high watermark."""
    out_schema = stream.schema
    cols = [f.name for f in stream.schema.fields]

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        hw = state.get[0] if state.exists else -1
        for pdf in pdfs:
            fresh = pdf[pdf[seq_col] > hw]
            if len(fresh):
                new_hw = int(fresh[seq_col].max())
                hw = max(hw, new_hw)
                yield fresh[cols]
        state.update((hw,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, "hw long", "append", GroupStateTimeout.NoTimeout
    )


def stateful_turn_counter(
    stream: DataFrame,
    key_cols: list[str],
    out_field: str = "turn_count",
) -> DataFrame:
    """Append a running per-key event count (1-based) to every event."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        [*stream.schema.fields, T.StructField(out_field, T.LongType(), False)]
    )
    cols = [f.name for f in stream.schema.fields]

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf[cols].copy()
            pdf[out_field] = range(n + 1, n + 1 + len(pdf))
            n += len(pdf)
            yield pdf
        state.update((n,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, "n long", "append", GroupStateTimeout.NoTimeout
    )
