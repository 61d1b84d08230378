"""Opt-in deep-fuzz harness: the three hypothesis property suites re-run
with a MUCH larger example budget than CI's (CI pins 5-6 examples per suite
to stay inside the ~2 min property budget; a hunt session runs hundreds).

Run:  FUZZ_EXAMPLES=60 python -m pytest tests/fuzz_hunt.py -q

Skipped entirely when FUZZ_EXAMPLES is unset, so the normal suite's wall
time is unchanged. Reuses each suite's strategies and inner test body
verbatim (via hypothesis' inner_test) — the hunt explores the same
state space, just much more of it.

Track record: the concurrent-maintenance suite found a real corruption in
round 5 — expire_snapshots(grace_seconds=0) fired inside another writer's
pre-commit window orphan-collected the writer's uncommitted data files
(schedule [expire_snaps, merge, merge], nested at 0). Fixed with in-flight
write markers; pinned as
test_concurrent_writers.test_expire_snapshots_gc_spares_inflight_writer.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

N = int(os.environ.get("FUZZ_EXAMPLES", "0"))

pytestmark = pytest.mark.skipif(
    N <= 0, reason="deep fuzz is opt-in: set FUZZ_EXAMPLES=<n>"
)

if N > 0:
    import tests.test_property_concurrent as m_conc
    import tests.test_property_patch as m_patch
    import tests.test_property_replay as m_replay

    _SETTINGS = dict(
        max_examples=N,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
            HealthCheck.data_too_large,
        ],
    )

    @settings(**_SETTINGS)
    @given(schedule=m_conc._schedule, nested_idx=m_conc._nested_idx, data=st.data())
    def test_hunt_concurrent_maintenance(
        spark, tmp_path_factory, schedule, nested_idx, data
    ):
        inner = m_conc.test_maintenance_interleaved_with_merges_preserves_lww
        inner.hypothesis.inner_test(spark, tmp_path_factory, schedule, nested_idx, data)

    @settings(**_SETTINGS)
    @given(profile=m_replay.profile, shape=m_replay.run_shape)
    def test_hunt_replay_profiles(spark, tmp_path_factory, profile, shape):
        inner = m_replay.test_any_replay_matches_sequential_oracle
        inner.hypothesis.inner_test(spark, tmp_path_factory, profile, shape)

    @settings(**_SETTINGS)
    @given(
        events=st.lists(m_patch.event, min_size=1, max_size=14),
        batch_at=st.sets(st.integers(1, 13)),
    )
    def test_hunt_patch_batching(spark, tmp_path_factory, events, batch_at):
        inner = m_patch.test_patch_batching_equals_sequential_oracle
        inner.hypothesis.inner_test(spark, tmp_path_factory, events, batch_at)

    @settings(**_SETTINGS)
    @given(
        batches=m_conc._batches,
        nested_events=st.lists(m_conc._event, min_size=1, max_size=4),
        outer_idx=st.integers(min_value=0, max_value=3),
        mode=st.sampled_from(["mor", "cow"]),
    )
    def test_hunt_writer_vs_writer(
        spark, tmp_path_factory, batches, nested_events, outer_idx, mode
    ):
        inner = m_conc.test_concurrent_merge_inside_merge_preserves_lww
        inner.hypothesis.inner_test(
            spark, tmp_path_factory, batches, nested_events, outer_idx, mode
        )
