"""bench.py driver-surface unit tests (CPU; no renders).

The bench is the ONE metric the round driver records, so its hang
protection is load-bearing: a wedged tunnel dispatch must not swallow
completed measurements (CLAUDE.md environment notes document outright
hangs). These tests cover the deadline helper; the happy path is
exercised end-to-end on hardware (see .claude/skills/verify/SKILL.md).
"""

import time

import pytest

import bench


def test_deadline_completion_is_true():
    # Completion is signalled as True regardless of fn's return value --
    # the callers only need completed-vs-hung, and a fn returning None
    # must never be mistaken for the hang sentinel (None).
    assert bench._run_with_deadline(lambda: 41 + 1, 5.0) is True
    assert bench._run_with_deadline(lambda: None, 5.0) is True


def test_deadline_detects_hang():
    t0 = time.perf_counter()
    out = bench._run_with_deadline(lambda: time.sleep(30.0), 0.2)
    assert out is None
    assert time.perf_counter() - t0 < 5.0


def test_deadline_propagates_exception():
    with pytest.raises(ValueError, match="boom"):
        bench._run_with_deadline(
            lambda: (_ for _ in ()).throw(ValueError("boom")), 5.0
        )
