"""Unit tests for ospo_tpu.utils.prefetch.prefetch_iter — the shared
single-worker prefetch used by step-4 scoring, the trainer and bench."""

import threading
import time

import pytest

from ospo_tpu.utils.prefetch import prefetch_iter


def test_order_and_pairing():
    got = list(prefetch_iter(range(5), lambda x: x * 10))
    assert got == [(i, i * 10) for i in range(5)]


def test_empty():
    assert list(prefetch_iter([], lambda x: x)) == []


def test_identity_prepare():
    assert list(prefetch_iter("ab")) == [("a", "a"), ("b", "b")]


def test_work_runs_off_caller_thread():
    caller = threading.get_ident()
    seen = []

    def prep(x):
        seen.append(threading.get_ident())
        return x

    list(prefetch_iter(range(3), prep))
    assert seen and all(t != caller for t in seen)


def test_prepare_exception_surfaces_at_yield():
    def prep(x):
        if x == 2:
            raise ValueError("boom")
        return x

    it = prefetch_iter(range(4), prep)
    assert next(it) == (0, 0)
    assert next(it) == (1, 1)
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_source_exception_surfaces_at_yield():
    def src():
        yield 1
        raise RuntimeError("src died")

    it = prefetch_iter(src(), lambda x: x)
    assert next(it) == (1, 1)
    with pytest.raises(RuntimeError, match="src died"):
        next(it)


def test_early_exit_does_not_block():
    """break mid-iteration must abandon the in-flight pull quickly even
    when prepare is slow (shutdown(wait=False))."""
    def prep(x):
        time.sleep(0.2)
        return x

    t0 = time.time()
    for item, _ in prefetch_iter(range(100), prep):
        if item == 1:
            break
    assert time.time() - t0 < 2.0


def test_prefetch_overlaps():
    """While the caller 'computes' on item N, item N+1's prepare should
    already be running: total serial time would be n*(prep+consume);
    overlapped it approaches n*max(prep, consume)."""
    d = 0.05
    n = 6

    t0 = time.time()
    for _ in prefetch_iter(range(n), lambda x: (time.sleep(d), x)):
        time.sleep(d)  # caller-side consume
    elapsed = time.time() - t0
    serial = n * 2 * d
    assert elapsed < serial * 0.85, f"no overlap: {elapsed:.3f}s vs {serial:.3f}s"
