"""Tracing/profiling helpers (SURVEY.md §5 "Tracing / profiling": the
reference has none — wall clock via log timestamps; the rebuild wraps
``jax.profiler`` traces around the device kernels and derives
cell-updates/sec).
"""

from __future__ import annotations

import contextlib
import time

from tehmm_tpu.utils.common import logger


@contextlib.contextmanager
def trace(out_dir: str | None):
    """Capture a jax.profiler device trace into ``out_dir`` (viewable in
    TensorBoard / Perfetto).  No-op when out_dir is falsy."""
    if not out_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s", out_dir)


def marginal_time(run, sync, iters: int, robust: bool = False) -> float:
    """Two-point marginal-rate timing protocol (BASELINE.md round 3).

    The tunneled dev backend charges a fixed ~25-30 ms pipeline-fill +
    scalar-fetch round trip to ANY timed dispatch chain regardless of
    its length (measured: 7.4 ms/iter at n=5 vs 2.3 ms/iter at n=80 for
    the same program), so single-chain averages overstate per-iteration
    cost badly.  Timing two chain lengths and taking
    ``(T2 - T1) / (n2 - n1)`` isolates the sustained per-iteration
    device time.  This is THE protocol every benchmark tool uses — one
    implementation, here, so a protocol fix lands everywhere at once.

    Args:
      run: zero-arg callable dispatching one iteration (async ok).
      sync: called with run()'s result; must fully drain the queue
        (a scalar ``float()`` fetch — block_until_ready can return
        early through the tunnel).
      iters: short chain length n1 (long chain is 6×).
      robust: min-of-two chains per point + amortized fallback when the
        subtraction goes non-positive — needed on noisy CPU hosts.
    """
    sync(run())                       # compile + warm

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run()
        sync(out)
        return time.perf_counter() - t0

    if robust:
        chain(iters)                  # warm caches past compile
        t1 = min(chain(iters), chain(iters))
        t2 = min(chain(6 * iters), chain(6 * iters))
    else:
        t1 = chain(iters)
        t2 = chain(6 * iters)
    dt = (t2 - t1) / (5 * iters)
    return dt if dt > 0 else t2 / (6 * iters)


class StageTimer:
    """Lightweight wall-clock stage timing with a derived-metric report
    (positions/s, cell-updates/s)."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = (
                self.stages.get(name, 0.0) + time.perf_counter() - t0
            )

    def report(self, positions: int | None = None,
               num_states: int | None = None) -> dict:
        out: dict = {"stages_seconds": dict(self.stages)}
        total = sum(self.stages.values())
        out["total_seconds"] = total
        if positions and total > 0:
            out["positions_per_sec"] = positions / total
            if num_states:
                out["cell_updates_per_sec"] = (
                    2 * positions * num_states * num_states / total
                )
        return out
