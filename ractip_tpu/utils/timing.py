"""Per-stage timing + profiler integration.

The reference's only observability hook is the compile-time SHOW_TIMINGS flag
printing per-phase wall time (reference src/contrafold/Config.hpp:26-27, used
e.g. InferenceEngine.ipp:3360-3362).  The TPU-native equivalents:

  * StageTimer -- a per-stage wall-clock accumulator.  `with timer("inside"):`
    blocks synchronize on the stage's device output (block_until_ready on
    whatever the block returns via .sync()) so the numbers mean device time,
    not dispatch time.  Nested/repeated stages accumulate.
  * profile_trace -- context manager around jax.profiler.trace, producing a
    TensorBoard/Perfetto trace of the wrapped region.
"""

from __future__ import annotations

import contextlib
import json
import time


class StageTimer:
    """Accumulates wall seconds per named stage.

    >>> t = StageTimer()
    >>> with t("fold"):
    ...     out = my_fold(...)
    ...     t.sync(out)            # block on device completion
    >>> t.report()
    {'fold': ...}
    """

    def __init__(self):
        self.seconds: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            self.seconds[stage] = self.seconds.get(stage, 0.0) + dt
            self.counts[stage] = self.counts.get(stage, 0) + 1

    @staticmethod
    def sync(x):
        """Block until device values in x are ready (no-op for host values)."""
        import jax
        jax.block_until_ready(x)
        return x

    def report(self) -> dict[str, float]:
        return dict(self.seconds)

    def json(self) -> str:
        return json.dumps({k: round(v, 6) for k, v in self.seconds.items()})

    def __repr__(self):
        parts = ", ".join(f"{k}={v:.3f}s" for k, v in self.seconds.items())
        return f"StageTimer({parts})"


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """JAX profiler trace of the wrapped region (view in TensorBoard/XProf)."""
    import jax
    with jax.profiler.trace(log_dir):
        yield
