"""Phase timers and device tracing.

First-class observability subsystem (the reference has none — SURVEY.md §5.1
notes only notebook ``%%time`` cells).  Two tools:

* :class:`PhaseTimer` — lightweight named wall-clock phases with
  device-synchronizing boundaries, collected into a report;
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory.
"""

import contextlib
import logging
import time

import jax

logger = logging.getLogger("mellon_tpu")


class PhaseTimer:
    """Collect named phase durations; device-synchronized boundaries."""

    def __init__(self, name="mellon_tpu", log=True):
        self.name = name
        self.log = log
        self.phases = []

    @contextlib.contextmanager
    def phase(self, label, *sync_arrays):
        """Time a phase; pass result arrays to block on before stopping the
        clock (otherwise async dispatch hides device time)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            for arr in sync_arrays:
                try:
                    arr.block_until_ready()
                except AttributeError:
                    pass
            elapsed = time.perf_counter() - t0
            self.phases.append((label, elapsed))
            if self.log:
                logger.info("[%s] %s: %.3fs", self.name, label, elapsed)

    def sync(self):
        """Block until all outstanding device work completes."""
        jax.effects_barrier()

    def report(self):
        total = sum(t for _, t in self.phases)
        lines = [f"{self.name} phase report (total {total:.3f}s):"]
        for label, t in self.phases:
            share = 100 * t / total if total > 0 else 0
            lines.append(f"  {label:<32s} {t:>9.3f}s {share:>5.1f}%")
        return "\n".join(lines)

    def as_dict(self):
        return dict(self.phases)


@contextlib.contextmanager
def trace(log_dir="/tmp/mellon_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote profiler trace to %s.", log_dir)
