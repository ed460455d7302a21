"""Per-phase timing and optional device tracing.

The reference's only observability is a tqdm bar and timestamped log
lines (SURVEY.md §5-a); falcon-tpu adds a lightweight phase profiler: the
pipeline driver wraps each phase (ingest, per-charge clustering, export)
in :func:`phase`, accumulated wall times are logged as a summary table at
the end of the run, and ``--profile <dir>`` additionally captures a JAX
device trace (viewable in TensorBoard / Perfetto).
"""

import contextlib
import logging
import threading
import time
from typing import Dict, Iterator, List, Optional, Tuple

logger = logging.getLogger("falcon_tpu")


class PhaseProfiler:
    """Accumulates named phase wall times (thread-safe)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._phases: List[Tuple[str, float]] = []
        self.trace_dir: Optional[str] = None
        self._tracing = False

    def add(self, name: str, elapsed: float) -> None:
        with self._lock:
            self._phases.append((name, elapsed))
        logger.debug("phase %-28s %8.3f s", name, elapsed)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.time()
        try:
            yield
        finally:
            elapsed = time.time() - start
            with self._lock:
                self._phases.append((name, elapsed))
            logger.debug("phase %-28s %8.3f s", name, elapsed)

    def start_trace(self, trace_dir: str) -> None:
        """Begin a JAX profiler trace into ``trace_dir`` (best effort)."""
        try:
            import jax

            jax.profiler.start_trace(trace_dir)
            self.trace_dir = trace_dir
            self._tracing = True
        except Exception as e:  # pragma: no cover - backend dependent
            logger.warning("Could not start device trace: %s", e)

    def stop_trace(self) -> None:
        if self._tracing:
            try:
                import jax

                jax.profiler.stop_trace()
                logger.info("Device trace written to %s", self.trace_dir)
            except Exception as e:  # pragma: no cover
                logger.warning("Could not stop device trace: %s", e)
            self._tracing = False

    def summary(self) -> Dict[str, float]:
        """Aggregated seconds per phase name, in first-seen order."""
        out: Dict[str, float] = {}
        with self._lock:
            for name, elapsed in self._phases:
                out[name] = out.get(name, 0.0) + elapsed
        return out

    def log_summary(self) -> None:
        summary = self.summary()
        if not summary:
            return
        total = sum(summary.values())
        logger.info("Phase timing summary:")
        for name, elapsed in summary.items():
            logger.info(
                "  %-28s %8.3f s  (%4.1f%%)",
                name, elapsed, 100.0 * elapsed / total if total else 0.0,
            )
        logger.info("  %-28s %8.3f s", "total (tracked)", total)

    def reset(self) -> None:
        with self._lock:
            self._phases.clear()


class StageTimer:
    """Sequential stage marker: ``t.stage("x")`` closes the previous
    stage and opens "x"; ``t.finish()`` closes the last one.  Stages are
    recorded into the global :data:`profiler`."""

    def __init__(self, prefix: str = ""):
        self.prefix = prefix
        self._name: Optional[str] = None
        self._start = 0.0

    def stage(self, name: str) -> None:
        now = time.time()
        if self._name is not None:
            profiler.add(self.prefix + self._name, now - self._start)
        self._name, self._start = name, now

    def finish(self) -> None:
        if self._name is not None:
            profiler.add(self.prefix + self._name,
                         time.time() - self._start)
            self._name = None


profiler = PhaseProfiler()
