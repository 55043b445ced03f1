"""ProgressBar (reference: dask/diagnostics/progress.py:32) — the
text bar most dask users keep in muscle memory, re-expressed over
Spark's status tracker.

dask's ProgressBar is a scheduler callback polling pending task counts
every ``dt`` seconds; Spark's equivalent signal is
``sc.statusTracker()`` (active stages + per-stage task counts), which
is exactly what this polls from a daemon thread — no JVM listener
registration needed from Python, and the bar works for ANY action run
inside the context (collect, count, toPandas, write), not just this
package's ``compute``.

    with ProgressBar():
        frame.compute()
    [########################################] | 100% Completed |  1.2s

Progress is cumulative over every stage observed during the block:
completed tasks / total tasks. ``register()``/``unregister()`` keep a
bar active for all subsequent actions, like dask's global callback
registration."""

from __future__ import annotations

import sys
import threading
import time
from timeit import default_timer


def format_time(t: float) -> str:
    """Seconds → '10.4s' / '16min 40.4s' / ' 1hr  2min  3.0s'
    (reference: dask/diagnostics/progress.py format_time)."""
    m, s = divmod(t, 60)
    h, m = divmod(m, 60)
    if h:
        return f"{h:2.0f}hr {m:2.0f}min {s:4.1f}s"
    if m:
        return f"{m:2.0f}min {s:4.1f}s"
    return f"{s:4.1f}s"


class ProgressBar:
    """Text progress bar over Spark stage/task progress.

    Parameters mirror the reference: ``minimum`` seconds before the
    bar first draws, ``width`` characters of bar, ``dt`` poll
    interval, ``out`` writable (default stdout). The duration of the
    last block is kept on ``last_duration``."""

    def __init__(self, spark=None, minimum: float = 0, width: int = 40,
                 dt: float = 0.1, out=None):
        self._spark = spark
        self._minimum = minimum
        self._width = width
        self._dt = dt
        self._out = out if out is not None else sys.stdout
        self._running = False
        self._thread: threading.Thread | None = None
        self.last_duration = 0.0

    # ---- lifecycle ----------------------------------------------------
    def __enter__(self):
        self._start()
        return self

    def __exit__(self, *exc):
        self._stop(draw_final=exc[0] is None)

    def register(self):
        """Keep the bar running for all subsequent actions (dask's
        global callback registration)."""
        self._start()
        return self

    def unregister(self):
        self._stop(draw_final=False)

    # ---- internals ----------------------------------------------------
    def _tracker(self):
        if self._spark is None:
            from dask_spark.session import get_spark

            self._spark = get_spark()
        return self._spark.sparkContext.statusTracker()

    def _start(self):
        if self._running:
            return
        self._running = True
        self._start_time = default_timer()
        # stage_id -> (num_tasks, num_completed): cumulative over the
        # block, so multi-stage plans show one continuous bar
        self._stages: dict[int, tuple[int, int]] = {}
        tracker = self._tracker()
        self._thread = threading.Thread(
            target=self._loop, args=(tracker,), daemon=True
        )
        self._thread.start()

    def _stop(self, draw_final: bool):
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=max(1.0, 4 * self._dt))
            self._thread = None
        self.last_duration = default_timer() - self._start_time
        if draw_final and self.last_duration >= self._minimum:
            self._draw(1.0)
            self._out.write("\n")
            try:
                self._out.flush()
            except (AttributeError, ValueError):
                pass

    def _poll(self, tracker):
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info is None:
                continue
            self._stages[sid] = (info.numTasks, info.numCompletedTasks)

    def _fraction(self) -> float:
        total = sum(t for t, _ in self._stages.values())
        done = sum(c for _, c in self._stages.values())
        return done / total if total else 0.0

    def _loop(self, tracker):
        while self._running:
            try:
                self._poll(tracker)
            except Exception:
                # tracker calls race with context shutdown; the bar
                # must never take the computation down with it
                pass
            if default_timer() - self._start_time >= self._minimum:
                self._draw(self._fraction())
            time.sleep(self._dt)

    def _draw(self, frac: float):
        frac = min(max(frac, 0.0), 1.0)
        bar = "#" * int(self._width * frac)
        pct = int(100 * frac)
        elapsed = format_time(default_timer() - self._start_time)
        msg = (f"\r[{bar:<{self._width}}] | {pct}% "
               f"{'Completed' if frac >= 1 else 'In Progress'} | {elapsed}")
        try:
            self._out.write(msg)
            self._out.flush()
        except (AttributeError, ValueError):
            pass
