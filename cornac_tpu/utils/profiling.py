"""Step-time metrics and profiler trace hooks (SURVEY §5).

The reference's observability is wall-clock ``time.time()`` around fit/eval
plus tqdm bars; this module adds the cheap wins the survey lists: real
per-step timing with summary statistics, and a context manager around
``jax.profiler`` so any fit/eval region can produce a TensorBoard-loadable
device trace.
"""

import contextlib
import json
import time

import numpy as np


class StepTimer:
    """Collects per-step wall-clock durations; summarizes p50/p90/mean.

    Use either as a context manager per step::

        timer = StepTimer("train_step")
        for batch in batches:
            with timer:
                step(batch)
        print(timer.summary())

    or via explicit ``tick()`` calls (duration = gap between ticks).
    """

    def __init__(self, name="step"):
        self.name = name
        self.durations = []
        self._t0 = None
        self._last_tick = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        return False

    def tick(self):
        now = time.perf_counter()
        if self._last_tick is not None:
            self.durations.append(now - self._last_tick)
        self._last_tick = now

    def summary(self):
        if not self.durations:
            return {"name": self.name, "steps": 0}
        d = np.asarray(self.durations)
        return {
            "name": self.name,
            "steps": int(d.size),
            "total_s": float(d.sum()),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "max_s": float(d.max()),
            "steps_per_s": float(d.size / d.sum()) if d.sum() > 0 else 0.0,
        }

    def dump(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(logdir=None):
    """Profile the enclosed region with ``jax.profiler``.

    With a ``logdir``, writes a TensorBoard trace there; without one, this
    is a no-op region (so call sites can leave the hook in production
    code and enable it with a flag).
    """
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named sub-region inside an active trace (XPlane annotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def block_until_ready(tree):
    """Barrier helper so StepTimer measures device time, not dispatch."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
