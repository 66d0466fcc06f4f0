"""Measure every golden builder once and print `name kind metric value time`
— used to freeze the floors in tests/test_quality_goldens.py."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import golden_models as G


def main():
    names = sys.argv[1:] or list(G.builders())
    for name in names:
        kind, metric, _ = G.builders()[name]
        t0 = time.time()
        try:
            v = G.measure(name)
            print(f"{name:14s} {kind:13s} {metric:5s} {v:8.4f}  {time.time()-t0:6.1f}s",
                  flush=True)
        except Exception as e:
            print(f"{name:14s} {kind:13s} {metric:5s} ERROR {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
