"""Exact serving retrieval: single-shot lax.top_k vs the approx-seeded
threshold-refined EXACT selection (_fused_topk_xla_threshold) at Netflix
serving shape. Companion to micro_topk_twostage.py (which measured the
partitioned form at 0.61x — a negative result); this form replaces the
full selection with an O(N) cumsum+scatter compaction and a top-k over
slack*k survivors, exact by construction.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402

N_USERS, N_ITEMS, K, TOPK = 480_000, 17_700, 50, 100


def main():
    bench._enable_compile_cache()
    import jax.numpy as jnp

    from cornac_tpu.ops.pallas_ranking import (
        _fused_topk_xla, _fused_topk_xla_threshold,
    )

    rng = np.random.RandomState(0)
    U = jnp.asarray(rng.randn(N_USERS, K).astype(np.float32))
    V = jnp.asarray(rng.randn(N_ITEMS, K).astype(np.float32))
    bias = jnp.asarray(rng.randn(N_ITEMS).astype(np.float32))

    def batch(bsz):
        return jnp.asarray(rng.randint(0, N_USERS, bsz), jnp.int32)

    out = {"n_items": N_ITEMS, "k": K, "topk": TOPK, "modes": {}}

    # exactness on one large batch
    users = batch(4096)
    s1, i1 = _fused_topk_xla(U[users], V, bias, TOPK)
    s2, i2 = _fused_topk_xla_threshold(U[users], V, bias, TOPK)
    assert np.array_equal(np.asarray(i2), np.asarray(i1)), "refined not exact"
    out["exactness_checked_batch"] = 4096

    modes = {
        "single": lambda q: _fused_topk_xla(q, V, bias, TOPK),
        "refined_s4": lambda q: _fused_topk_xla_threshold(q, V, bias, TOPK, slack=4),
        "refined_s8": lambda q: _fused_topk_xla_threshold(q, V, bias, TOPK, slack=8),
        "refined_s16": lambda q: _fused_topk_xla_threshold(q, V, bias, TOPK, slack=16),
    }
    for name, fn in modes.items():
        rates = {}
        for bsz in (256, 1024, 4096, 8192):
            reps = 16 if bsz <= 1024 else 8
            s, _ = fn(U[batch(bsz)])
            float(s[0, 0])  # warm + sync
            batches = [batch(bsz) for _ in range(reps)]
            t0 = time.perf_counter()
            for ub in batches:
                s, _ = fn(U[ub])
            float(s[0, 0])
            dt = time.perf_counter() - t0
            rates[bsz] = round(reps * bsz / dt)
        out["modes"][name] = rates
        print(f"[{name}] {rates} users/s", file=sys.stderr, flush=True)

    best_name, best = max(
        ((n, max(r.values())) for n, r in out["modes"].items() if n != "single"),
        key=lambda t: t[1],
    )
    single = max(out["modes"]["single"].values())
    out["best_refined"] = {"mode": best_name, "users_per_s": best}
    out["speedup_vs_single"] = round(best / single, 2)
    print(json.dumps({"metric": "serving_exact_topk_refined",
                      "value": best, "unit": "users/s", "detail": out}),
          flush=True)


if __name__ == "__main__":
    main()
