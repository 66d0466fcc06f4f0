"""Pallas fused score->top-k vs the XLA path at Netflix serving shape, on
real silicon.

r2-r4 recorded Mosaic as hanging through this rig's remote-compile
tunnel; the r5 re-run of benchmarks/pallas_on_silicon.py found the
blocker GONE (canary compiles in ~36 s cold). This harness is the first
hardware measurement of ops/pallas_ranking's streaming-top-k kernel at
production shape: exactness assert vs the XLA path, then a batch sweep
under the rig's timing rules (fresh batches, host-forced sync).

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

    from cornac_tpu.ops.pallas_ranking import fused_topk

    rng = np.random.RandomState(0)
    U = jnp.asarray(rng.randn(N_USERS, K).astype(np.float32))
    V = jnp.asarray(rng.randn(N_ITEMS, K).astype(np.float32))
    bias = jnp.asarray(rng.randn(N_ITEMS).astype(np.float32))

    def batch(bsz):
        return jnp.asarray(rng.randint(0, N_USERS, bsz), jnp.int32)

    out = {"n_items": N_ITEMS, "k": K, "topk": TOPK, "modes": {}}

    # exactness on silicon (the interpret-mode tests prove the logic;
    # this proves the Mosaic compilation)
    users = batch(1024)
    t0 = time.perf_counter()
    sp, ip = fused_topk(U[users], V, TOPK, bias=bias, force="pallas")
    float(sp[0, 0])
    out["pallas_cold_compile_s"] = round(time.perf_counter() - t0, 1)
    sx, ix = fused_topk(U[users], V, TOPK, bias=bias, force="xla")
    assert np.array_equal(np.asarray(ip), np.asarray(ix)), "pallas != xla"
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-5)
    out["exact_on_silicon"] = True

    for name, force in (("xla", "xla"), ("pallas", "pallas")):
        rates = {}
        for bsz in (256, 1024, 4096, 8192):
            reps = 16 if bsz <= 1024 else 8
            s, _ = fused_topk(U[batch(bsz)], V, TOPK, bias=bias, force=force)
            float(s[0, 0])  # warm + sync
            batches = [batch(bsz) for _ in range(reps)]
            t0 = time.perf_counter()
            for ub in batches:
                s, _ = fused_topk(U[ub], V, TOPK, bias=bias, force=force)
            float(s[0, 0])
            dt = time.perf_counter() - t0
            rates[bsz] = round(reps * bsz / dt)
        out["modes"][name] = rates
        print(f"[{name}] {rates} users/s", file=sys.stderr, flush=True)

    best_p = max(out["modes"]["pallas"].values())
    best_x = max(out["modes"]["xla"].values())
    out["pallas_vs_xla"] = round(best_p / best_x, 2)
    print(json.dumps({"metric": "serving_topk_pallas_vs_xla",
                      "value": best_p, "unit": "users/s", "detail": out}),
          flush=True)


if __name__ == "__main__":
    main()
