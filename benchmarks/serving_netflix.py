"""Serving-path retrieval throughput at Netflix shape (480k x 17.7k).

Measures, on the single v5e chip, the fused full-catalog score -> top-100
retrieval (`ops/pallas_ranking.fused_topk`, XLA path on this rig) that
backs `Recommender.recommend_batch` and `TPUExactANN`:

  - batched throughput (users/s) at serving batch sizes 256..8192,
  - single-user latency (batch 1, warm),

over k=50 BPR-style factors + item biases. Prints one JSON line.
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
    import jax
    import jax.numpy as jnp

    from cornac_tpu.ops.pallas_ranking import fused_topk

    rng = np.random.RandomState(0)
    U = jnp.asarray(rng.randn(N_USERS, K).astype(np.float32))
    V = jnp.asarray(rng.randn(N_ITEMS, K).astype(np.float32))
    bias = jnp.asarray(rng.randn(N_ITEMS).astype(np.float32))

    out = {"n_users": N_USERS, "n_items": N_ITEMS, "k": K, "topk": TOPK}
    for bsz in (1, 256, 1024, 4096, 8192):
        users = jnp.asarray(rng.randint(0, N_USERS, max(bsz, 1)), jnp.int32)

        def run():
            s, i = fused_topk(U[users], V, TOPK, bias=bias)
            jax.block_until_ready((s, i))

        run()  # compile
        reps = 20 if bsz <= 1024 else 5
        t0 = time.time()
        for _ in range(reps):
            run()
        dt = (time.time() - t0) / reps
        if bsz == 1:
            out["single_user_latency_ms"] = round(dt * 1e3, 2)
        else:
            out[f"users_per_s_b{bsz}"] = round(bsz / dt)
    print(json.dumps({"metric": "netflix_retrieval_topk", "value":
                      out.get("users_per_s_b8192", 0), "unit": "users/s",
                      "detail": out}))


if __name__ == "__main__":
    main()
