"""Serving-path retrieval throughput at Netflix shape (480k x 17.7k).

Measures, on the single v5e chip, the fused full-catalog score -> top-100
retrieval (`ops/pallas_ranking.fused_topk`, XLA path on this rig) that
backs `Recommender.recommend_batch` and `TPUExactANN`:

  - batched throughput (users/s) at serving batch sizes 256..8192 for
    three modes: exact f32, exact bf16-operand scoring, and the
    approx_max_k pruned mode (recall_target 0.95) that mirrors the
    reference's approximate ANN backends,
  - single-user latency (batch 1, warm),
  - measured top-k agreement of the bf16 and approx modes vs exact f32.

Timing rules for this rig (see micro_gather_roofline.py): every timed
call uses a FRESH user batch (the tunnel memoizes identical executions)
and is synchronized by pulling a result element to host
(block_until_ready can return early). k=50 BPR-style factors + biases.
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
V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0


def main():
    bench._enable_compile_cache()
    import jax.numpy as jnp

    from cornac_tpu.ops.pallas_ranking import fused_topk

    rng = np.random.RandomState(0)
    U = jnp.asarray(rng.randn(N_USERS, K).astype(np.float32))
    V = jnp.asarray(rng.randn(N_ITEMS, K).astype(np.float32))
    bias = jnp.asarray(rng.randn(N_ITEMS).astype(np.float32))

    def batch(bsz):
        return jnp.asarray(rng.randint(0, N_USERS, max(bsz, 1)), jnp.int32)

    out = {"n_users": N_USERS, "n_items": N_ITEMS, "k": K, "topk": TOPK}

    modes = {
        "f32": dict(precision="f32"),
        "bf16": dict(precision="bf16"),
        "approx95": dict(recall_target=0.95),
    }

    # agreement vs exact f32 on one batch
    users = batch(4096)
    s32, i32 = fused_topk(U[users], V, TOPK, bias=bias, precision="f32")
    i32h = np.asarray(i32)
    for name in ("bf16", "approx95"):
        _, im = fused_topk(U[users], V, TOPK, bias=bias, **modes[name])
        imh = np.asarray(im)
        overlap = np.mean(
            [len(set(a) & set(b)) / TOPK for a, b in zip(i32h, imh)]
        )
        out[f"{name}_topk_overlap"] = round(float(overlap), 5)
        print(f"[agree] {name} top-{TOPK} overlap {overlap:.4f}",
              file=sys.stderr, flush=True)

    for name, mode_kw in modes.items():
        for bsz in (1, 256, 1024, 4096, 8192):
            reps = 20 if bsz <= 1024 else 8
            # warm compile on a throwaway batch
            s, i = fused_topk(U[batch(bsz)], V, TOPK, bias=bias, **mode_kw)
            float(s[0, 0])
            batches = [batch(bsz) for _ in range(reps)]
            t0 = time.time()
            for ub in batches:
                s, i = fused_topk(U[ub], V, TOPK, bias=bias, **mode_kw)
            float(s[0, 0])  # drain the async queue
            dt = (time.time() - t0) / reps
            if bsz == 1:
                out[f"single_user_latency_ms_{name}"] = round(dt * 1e3, 2)
            else:
                out[f"users_per_s_b{bsz}_{name}"] = round(bsz / dt)
            # analytic FLOP rate of the scoring matmul
            tf = 2 * bsz * N_ITEMS * K / dt / 1e12
            peak = V5E_BF16_TFLOPS if name == "bf16" else V5E_F32_TFLOPS
            out[f"mfu_b{bsz}_{name}"] = round(tf / peak, 4)
            print(
                f"[{name} b={bsz}] {dt*1e3:.2f} ms -> "
                f"{bsz/dt:,.0f} users/s, {tf:.2f} TFLOP/s",
                file=sys.stderr, flush=True,
            )

    print(
        json.dumps(
            {
                "metric": "netflix_retrieval_topk",
                "value": out.get("users_per_s_b8192_f32", 0),
                "unit": "users/s",
                "detail": out,
            }
        )
    )


if __name__ == "__main__":
    main()
