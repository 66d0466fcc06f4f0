"""Microbenchmark: BPR step structure — separate U/V accumulations vs one
merged-table accumulation.

At ML-100K scale the fused 200-epoch BPR program sits at a per-step
latency floor (~155 us with ~0.4 GFLOP of work). One candidate lever is
op count: stacking U and V into a single (R_u + R_i, k+1) table turns the
three gathers + two one-hot-matmul accumulations into three gathers + ONE
accumulation over 3B rows — 1.8x the matmul FLOPs but one fewer
MXU-launch per step. This measures both inside a fused loop at the
headline bench shape.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 200


def bench(name, fn, *args):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(*args))
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps({"variant": name, "us_per_step": round(best / STEPS * 1e6, 1)}),
        flush=True,
    )


def main():
    n_users, n_items, k, B = 944, 1683, 11, 4096
    rng = np.random.RandomState(0)
    U = jnp.asarray(rng.randn(n_users, k).astype(np.float32))
    V = jnp.asarray(rng.randn(n_items, k).astype(np.float32))
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(0.01)
    reg = jnp.float32(0.01)

    def step_core(U, V, u, i, j):
        wu, vi, vj = U[u], V[i], V[j]
        x = jnp.sum(wu * (vi - vj), axis=1)
        z = 1.0 / (1.0 + jnp.exp(x))
        dU = z[:, None] * (vi - vj) - reg * wu
        dVi = z[:, None] * wu - reg * vi
        dVj = -z[:, None] * wu - reg * vj
        return dU, dVi, dVj

    def separate(U, V):
        def body(s, carry):
            U, V = carry
            kk = jax.random.fold_in(key, s)
            u = jax.random.randint(kk, (B,), 0, n_users)
            i = jax.random.randint(jax.random.fold_in(kk, 1), (B,), 0, n_items)
            j = jax.random.randint(jax.random.fold_in(kk, 2), (B,), 0, n_items)
            dU, dVi, dVj = step_core(U, V, u, i, j)
            ohu = jax.nn.one_hot(u, n_users, dtype=U.dtype)
            U = U + jnp.tensordot(ohu, lr * dU, axes=((0,), (0,)))
            ij = jnp.concatenate([i, j])
            dV = jnp.concatenate([dVi, dVj])
            ohv = jax.nn.one_hot(ij, n_items, dtype=V.dtype)
            V = V + jnp.tensordot(ohv, lr * dV, axes=((0,), (0,)))
            return U, V

        return jax.lax.fori_loop(0, STEPS, body, (U, V))

    def merged(W):
        def body(s, W):
            kk = jax.random.fold_in(key, s)
            u = jax.random.randint(kk, (B,), 0, n_users)
            i = n_users + jax.random.randint(
                jax.random.fold_in(kk, 1), (B,), 0, n_items
            )
            j = n_users + jax.random.randint(
                jax.random.fold_in(kk, 2), (B,), 0, n_items
            )
            wu, vi, vj = W[u], W[i], W[j]
            x = jnp.sum(wu * (vi - vj), axis=1)
            z = 1.0 / (1.0 + jnp.exp(x))
            dU = z[:, None] * (vi - vj) - reg * wu
            dVi = z[:, None] * wu - reg * vi
            dVj = -z[:, None] * wu - reg * vj
            ids = jnp.concatenate([u, i, j])
            upd = jnp.concatenate([dU, dVi, dVj])
            oh = jax.nn.one_hot(ids, W.shape[0], dtype=W.dtype)
            return W + jnp.tensordot(oh, lr * upd, axes=((0,), (0,)))

        return jax.lax.fori_loop(0, STEPS, body, W)

    bench("separate_tables", separate, U, V)
    W = jnp.concatenate([U, V], axis=0)
    bench("merged_table", merged, W)


if __name__ == "__main__":
    main()
