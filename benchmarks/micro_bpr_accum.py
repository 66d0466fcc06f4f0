"""Decompose the BPR step cost on the real TPU: where do the ~150us/step go,
and what does bf16 one-hot accumulation (f32 MXU accumulate) buy?

Shapes mirror bench.py: 943x1682 tables, k=10(+bias)=11, batch 4096.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    n_users, n_items, k, B = 943, 1682, 11, 4096
    key = jax.random.PRNGKey(0)
    U = jax.random.normal(key, (n_users, k), jnp.float32)
    V = jax.random.normal(key, (n_items, k), jnp.float32)
    u = jax.random.randint(key, (B,), 0, n_users)
    i = jax.random.randint(key, (B,), 0, n_items)
    j = jax.random.randint(key, (B,), 0, n_items)
    ij = jnp.concatenate([i, j])
    dU = jax.random.normal(key, (B, k), jnp.float32) * 1e-3
    dV = jax.random.normal(key, (2 * B, k), jnp.float32) * 1e-3

    STEPS = 100

    def loop(body, *args):
        @jax.jit
        def run(*a):
            def f(s, c):
                return body(*c)
            return jax.lax.fori_loop(0, STEPS, f, a)
        return run

    # 1. one-hot f32 (current)
    def onehot_f32(U, V):
        ohU = jax.nn.one_hot(u, n_users, dtype=jnp.float32)
        ohV = jax.nn.one_hot(ij, n_items, dtype=jnp.float32)
        return (U + jnp.tensordot(ohU, dU, axes=((0,), (0,))),
                V + jnp.tensordot(ohV, dV, axes=((0,), (0,))))

    # 2. one-hot bf16 inputs, f32 accumulate on MXU
    def onehot_bf16(U, V):
        ohU = jax.nn.one_hot(u, n_users, dtype=jnp.bfloat16)
        ohV = jax.nn.one_hot(ij, n_items, dtype=jnp.bfloat16)
        su = jax.lax.dot_general(ohU.T, dU.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sv = jax.lax.dot_general(ohV.T, dV.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return U + su, V + sv

    # 3. sorted scatter
    def scatter(U, V):
        ou = jnp.argsort(u)
        ov = jnp.argsort(ij)
        return (U.at[u[ou]].add(dU[ou], indices_are_sorted=True),
                V.at[ij[ov]].add(dV[ov], indices_are_sorted=True))

    # 4. gather+compute only (no accumulate)
    def gather_only(U, V):
        wu, vi, vj = U[u], V[i], V[j]
        x = jnp.sum(wu * (vi - vj), axis=1)
        z = 1.0 / (1.0 + jnp.exp(x))
        return U + 1e-9 * jnp.sum(z), V

    # 5. full step f32 (gather + grads + one-hot f32)
    def full_f32(U, V):
        wu, vi, vj = U[u], V[i], V[j]
        x = jnp.sum(wu * (vi - vj), axis=1)
        z = 1.0 / (1.0 + jnp.exp(x))
        gU = z[:, None] * (vi - vj) - 0.01 * wu
        gVi = z[:, None] * wu - 0.01 * vi
        gVj = -z[:, None] * wu - 0.01 * vj
        ohU = jax.nn.one_hot(u, n_users, dtype=jnp.float32)
        ohV = jax.nn.one_hot(ij, n_items, dtype=jnp.float32)
        gV = jnp.concatenate([gVi, gVj])
        return (U + 0.001 * jnp.tensordot(ohU, gU, axes=((0,), (0,))),
                V + 0.001 * jnp.tensordot(ohV, gV, axes=((0,), (0,))))

    # 6. full step with bf16 accumulation
    def full_bf16(U, V):
        wu, vi, vj = U[u], V[i], V[j]
        x = jnp.sum(wu * (vi - vj), axis=1)
        z = 1.0 / (1.0 + jnp.exp(x))
        gU = z[:, None] * (vi - vj) - 0.01 * wu
        gVi = z[:, None] * wu - 0.01 * vi
        gVj = -z[:, None] * wu - 0.01 * vj
        ohU = jax.nn.one_hot(u, n_users, dtype=jnp.bfloat16)
        ohV = jax.nn.one_hot(ij, n_items, dtype=jnp.bfloat16)
        gV = jnp.concatenate([gVi, gVj]).astype(jnp.bfloat16)
        su = jax.lax.dot_general(ohU.T, gU.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sv = jax.lax.dot_general(ohV.T, gV,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return U + 0.001 * su, V + 0.001 * sv

    for name, body in [("onehot_f32", onehot_f32), ("onehot_bf16", onehot_bf16),
                       ("scatter_sorted", scatter), ("gather_only", gather_only),
                       ("full_f32", full_f32), ("full_bf16", full_bf16)]:
        fn = loop(body)
        t = timeit(fn, U, V, n=10)
        print(f"{name:16s} {t / STEPS * 1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
