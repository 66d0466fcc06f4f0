"""Prototype: B+-tree membership probe + fully layout-optimized BPR step.

micro_gather_variants.py found the fast-gather cliff: only 64/128-wide
f32 rows hit the fast row-gather path (~115 Mrows/s vs ~23 Mrows/s for
k=33).  This prototypes the consequences end-to-end:

- ``btree`` probe: per-user 64-wide sorted leaves + one 64-wide internal
  node (slot 0 = leaf base, slots 1.. = leaf separators).  Query = 2 fat
  row gathers + VPU compares, replacing log2(max_degree) serial 4-byte
  gathers.  Exact membership, degree <= 64*63.
- ``optstep``: the whole BPR minibatch step with 64-padded tables, (n,2)
  packed pair gather, plain scatters, btree probe — the candidate new
  trainer inner loop, vs the current one (micro_gather_roofline 'full').

Usage: python benchmarks/micro_btree_probe.py [n_millions] [B]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from benchmarks.micro_gather_roofline import build_data, N_USERS, N_ITEMS  # noqa: E402

SENTINEL = np.int32(2**31 - 1)


def build_btree(csr, width=64):
    """Host build: (leaves, internal) int32 arrays. Row u of ``internal``:
    [0] = first leaf index of u, [1:] = first key of leaves 1.. (SENTINEL
    padded). Leaves are the user's sorted item ids padded to ``width``."""
    n_users = csr.shape[0]
    deg = np.diff(csr.indptr)
    n_leaves = np.maximum((deg + width - 1) // width, 1)
    assert n_leaves.max(initial=1) <= width - 1, "degree exceeds 2-level btree"
    leaf_start = np.zeros(n_users + 1, np.int64)
    np.cumsum(n_leaves, out=leaf_start[1:])
    total = int(leaf_start[-1])
    leaves = np.full((total, width), SENTINEL, np.int32)
    # scatter each interaction into its leaf slot
    rows = np.repeat(np.arange(n_users), deg)
    offs = np.arange(len(csr.indices)) - np.repeat(csr.indptr[:-1], deg)
    leaves[leaf_start[rows] + (offs // width), offs % width] = csr.indices
    internal = np.full((n_users, width), SENTINEL, np.int32)
    internal[:, 0] = leaf_start[:-1]
    # separators: first key of each leaf beyond the first
    li = np.arange(1, int(n_leaves.max(initial=1)))
    for l in li:  # max ~max_degree/width iterations, tiny
        has = n_leaves > l
        internal[has, l] = leaves[leaf_start[:-1][has] + l, 0]
    return leaves, internal


def main():
    bench._enable_compile_cache()
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    import jax
    import jax.numpy as jnp

    from cornac_tpu.ops.membership import build_membership

    rng = np.random.RandomState(0)
    u, i, csr = build_data(int(n_m * 1e6), rng)
    n = len(u)
    print(f"[data] {n} interactions, max deg {int(np.diff(csr.indptr).max())}",
          file=sys.stderr, flush=True)

    leaves_h, internal_h = build_btree(csr)
    # host sanity: probe 100k random pairs against scipy
    qs_u = rng.randint(0, N_USERS, 100_000)
    qs_j = rng.randint(0, N_ITEMS, 100_000)
    truth = np.asarray(csr[qs_u, qs_j]).ravel() > 0

    leaves = jnp.asarray(leaves_h)
    internal = jnp.asarray(internal_h)
    mem = build_membership(csr, bitmap_max_bytes=0)
    uic2 = jnp.asarray(np.stack([u, i], axis=1), jnp.int32)
    K = 64  # padded width (32 factors + bias + zero pad)
    U0 = jnp.asarray(rng.randn(N_USERS, K).astype(np.float32))
    V0 = jnp.asarray(rng.randn(N_ITEMS, K).astype(np.float32))

    def btree_query(leaves, internal, uu, jj):
        node = internal[uu]  # (B, 64) fat gather
        base = node[:, 0]
        child = jnp.sum(node[:, 1:] <= jj[:, None], axis=1).astype(jnp.int32)
        leaf = leaves[base + child]  # (B, 64) fat gather
        return jnp.any(leaf == jj[:, None], axis=1)

    # correctness first
    got = np.asarray(
        jax.jit(btree_query)(
            leaves, internal,
            jnp.asarray(qs_u, jnp.int32), jnp.asarray(qs_j, jnp.int32),
        )
    )
    assert (got == truth).all(), f"btree mismatch: {np.sum(got != truth)}"
    print("[btree] 100k-query correctness vs scipy: OK", file=sys.stderr, flush=True)

    key_pool = iter(jax.random.split(jax.random.PRNGKey(5), 4096))

    def timed(f, *args, Sa=16, Sb=96, reps=3):
        float(f(*args, next(key_pool), Sa))
        float(f(*args, next(key_pool), Sa))
        samples = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*args, next(key_pool), Sa))
            ta = time.time() - t0
            t0 = time.time()
            float(f(*args, next(key_pool), Sb))
            tb = time.time() - t0
            samples.append((tb - ta) / (Sb - Sa))
        return max(sorted(samples)[1], 1e-9)

    out = {"B": B, "interactions": n}

    # probe-only comparison
    @jax.jit
    def probe_btree(lv, it, key, S):
        def body(b, acc):
            kp, kn = jax.random.split(jax.random.fold_in(key, b))
            uu = jax.random.randint(kp, (B,), 0, N_USERS)
            jj = jax.random.randint(kn, (B,), 0, N_ITEMS)
            return acc + jnp.float32(jnp.sum(btree_query(lv, it, uu, jj)))
        return jax.lax.fori_loop(0, S, body, jnp.float32(0.0))

    @jax.jit
    def probe_bsearch(m, key, S):
        def body(b, acc):
            kp, kn = jax.random.split(jax.random.fold_in(key, b))
            uu = jax.random.randint(kp, (B,), 0, N_USERS)
            jj = jax.random.randint(kn, (B,), 0, N_ITEMS)
            return acc + jnp.float32(jnp.sum(m.query(uu, jj)))
        return jax.lax.fori_loop(0, S, body, jnp.float32(0.0))

    per = timed(probe_btree, leaves, internal)
    out["probe_btree_ms"] = round(per * 1e3, 3)
    print(f"[probe/btree] {per*1e3:.3f} ms/step", file=sys.stderr, flush=True)
    per = timed(probe_bsearch, mem)
    out["probe_bsearch_ms"] = round(per * 1e3, 3)
    print(f"[probe/bsearch] {per*1e3:.3f} ms/step", file=sys.stderr, flush=True)

    # the full optimized step
    @jax.jit
    def optstep(U, V, pairs, lv, it, key, S):
        def body(b, carry):
            U, V, acc = carry
            kp, kn = jax.random.split(jax.random.fold_in(key, b))
            pos_idx = jax.random.randint(kp, (B,), 0, n)
            jneg = jax.random.randint(kn, (B,), 0, N_ITEMS)
            pr = pairs[pos_idx]  # (B, 2) one row gather
            uu, ii = pr[:, 0], pr[:, 1]
            valid = ~btree_query(lv, it, uu, jneg) & (ii != jneg)
            wu, vi, vj = U[uu], V[ii], V[jneg]
            x = jnp.sum(wu * (vi - vj), axis=1)
            z = (valid.astype(U.dtype) / (1.0 + jnp.exp(x)))[:, None]
            mf = valid.astype(U.dtype)[:, None]
            dU = z * (vi - vj) - 0.01 * wu * mf
            dVi = z * wu - 0.01 * vi * mf
            dVj = -z * wu - 0.01 * vj * mf
            U = U.at[uu].add(0.01 * dU)
            V = V.at[jnp.concatenate([ii, jneg])].add(
                0.01 * jnp.concatenate([dVi, dVj])
            )
            return U, V, acc + jnp.sum(z)

        U, V, acc = jax.lax.fori_loop(0, S, body, (U, V, jnp.float32(0.0)))
        return acc + U[0, 0] + V[0, 0]

    per = timed(optstep, U0, V0, uic2, leaves, internal)
    out["optstep_ms"] = round(per * 1e3, 3)
    out["optstep_Msps"] = round(B / per / 1e6, 2)
    print(
        f"[optstep] {per*1e3:.3f} ms/step = {B/per/1e6:.2f} M samples/s",
        file=sys.stderr, flush=True,
    )
    print(json.dumps({"metric": "btree_probe", **out}), flush=True)


if __name__ == "__main__":
    main()
