"""Component ablation of the BPR step at Netflix shape (480k x 17.7k).

The 100M-interaction run measures ~27 ms per 65536-sample minibatch
(2.35M samples/s) — far above what the update math costs. This times each
component in isolation on the real chip, then whole epochs under the
strategy knobs (membership structure, batch size), to locate the floor.

Usage: python benchmarks/micro_netflix_step.py [n_interactions_millions]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402

N_USERS, N_ITEMS = 480_000, 17_700


def timeit(fn, reps=5):
    import jax

    fn()  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    bench._enable_compile_cache()
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    n_r = int(n_m * 1e6)

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from cornac_tpu.ops.accumulate import accumulate_rows
    from cornac_tpu.ops.membership import build_membership

    rng = np.random.RandomState(0)
    u = rng.randint(N_USERS, size=n_r).astype(np.int64)
    i = rng.randint(N_ITEMS, size=n_r).astype(np.int64)
    key = u * N_ITEMS + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first].astype(np.int32), i[first].astype(np.int32)
    csr = sp.csr_matrix(
        (np.ones(len(u), np.float32), (u, i)), shape=(N_USERS, N_ITEMS)
    )
    print(f"[data] {len(u)} interactions", file=sys.stderr, flush=True)

    results = {}
    B = 65536
    k = 33
    U = jnp.asarray(rng.randn(N_USERS, k).astype(np.float32))
    V = jnp.asarray(rng.randn(N_ITEMS, k).astype(np.float32))
    qu = jnp.asarray(rng.randint(0, N_USERS, B), jnp.int32)
    qi = jnp.asarray(rng.randint(0, N_ITEMS, B), jnp.int32)
    upd = jnp.asarray(rng.randn(B, k).astype(np.float32))
    updV = jnp.asarray(rng.randn(2 * B, k).astype(np.float32))
    qij = jnp.asarray(rng.randint(0, N_ITEMS, 2 * B), jnp.int32)

    mem_csr = build_membership(csr, bitmap_max_bytes=0)
    mem_bm = build_membership(csr)
    results["membership_kinds"] = (mem_csr.kind, mem_bm.kind)

    # membership rides as a jit ARGUMENT (pytree), exactly as in the
    # trainer — closing over it would bake the table into the program as a
    # constant, which the tunnel's remote-compile endpoint rejects (HTTP
    # 413) past a few hundred MB
    f_q = jax.jit(lambda m, a, b: m.query(a, b))
    results["query_csr_ms"] = timeit(lambda: f_q(mem_csr, qu, qi)) * 1e3
    results["query_bitmap_ms"] = timeit(lambda: f_q(mem_bm, qu, qi)) * 1e3

    g_u = jax.jit(lambda t, ids: t[ids])
    results["gather_U_ms"] = timeit(lambda: g_u(U, qu)) * 1e3
    acc_u = jax.jit(accumulate_rows)
    results["accum_U_scatter_ms"] = timeit(lambda: acc_u(U, qu, upd)) * 1e3
    results["accum_V_onehot_ms"] = timeit(lambda: acc_u(V, qij, updV)) * 1e3
    samp = jax.jit(
        lambda key: jax.random.randint(key, (B,), 0, N_ITEMS)
    )
    results["sample_randint_ms"] = timeit(
        lambda: samp(jax.random.PRNGKey(3))
    ) * 1e3

    # whole-epoch measurements through the real trainer
    from cornac_tpu.data import Dataset
    from collections import OrderedDict
    from cornac_tpu.models import BPR

    ds = Dataset(
        num_users=N_USERS, num_items=N_ITEMS,
        uid_map=OrderedDict((x, x) for x in range(N_USERS)),
        iid_map=OrderedDict((x, x) for x in range(N_ITEMS)),
        uir_tuple=(u.astype(np.int64), i.astype(np.int64),
                   np.ones(len(u), np.float64)),
        seed=0,
    )
    import cornac_tpu.ops.membership as mem_mod

    # differential timing: fit(2) vs fit(6) — (t6 - t2)/4 cancels the
    # per-fit host work (membership build, table transfers through the
    # tunnel: the 1.06 GiB bitmap alone costs ~10 s of one-time transfer)
    for label, bm_bytes, bsz in [
        ("epoch_csr_b64k", 0, 65536),
        ("epoch_bitmap_b64k", None, 65536),
        ("epoch_bitmap_b256k", None, 262144),
    ]:
        old = mem_mod._BITMAP_MAX_BYTES
        if bm_bytes is not None:
            mem_mod._BITMAP_MAX_BYTES = bm_bytes
        try:
            BPR(k=32, max_iter=2, seed=1, batch_size=bsz, verbose=True).fit(ds)
            t0 = time.time()
            BPR(k=32, max_iter=2, seed=1, batch_size=bsz, verbose=True).fit(ds)
            t2 = time.time() - t0
            t0 = time.time()
            BPR(k=32, max_iter=6, seed=1, batch_size=bsz, verbose=True).fit(ds)
            t6 = time.time() - t0
            dt = (t6 - t2) / 4
        finally:
            mem_mod._BITMAP_MAX_BYTES = old
        results[label + "_s"] = round(dt, 2)
        results[label + "_fit_overhead_s"] = round(t2 - 2 * dt, 2)
        results[label + "_Msps"] = round(len(u) / dt / 1e6, 2)
        print(f"[{label}] {dt:.2f}s/epoch (+{t2 - 2*dt:.1f}s/fit overhead)",
              file=sys.stderr, flush=True)

    print(json.dumps({k_: (round(v, 3) if isinstance(v, float) else v)
                      for k_, v in results.items()}))


if __name__ == "__main__":
    main()
