"""Ablate the real BPR epoch program on TPU: replicate _bpr_epochs at bench.py
shapes and knock out one stage at a time to find where the ~3ms/epoch goes.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(make_args, fn, n=4):
    """Fresh argument buffers per call (the jitted fn donates its tables).

    block_until_ready is unreliable through the axon tunnel (can return
    before execution completes), so completion is forced by a host
    transfer; the ~30ms tunnel RTT is constant across variants."""
    np.asarray(fn(*make_args())[0])  # warmup/compile
    ts = []
    for _ in range(n):
        args = make_args()
        np.asarray(args[0])
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_epochs_fn_matmul(n, n_users, n_items):
    """Gather-free epoch: U-row fetch + membership bitmap fetch fused into ONE
    one-hot matmul per step (bitmap 16-bit halfwords ride as exact-f32 extra
    columns of the user table — k=11 pads to 128 lanes on the MXU, so the
    membership columns are free); V rows fetched by one-hot matmul too."""
    n_words = (n_items + 15) // 16

    @partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0, 1))
    def run(U, V, key, rid, cid, W16, batch_size, n_epochs):
        n_pad = (-n) % batch_size
        n_total = n + n_pad
        n_batches = n_total // batch_size
        pad_mask = jnp.arange(n_total) < n
        k = U.shape[1]
        UT = jnp.concatenate([U, W16], axis=1)  # (n_users, k + n_words)

        def epoch(e, carry):
            UT, V = carry
            k_pos, k_neg = jax.random.split(jax.random.fold_in(key, e))
            pos_idx = jax.random.randint(k_pos, (n_total,), 0, n)
            neg_items = jax.random.randint(k_neg, (n_total,), 0, n_items)
            users = rid[pos_idx]
            pos_items = cid[pos_idx]

            def body(b, carry):
                UT, V = carry
                sl = lambda a: jax.lax.dynamic_slice(a, (b * batch_size,), (batch_size,))
                u, i, j = sl(users), sl(pos_items), sl(neg_items)
                pm = sl(pad_mask)

                ohu = jax.nn.one_hot(u, n_users, dtype=UT.dtype)
                row = ohu @ UT                       # (B, k + n_words) one MXU op
                wu, hw = row[:, :k], row[:, k:]
                # membership: halfword j>>4, bit j&15 (f32-exact for 16-bit vals)
                sel = jax.nn.one_hot(j >> 4, n_words, dtype=UT.dtype)
                word = jnp.sum(hw * sel, axis=1)
                bit = jnp.floor(word * jnp.exp2(-(j & 15).astype(UT.dtype)))
                observed = (bit % 2.0) >= 1.0
                m = ~observed & (i != j) & pm
                mf = m.astype(UT.dtype)

                ohi = jax.nn.one_hot(i, n_items, dtype=V.dtype)
                ohj = jax.nn.one_hot(j, n_items, dtype=V.dtype)
                vi = ohi @ V
                vj = ohj @ V

                x_uij = jnp.sum(wu * (vi - vj), axis=1)
                z = mf / (1.0 + jnp.exp(x_uij))
                dU = z[:, None] * (vi - vj) - 0.01 * wu * mf[:, None]
                dVi = z[:, None] * wu - 0.01 * vi * mf[:, None]
                dVj = -z[:, None] * wu - 0.01 * vj * mf[:, None]
                # pad dU with zero columns so the U update leaves W16 intact
                dUT = jnp.pad(dU, ((0, 0), (0, n_words)))
                UT = UT + 0.001 * jnp.tensordot(ohu, dUT, axes=((0,), (0,)))
                ohij = jnp.concatenate([ohi, ohj])
                V = V + 0.001 * jnp.tensordot(
                    ohij, jnp.concatenate([dVi, dVj]), axes=((0,), (0,)))
                return UT, V

            return jax.lax.fori_loop(0, n_batches, body, (UT, V))

        UT, V = jax.lax.fori_loop(0, n_epochs, epoch, (UT, V))
        return UT[:, :k], V

    return run


def make_epochs_fn_hybrid(n, n_users, n_items, pack_pos=True, u_matmul=True,
                          merge_v=False):
    """Hybrid epoch: (u,i) positives packed into ONE int32 gather + decode;
    U-row fetch + membership fused into one OH matmul; V rows native."""
    n_words = (n_items + 15) // 16
    shift = 11  # 1682 < 2048

    @partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0, 1))
    def run(U, V, key, uic, rid, cid, W16, bitmap, batch_size, n_epochs):
        n_pad = (-n) % batch_size
        n_total = n + n_pad
        n_batches = n_total // batch_size
        pad_mask = jnp.arange(n_total) < n
        k = U.shape[1]
        if u_matmul:
            UT = jnp.concatenate([U, W16], axis=1)
        else:
            UT = U

        def epoch(e, carry):
            UT, V = carry
            k_pos, k_neg = jax.random.split(jax.random.fold_in(key, e))
            pos_idx = jax.random.randint(k_pos, (n_total,), 0, n)
            neg_items = jax.random.randint(k_neg, (n_total,), 0, n_items)
            if pack_pos:
                code = uic[pos_idx]
                users = code >> shift
                pos_items = code & ((1 << shift) - 1)
            else:
                users = rid[pos_idx]
                pos_items = cid[pos_idx]

            def body(b, carry):
                UT, V = carry
                sl = lambda a: jax.lax.dynamic_slice(a, (b * batch_size,), (batch_size,))
                u, i, j = sl(users), sl(pos_items), sl(neg_items)
                pm = sl(pad_mask)

                ohu = jax.nn.one_hot(u, n_users, dtype=UT.dtype)
                if u_matmul:
                    row = ohu @ UT
                    wu, hw = row[:, :k], row[:, k:]
                    sel = jax.nn.one_hot(j >> 4, n_words, dtype=UT.dtype)
                    word = jnp.sum(hw * sel, axis=1)
                    bit = jnp.floor(word * jnp.exp2(-(j & 15).astype(UT.dtype)))
                    observed = (bit % 2.0) >= 1.0
                else:
                    wu = UT[u]
                    kk = u * jnp.int32(n_items) + j
                    word = bitmap[jax.lax.shift_right_logical(kk, 5)]
                    bitu = jax.lax.shift_right_logical(
                        word, (kk & 31).astype(jnp.uint32)) & jnp.uint32(1)
                    observed = bitu != 0
                m = ~observed & (i != j) & pm
                mf = m.astype(UT.dtype)

                if merge_v:
                    vij = V[jnp.concatenate([i, j])]
                    vi, vj = vij[:batch_size], vij[batch_size:]
                else:
                    vi, vj = V[i], V[j]

                x_uij = jnp.sum(wu * (vi - vj), axis=1)
                z = mf / (1.0 + jnp.exp(x_uij))
                dU = z[:, None] * (vi - vj) - 0.01 * wu * mf[:, None]
                dVi = z[:, None] * wu - 0.01 * vi * mf[:, None]
                dVj = -z[:, None] * wu - 0.01 * vj * mf[:, None]
                if u_matmul:
                    dUT = jnp.pad(dU, ((0, 0), (0, n_words)))
                else:
                    dUT = dU
                UT = UT + 0.001 * jnp.tensordot(ohu, dUT, axes=((0,), (0,)))
                ohij = jax.nn.one_hot(
                    jnp.concatenate([i, j]), n_items, dtype=V.dtype)
                V = V + 0.001 * jnp.tensordot(
                    ohij, jnp.concatenate([dVi, dVj]), axes=((0,), (0,)))
                return UT, V

            return jax.lax.fori_loop(0, n_batches, body, (UT, V))

        UT, V = jax.lax.fori_loop(0, n_epochs, epoch, (UT, V))
        return UT[:, :k], V

    return run


def make_epochs_fn(n, n_users, n_items, ablate=()):
    @partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0, 1))
    def run(U, V, key, rid, cid, bitmap, batch_size, n_epochs):
        n_pad = (-n) % batch_size
        n_total = n + n_pad
        n_batches = n_total // batch_size
        pad_mask = jnp.arange(n_total) < n

        def epoch(e, carry):
            U, V = carry
            k_pos, k_neg = jax.random.split(jax.random.fold_in(key, e))
            if "sampling" in ablate:
                pos_idx = jnp.arange(n_total) % n
                neg_items = (jnp.arange(n_total) * 7 + e) % n_items
            else:
                pos_idx = jax.random.randint(k_pos, (n_total,), 0, n)
                neg_items = jax.random.randint(k_neg, (n_total,), 0, n_items)
            users = rid[pos_idx]
            pos_items = cid[pos_idx]
            if "membership" in ablate:
                valid = (pos_items != neg_items) & pad_mask
            else:
                kk = users * jnp.int32(n_items) + neg_items
                word = bitmap[jax.lax.shift_right_logical(kk, 5)]
                bit = jax.lax.shift_right_logical(
                    word, (kk & 31).astype(jnp.uint32)) & jnp.uint32(1)
                valid = (bit == 0) & (pos_items != neg_items) & pad_mask

            def body(b, carry):
                U, V = carry
                sl = lambda a: jax.lax.dynamic_slice(a, (b * batch_size,), (batch_size,))
                u, i, j, m = sl(users), sl(pos_items), sl(neg_items), sl(valid)
                mf = m.astype(U.dtype)
                wu, vi, vj = U[u], V[i], V[j]
                x_uij = jnp.sum(wu * (vi - vj), axis=1)
                z = mf / (1.0 + jnp.exp(x_uij))
                dU = z[:, None] * (vi - vj) - 0.01 * wu * mf[:, None]
                dVi = z[:, None] * wu - 0.01 * vi * mf[:, None]
                dVj = -z[:, None] * wu - 0.01 * vj * mf[:, None]
                if "update" in ablate:
                    U = U + 1e-9 * jnp.sum(dU)
                    V = V + 1e-9 * (jnp.sum(dVi) + jnp.sum(dVj))
                else:
                    ohU = jax.nn.one_hot(u, U.shape[0], dtype=U.dtype)
                    ohV = jax.nn.one_hot(jnp.concatenate([i, j]), V.shape[0], dtype=V.dtype)
                    U = U + 0.001 * jnp.tensordot(ohU, dU, axes=((0,), (0,)))
                    V = V + 0.001 * jnp.tensordot(
                        ohV, jnp.concatenate([dVi, dVj]), axes=((0,), (0,)))
                return U, V

            if "steps" in ablate:
                return U, V
            return jax.lax.fori_loop(0, n_batches, body, (U, V))

        return jax.lax.fori_loop(0, n_epochs, epoch, (U, V))

    return run


def main():
    n_users, n_items, k, n = 943, 1682, 11, 80_000
    rng = np.random.RandomState(0)
    rid = jnp.asarray(rng.randint(0, n_users, n), jnp.int32)
    cid = jnp.asarray(rng.randint(0, n_items, n), jnp.int32)
    n_cells = n_users * n_items
    bitmap = jnp.asarray(rng.randint(0, 2**31, (n_cells + 31) // 32), jnp.uint32)
    key = jax.random.PRNGKey(0)
    E = 200
    import os
    os.makedirs("/tmp/jaxcache_bench", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    for name, ablate, bs in [
        ("full_b4096", (), 4096),
        ("no_membership", ("membership",), 4096),
        ("no_sampling", ("sampling",), 4096),
        ("no_update", ("update",), 4096),
        ("epoch_overhead_only", ("steps",), 4096),
        ("full_b8192", (), 8192),
        ("full_b16384", (), 16384),
        ("full_b2048", (), 2048),
    ]:
        fn = make_epochs_fn(n, n_users, n_items, ablate)

        def make_args(bs=bs):
            return (jax.random.normal(key, (n_users, k), jnp.float32),
                    jax.random.normal(key, (n_items, k), jnp.float32),
                    key, rid, cid, bitmap, bs, E)

        t = timeit(make_args, fn)
        print(f"{name:22s} {t / E * 1e3:8.3f} ms/epoch   ({t:.3f}s / {E} epochs)",
              flush=True)

    # matmul-gather variant: bitmap as 16-bit halfwords in f32 columns
    n_words = (n_items + 15) // 16
    rng2 = np.random.RandomState(1)
    obs_u = rng2.randint(0, n_users, 60000)
    obs_i = rng2.randint(0, n_items, 60000)
    words = np.zeros((n_users, n_words), np.int32)
    np.bitwise_or.at(words, (obs_u, obs_i >> 4), np.int32(1) << (obs_i & 15))
    W16 = jnp.asarray(words.astype(np.float32))
    for bs in (4096, 8192, 16384):
        fn = make_epochs_fn_matmul(n, n_users, n_items)

        def make_args(bs=bs):
            return (jax.random.normal(key, (n_users, k), jnp.float32),
                    jax.random.normal(key, (n_items, k), jnp.float32),
                    key, rid, cid, W16, bs, E)

        t = timeit(make_args, fn)
        print(f"matmul_gather_b{bs:<6d} {t / E * 1e3:8.3f} ms/epoch   ({t:.3f}s / {E} epochs)",
              flush=True)

    uic = jnp.asarray(
        (np.asarray(rid) << 11) | np.asarray(cid), jnp.int32
    )
    for name, kw in [
        ("hybrid_pack_only", dict(pack_pos=True, u_matmul=False)),
        ("hybrid_pack_umm", dict(pack_pos=True, u_matmul=True)),
        ("hybrid_pack_umm_mv", dict(pack_pos=True, u_matmul=True, merge_v=True)),
    ]:
        fn = make_epochs_fn_hybrid(n, n_users, n_items, **kw)

        def make_args():
            return (jax.random.normal(key, (n_users, k), jnp.float32),
                    jax.random.normal(key, (n_items, k), jnp.float32),
                    key, uic, rid, cid, W16, bitmap, 4096, E)

        t = timeit(make_args, fn)
        print(f"{name:22s} {t / E * 1e3:8.3f} ms/epoch   ({t:.3f}s / {E} epochs)",
              flush=True)


if __name__ == "__main__":
    main()
