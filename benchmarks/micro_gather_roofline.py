"""Measured random-gather roofline for embedding SGD at Netflix shape.

VERDICT r3 #1: the claim that the BPR minibatch epoch "saturates the HBM
random-access floor" was analytic, not measured (telemetry showed
2.5 GB/s of *useful* factor traffic = 0.3% of v5e HBM bandwidth — but
128-byte random gathers cannot approach the streaming peak, so the real
question is what the chip actually sustains at THIS access pattern).

This bench measures, inside fused fori_loops exactly like the trainer's
(one compiled program, no host round-trips), the steady-state throughput
of each component of the BPR step at Netflix shape (480k users x 17.7k
items x 100M interactions, k=32+bias):

- ``sample``     threefry triplet sampling only (the baseline to subtract)
- ``pair``       + 2 random int32 gathers from the 100M rid/cid arrays
                 (the packed-uic single-gather trick needs
                 users < 2^(31-item_bits) and is OFF at 480k users,
                 exactly as in the trainer: models/bpr.py:355)
- ``gatherU``    + 132B user-factor row gather from the 63 MB table
- ``gatherV``    + 2 item-factor row gathers from the 2.3 MB table
- ``probe``      + branchless binary search over the 400 MB CSR (13 rounds)
- ``scatter``    + sorted scatter-adds into U and V (serial carry, as SGD)
- ``full``       everything at once (the BPR step minus the VPU math)

and a ``pure_gather`` row: B random 132-byte rows from the user table per
step, reported in GB/s — the chip's measured random-row-gather roofline.

Each component rate is reported in M samples/s at several batch widths.
The trainer's measured 3.2 M samples/s (benchmarks/scale_netflix.py) is
then comparable against ``full`` (its roofline, same program shape) and
against the serial sum of component costs.

Usage: python benchmarks/micro_gather_roofline.py [n_interactions_millions]
Writes one JSON line per measurement to stdout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402

N_USERS, N_ITEMS = 480_000, 17_700
K = 33  # 32 factors + bias column, as the trainer runs it


def build_data(n_r, rng):
    import scipy.sparse as sp

    u = rng.randint(N_USERS, size=n_r).astype(np.int64)
    i = rng.randint(N_ITEMS, size=n_r).astype(np.int64)
    key = u * N_ITEMS + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first].astype(np.int32), i[first].astype(np.int32)
    csr = sp.csr_matrix(
        (np.ones(len(u), np.float32), (u, i)), shape=(N_USERS, N_ITEMS)
    )
    return u, i, csr


def main():
    bench._enable_compile_cache()
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    n_r = int(n_m * 1e6)

    import jax
    import jax.numpy as jnp

    from cornac_tpu.ops.accumulate import accumulate_rows
    from cornac_tpu.ops.membership import build_membership

    rng = np.random.RandomState(0)
    u, i, csr = build_data(n_r, rng)
    n = len(u)
    print(f"[data] {n} interactions", file=sys.stderr, flush=True)

    mem = build_membership(csr, bitmap_max_bytes=0)  # CSR binary search
    rid_d = jnp.asarray(u, jnp.int32)
    cid_d = jnp.asarray(i, jnp.int32)
    U0 = jnp.asarray(rng.randn(N_USERS, K).astype(np.float32))
    V0 = jnp.asarray(rng.randn(N_ITEMS, K).astype(np.float32))

    # ---------------------------------------------------------------- #
    # each mode is one fused fori_loop of S steps at batch width B; the
    # accumulator (or the carried tables, for scatter modes) forces every
    # gather to be live.  Sampling mirrors the trainer's per-minibatch
    # path: fold_in(step) -> threefry draws.
    # ---------------------------------------------------------------- #
    def make_loop(mode, B):
        # S rides as a traced scalar: ONE compile per (mode, B) serves the
        # calibration probe and the measurement run (fori_loop lowers to
        # while_loop, same as the trainer's epoch chunking)
        @jax.jit
        def run(U, V, rid_a, cid_a, mem_d, key, S):
            def body(b, carry):
                U, V, acc = carry
                kp, kn = jax.random.split(jax.random.fold_in(key, b))
                pos_idx = jax.random.randint(kp, (B,), 0, n)
                jneg = jax.random.randint(kn, (B,), 0, N_ITEMS)
                if mode == "sample":
                    return U, V, acc + jnp.float32(jnp.sum(pos_idx + jneg))
                uu = rid_a[pos_idx]
                ii = cid_a[pos_idx]
                if mode == "pair":
                    return U, V, acc + jnp.float32(jnp.sum(uu + ii + jneg))
                if mode == "probe":
                    m = mem_d.query(uu, jneg)
                    return U, V, acc + jnp.float32(jnp.sum(m))
                wu = U[uu]
                if mode == "gatherU":
                    return U, V, acc + jnp.sum(wu)
                vi, vj = V[ii], V[jneg]
                if mode == "gatherV":
                    return U, V, acc + jnp.sum(wu) + jnp.sum(vi - vj)
                if mode == "full":
                    m = mem_d.query(uu, jneg)
                    z = jnp.where(m, 0.0, 1.0)[:, None]
                x = jnp.sum(wu * (vi - vj), axis=1)[:, None]
                dU = (vi - vj) * x
                if mode == "full":
                    dU = dU * z
                U = accumulate_rows(U, uu, 0.001 * dU)
                ij = jnp.concatenate([ii, jneg])
                dV = jnp.concatenate([wu * x, -wu * x])
                if mode == "full":
                    dV = dV * jnp.concatenate([z, z])
                V = accumulate_rows(V, ij, 0.001 * dV)
                return U, V, acc

            U, V, acc = jax.lax.fori_loop(
                0, S, body, (U, V, jnp.float32(0.0))
            )
            return acc + U[0, 0] + V[0, 0]

        return run

    def measure(mode, B, reps=3):
        # two-point differential timing, (t(Sb) - t(Sa)) / (Sb - Sa),
        # cancels per-call dispatch/tunnel latency; median of ``reps``
        # guards against the tunnel's first-call-after-compile spikes
        Sa, Sb = 16, 96
        if B >= 1 << 20:
            Sa, Sb = 8, 40  # keep each call well under the ~60s exec kill
        f = make_loop(mode, B)
        args = (U0, V0, rid_d, cid_d, mem)
        # the key changes EVERY call: the tunnel memoizes executions with
        # identical (program, args) and returns the cached result in ~0.3
        # ms, which silently zeroes any timing that reuses arguments
        keys = iter(jax.random.split(jax.random.PRNGKey(7), 4 + 2 * reps))
        # float(...) forces the scalar to host — on this rig that is the
        # only reliable synchronization point (block_until_ready can
        # return before the tunneled execution finishes)
        float(f(*args, next(keys), Sa))  # compile
        float(f(*args, next(keys), Sa))  # warm dispatch path
        samples = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*args, next(keys), Sa))
            ta = time.time() - t0
            t0 = time.time()
            float(f(*args, next(keys), Sb))
            tb = time.time() - t0
            if os.environ.get("ROOFLINE_DEBUG"):
                print(
                    f"  [{mode} B={B}] ta={ta*1e3:.1f}ms tb={tb*1e3:.1f}ms",
                    file=sys.stderr, flush=True,
                )
            samples.append((tb - ta) / (Sb - Sa))
        per_step = max(sorted(samples)[len(samples) // 2], 1e-9)
        return per_step, B / per_step / 1e6

    out = {"interactions": n, "k": K}
    modes = ["sample", "pair", "probe", "gatherU", "gatherV", "scatter", "full"]
    for B in (65536, 262144, 1048576):
        row = {}
        for mode in modes:
            per_step, msps = measure(mode, B)
            row[mode] = {
                "ms_per_step": round(per_step * 1e3, 3),
                "Msamples_per_s": round(msps, 2),
            }
            print(
                f"[B={B}] {mode}: {per_step*1e3:.2f} ms/step, {msps:.2f} Ms/s",
                file=sys.stderr,
                flush=True,
            )
        # incremental cost of each component over its predecessor
        out[f"B{B}"] = row
        print(
            json.dumps({"metric": "gather_roofline", "batch": B, **row}),
            flush=True,
        )

    # pure random-row-gather roofline in GB/s: B rows x 132 B from the
    # 63 MB user table, fresh indices per step
    for B in (65536, 262144, 1048576):
        @jax.jit
        def pure(U, key, S):
            def body(b, acc):
                ids = jax.random.randint(
                    jax.random.fold_in(key, b), (B,), 0, N_USERS
                )
                return acc + jnp.sum(U[ids])

            return jax.lax.fori_loop(0, S, body, jnp.float32(0.0))

        Sa, Sb = (16, 96) if B < (1 << 20) else (8, 40)
        keys = iter(jax.random.split(jax.random.PRNGKey(1), 10))
        float(pure(U0, next(keys), Sa))  # compile
        float(pure(U0, next(keys), Sa))  # warm
        samples = []
        for _ in range(3):
            t0 = time.time()
            float(pure(U0, next(keys), Sa))
            ta = time.time() - t0
            t0 = time.time()
            float(pure(U0, next(keys), Sb))
            tb = time.time() - t0
            samples.append((tb - ta) / (Sb - Sa))
        per_step = max(sorted(samples)[1], 1e-9)
        gbs = B * K * 4 / per_step / 1e9
        print(
            json.dumps(
                {
                    "metric": "pure_row_gather",
                    "batch": B,
                    "ms_per_step": round(per_step * 1e3, 3),
                    "rows_per_s_M": round(B / per_step / 1e6, 1),
                    "useful_GBs": round(gbs, 1),
                }
            ),
            flush=True,
        )
        print(
            f"[pure B={B}] {per_step*1e3:.3f} ms/step = {gbs:.1f} GB/s",
            file=sys.stderr,
            flush=True,
        )


if __name__ == "__main__":
    main()
