"""Variant hunt for the three dominant BPR-step costs found by
micro_gather_roofline.py: scatter-add (half the step), membership probe,
and positive-pair gathers.  Each variant measured as (t(Sb)-t(Sa))/(Sb-Sa)
inside a fused loop, fresh threefry key per call (the tunnel memoizes
identical executions, and only float() reliably synchronizes).

Variants:
- scatterU:   sorted vs plain vs no-op      (480k x 33 table, B updates)
- scatterV:   sorted vs plain vs one-hot    (17.7k x 33 table, 2B updates)
- pair:       two 1-D gathers vs one (n,2) row gather
- rowbytes:   pure row gather at k=8/16/33/64/128 f32 and k=33 bf16
              (is the gather issue-rate or byte-rate bound?)

Usage: python benchmarks/micro_gather_variants.py [n_millions] [B]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from benchmarks.micro_gather_roofline import build_data, N_USERS, N_ITEMS  # noqa: E402

K = 33


def main():
    bench._enable_compile_cache()
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    u, i, csr = build_data(int(n_m * 1e6), rng)
    n = len(u)
    rid_d = jnp.asarray(u, jnp.int32)
    cid_d = jnp.asarray(i, jnp.int32)
    uic2 = jnp.asarray(np.stack([u, i], axis=1), jnp.int32)  # (n, 2)
    U0 = jnp.asarray(rng.randn(N_USERS, K).astype(np.float32))
    V0 = jnp.asarray(rng.randn(N_ITEMS, K).astype(np.float32))

    key_pool = iter(jax.random.split(jax.random.PRNGKey(99), 4096))

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

    # ----------------------- scatter variants ------------------------ #
    def scatter_loop(table_rows, n_ids, strategy):
        @jax.jit
        def run(T, key, S):
            def body(b, T):
                k1, k2 = jax.random.split(jax.random.fold_in(key, b))
                ids = jax.random.randint(k1, (n_ids,), 0, table_rows)
                upd = (
                    jax.random.uniform(k2, (n_ids, 1)) * jnp.ones((1, K))
                ) * 1e-6
                if strategy == "noop":
                    return T + jnp.sum(upd) * 0.0
                if strategy == "plain":
                    return T.at[ids].add(upd)
                if strategy == "sorted":
                    order = jnp.argsort(ids)
                    return T.at[ids[order]].add(
                        upd[order], indices_are_sorted=True
                    )
                if strategy == "onehot":
                    oh = jax.nn.one_hot(ids, table_rows, dtype=T.dtype)
                    return T + jnp.tensordot(oh, upd, axes=((0,), (0,)))

            T = jax.lax.fori_loop(0, S, body, T)
            return T[0, 0]

        return run

    for label, rows, n_ids, strats in (
        ("scatterU", N_USERS, B, ("noop", "plain", "sorted")),
        ("scatterV", N_ITEMS, 2 * B, ("noop", "plain", "sorted", "onehot")),
    ):
        T0 = U0 if rows == N_USERS else V0
        for s in strats:
            per = timed(scatter_loop(rows, n_ids, s), T0)
            out[f"{label}_{s}_ms"] = round(per * 1e3, 3)
            print(f"[{label}/{s}] {per*1e3:.3f} ms/step", file=sys.stderr, flush=True)

    # ------------------------ pair variants -------------------------- #
    def pair_loop(kind):
        @jax.jit
        def run(a1, a2, key, S):
            def body(b, acc):
                idx = jax.random.randint(
                    jax.random.fold_in(key, b), (B,), 0, n
                )
                if kind == "two1d":
                    return acc + jnp.float32(jnp.sum(a1[idx] + a2[idx]))
                row = a1[idx]  # (B, 2) single row gather
                return acc + jnp.float32(jnp.sum(row))

            return jax.lax.fori_loop(0, S, body, jnp.float32(0.0))

        return run

    per = timed(pair_loop("two1d"), rid_d, cid_d)
    out["pair_two1d_ms"] = round(per * 1e3, 3)
    print(f"[pair/two1d] {per*1e3:.3f} ms/step", file=sys.stderr, flush=True)
    per = timed(pair_loop("row2"), uic2, cid_d)
    out["pair_row2_ms"] = round(per * 1e3, 3)
    print(f"[pair/row2] {per*1e3:.3f} ms/step", file=sys.stderr, flush=True)

    # ------------------- row width / dtype sweep --------------------- #
    def gather_loop(T):
        @jax.jit
        def run(Tb, key, S):
            def body(b, acc):
                ids = jax.random.randint(
                    jax.random.fold_in(key, b), (B,), 0, N_USERS
                )
                return acc + jnp.sum(Tb[ids].astype(jnp.float32))

            return jax.lax.fori_loop(0, S, body, jnp.float32(0.0))

        return run

    for k_w, dt in ((8, "f32"), (16, "f32"), (33, "f32"), (64, "f32"),
                    (128, "f32"), (33, "bf16")):
        dtype = jnp.float32 if dt == "f32" else jnp.bfloat16
        T = jnp.asarray(
            rng.randn(N_USERS, k_w).astype(np.float32)
        ).astype(dtype)
        per = timed(gather_loop(T), T)
        out[f"gather_k{k_w}_{dt}_ms"] = round(per * 1e3, 3)
        print(
            f"[gather k={k_w} {dt}] {per*1e3:.3f} ms/step = "
            f"{B/per/1e6:.1f} Mrows/s",
            file=sys.stderr, flush=True,
        )

    print(json.dumps({"metric": "gather_variants", **out}), flush=True)


if __name__ == "__main__":
    main()
