"""Sequential head-to-head: reference GRU4Rec/SASRec (torch, CPU) vs
cornac_tpu (JAX, TPU) through both frameworks' NextItemEvaluation on the
same seeded synthetic sessions. Writes JSONs to benchmarks/parity/.

Usage: python benchmarks/head_to_head_seq.py --models GRU4Rec,SASRec
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEED = 123


def gen_sessions(n_sessions=2000, n_items=500, n_users=300, seed=7):
    """Markov-chain sessions with block structure (signal for next-item)."""
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    n_blocks = 10
    per = n_items // n_blocks
    for s in range(n_sessions):
        u = rng.randint(n_users)
        block = rng.randint(n_blocks) * per
        x = rng.randint(per)
        for _ in range(rng.randint(4, 12)):
            rows.append((f"u{u}", str(s), f"i{block + x}", t))
            t += 1
            x = (x + 1) % per if rng.rand() < 0.8 else rng.randint(per)
    return rows


GRU_KW = dict(layers=[64], loss="cross-entropy", batch_size=64,
              learning_rate=0.05, n_epochs=5, n_sample=128, seed=SEED,
              verbose=False)
SAS_KW = dict(embedding_dim=64, loss="ce", batch_size=64, learning_rate=0.001,
              n_epochs=5, max_len=20, num_blocks=2, num_heads=1,
              n_sample=128, seed=SEED, verbose=False)


def _enable_compile_cache():
    import jax

    try:
        os.makedirs("/tmp/jaxcache_bench", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass


def run_side(side, name, train, test):
    if side == "ref":
        from ref_loader import load_ref_next_item

        root = load_ref_next_item()
        M, EM, metrics_ns = root.models, root.eval_methods, root.metrics
    else:
        import cornac_tpu as ct

        M, EM, metrics_ns = ct.models, ct.eval_methods, ct.metrics

    ev = EM.NextItemEvaluation.from_splits(
        train_data=train, test_data=test, fmt="USIT",
        exclude_unknowns=True, seed=SEED, mode="next", verbose=False,
    )
    model = getattr(M, name)(**(GRU_KW if name == "GRU4Rec" else SAS_KW))
    metrics = [metrics_ns.NDCG(k=10), metrics_ns.Recall(k=10)]
    t0 = time.perf_counter()
    res = ev.evaluate(model, metrics, user_based=False)[0]
    wall = time.perf_counter() - t0
    out = {k: float(v) for k, v in res.metric_avg_results.items()}
    out["wall_s"] = wall
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="GRU4Rec,SASRec")
    ap.add_argument("--sides", default="ref,ours")
    ap.add_argument("--outdir", default=os.path.join(os.path.dirname(__file__), "parity"))
    args = ap.parse_args()

    _enable_compile_cache()
    os.makedirs(args.outdir, exist_ok=True)
    data = gen_sessions()
    sids = sorted({int(t[1]) for t in data})
    cut = sids[int(len(sids) * 0.85)]
    train = [t for t in data if int(t[1]) <= cut]
    test = [t for t in data if int(t[1]) > cut]
    print(f"[data] {len(train)} train rows, {len(test)} test rows", flush=True)

    for name in args.models.split(","):
        path = os.path.join(args.outdir, f"seq_{name}.json")
        rec = {"model": name, "scale": "synthetic-sessions"}
        if os.path.exists(path):
            with open(path) as f:
                rec.update(json.load(f))
        for side in args.sides.split(","):
            print(f"[{name}] {side} ...", flush=True)
            try:
                rec[side] = run_side(side, name, train, test)
                print(f"[{name}] {side}: {rec[side]}", flush=True)
            except Exception as e:
                import traceback

                traceback.print_exc()
                rec[side] = {"error": repr(e)}
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[{name}] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
