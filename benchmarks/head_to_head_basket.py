"""Head-to-head: the reference's TF Beacon vs cornac_tpu's, through each
framework's own NextBasketEvaluation on identical seeded basket data.

Completes the TF-backend race set (PARITY_RUNS.md): Beacon is the one
TF model whose protocol (session-basket) the rating harness can't host.
Reference implementation raced unmodified:
`/root/reference/cornac/models/beacon/recom_beacon.py` (tf.compat.v1
graph sessions) via ref_loader.load_ref_next_basket.

Usage: python benchmarks/head_to_head_basket.py [--sides ref,ours]
Writes benchmarks/parity/tf_basket_Beacon.json.
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


def gen_baskets(n_users=300, n_items=120, seed=7):
    """Markov-flavored baskets: each user draws a preferred block of the
    catalog and samples baskets from it (so next-basket prediction has
    signal)."""
    rng = np.random.RandomState(seed)
    rows = []
    bid = 0
    for u in range(n_users):
        block = rng.randint(0, 4)
        lo, hi = block * (n_items // 4), (block + 1) * (n_items // 4)
        for _ in range(rng.randint(3, 7)):
            bid += 1
            size = rng.randint(2, 5)
            items = rng.choice(np.arange(lo, hi), size=size, replace=False)
            rows.extend((f"u{u}", f"b{bid}", f"i{it}") for it in items)
    return rows


def beacon_kw():
    return dict(
        emb_dim=4, rnn_unit=8, alpha=0.5, rnn_cell_type="LSTM",
        dropout_rate=0.5, nb_hop=1, n_epochs=5, batch_size=32, lr=0.001,
        seed=SEED, verbose=False,
    )


def run_side(side, data, warm=False):
    if side == "ref":
        # the reference's beacon uses tf.compat.v1.layers, which Keras 3
        # removed — route TF through the legacy tf_keras shim (installed)
        os.environ["TF_USE_LEGACY_KERAS"] = "1"
        # and it calls .toarray() on the np.matrix that scipy's sparse
        # .sum(1) returns — gone in this numpy; shim it
        if not hasattr(np.matrix, "toarray"):
            np.matrix.toarray = lambda self: np.asarray(self)
        from ref_loader import load_ref_next_basket

        root = load_ref_next_basket()
        M, EM, metrics_ns = root.models, root.eval_methods, root.metrics
    else:
        from benchmarks.head_to_head import _enable_compile_cache

        _enable_compile_cache()
        import cornac_tpu as ct

        M, EM, metrics_ns = ct.models, ct.eval_methods, ct.metrics

    # val_size > 0: the reference's Beacon dereferences val_set
    # unconditionally (recom_beacon.py:293)
    split = EM.NextBasketEvaluation(
        data=data, test_size=0.2, val_size=0.1, fmt="UBI", seed=SEED,
        verbose=False,
    )
    metrics = [metrics_ns.Recall(k=10), metrics_ns.NDCG(k=10)]

    walls = []
    for _ in range(2 if warm else 1):
        model = M.Beacon(**beacon_kw())
        t0 = time.perf_counter()
        res, _ = split.evaluate(
            model=model, metrics=metrics, user_based=False,
            show_validation=False,
        )
        walls.append(time.perf_counter() - t0)
    out = {k: float(v) for k, v in res.metric_avg_results.items()}
    out["wall_s"] = walls[-1]
    if warm:
        out["wall_cold_s"] = walls[0]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sides", default="ref,ours")
    ap.add_argument(
        "--outdir", default=os.path.join(os.path.dirname(__file__), "parity")
    )
    args = ap.parse_args()
    data = gen_baskets()
    print(f"[data] {len(data)} basket events", file=sys.stderr, flush=True)
    results = {}
    for side in args.sides.split(","):
        print(f"[Beacon] {side} ...", file=sys.stderr, flush=True)
        try:
            results[side] = run_side(side, data, warm=(side == "ours"))
        except Exception as e:
            results[side] = {"error": f"{type(e).__name__}: {e}"}
        print(f"[Beacon] {side}: {results[side]}", file=sys.stderr, flush=True)
    path = os.path.join(args.outdir, "tf_basket_Beacon.json")
    with open(path, "w") as f:
        json.dump({"model": "Beacon", **results}, f, indent=1)
    print(f"[Beacon] wrote {path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
