"""BPR train + full ranking eval at ML-1M shape (6040 x 3706, ~1M pairs).

Prints one JSON line. Run from the repo root:
    python benchmarks/ml1m_bpr.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (headline-bench helpers: compile cache)


def make_ml1m_like(seed=7):
    rng = np.random.RandomState(seed)
    n_users, n_items, n_r = 6040, 3706, 1_000_000
    pop = (1.0 / np.arange(1, n_items + 1)) ** 1.1
    pop /= pop.sum()
    u = rng.randint(n_users, size=int(n_r * 1.3))
    i = rng.choice(n_items, size=int(n_r * 1.3), p=pop)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    pairs = pairs[rng.permutation(len(pairs))[:n_r]]
    af = rng.randn(n_users, 6) @ rng.randn(6, n_items)
    r = np.clip(
        np.round(3.5 + af[pairs[:, 0], pairs[:, 1]] * 0.5 + rng.randn(len(pairs)) * 0.8),
        1, 5,
    )
    return list(
        zip(
            (f"u{x}" for x in pairs[:, 0]),
            (f"i{x}" for x in pairs[:, 1]),
            r.astype(float),
        )
    )


def main():
    bench._enable_compile_cache()
    from cornac_tpu.eval_methods import RatioSplit
    from cornac_tpu.eval_methods.base_method import ranking_eval
    from cornac_tpu.metrics import AUC, NDCG, Recall
    from cornac_tpu.models import BPR

    data = make_ml1m_like()
    rs = RatioSplit(data=data, test_size=0.2, rating_threshold=4.0, seed=123)

    BPR(k=10, max_iter=1, seed=123, batch_size=8192).fit(rs.train_set)  # warm
    metrics = [AUC(), NDCG(k=10), Recall(k=20)]
    train_best = eval_best = 1e9
    for _ in range(3):
        model = BPR(k=10, max_iter=200, seed=123, batch_size=8192)
        t0 = time.time()
        model.fit(rs.train_set)
        train_best = min(train_best, time.time() - t0)
        t0 = time.time()
        avg, _ = ranking_eval(
            model, metrics, rs.train_set, rs.test_set,
            rating_threshold=4.0, exclude_unknowns=True,
        )
        eval_best = min(eval_best, time.time() - t0)

    print(
        json.dumps(
            {
                "metric": "bpr_ml1m_train200_plus_rankeval_wallclock",
                "value": round(train_best + eval_best, 3),
                "unit": "s",
                "detail": {
                    "train_s": round(train_best, 3),
                    "test_s": round(eval_best, 3),
                    **{
                        m.name: round(float(a), 4)
                        for m, a in zip(metrics, avg)
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
