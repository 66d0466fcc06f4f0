"""Warm train-time sweep across model families at ML-100K shape.

Prints one JSON line per model. Configs mirror PERF.md's sweep table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    bench._enable_compile_cache()
    from cornac_tpu.eval_methods import RatioSplit
    import cornac_tpu.models as M

    data = bench.make_ml100k_like()
    rs = RatioSplit(
        data=data, test_size=0.2, rating_threshold=4.0, seed=123, verbose=False
    )

    configs = [
        ("MF", lambda: M.MF(k=10, max_iter=20, seed=123)),
        ("BPR", lambda: M.BPR(k=10, max_iter=200, seed=123, batch_size=4096)),
        ("PMF", lambda: M.PMF(k=10, max_iter=100, seed=123)),
        ("NMF", lambda: M.NMF(k=15, max_iter=50, seed=123)),
        ("HPF", lambda: M.HPF(k=5, max_iter=100, seed=123)),
        ("WMF", lambda: M.WMF(k=50, max_iter=30, seed=123, verbose=False)),
        ("VAECF", lambda: M.VAECF(k=10, n_epochs=100, seed=123)),
        ("RecVAE", lambda: M.RecVAE(n_epochs=20, seed=123, verbose=False)),
        ("BiVAECF", lambda: M.BiVAECF(k=10, n_epochs=100, seed=123)),
        ("NeuMF", lambda: M.NeuMF(num_factors=8, layers=(32, 16, 8),
                                  num_epochs=10, seed=123, verbose=False)),
        ("LightGCN", lambda: M.LightGCN(emb_size=64, num_layers=3,
                                        num_epochs=40, seed=2020)),
        ("EASE", lambda: M.EASE(lamb=500, verbose=False)),
        ("IBPR", lambda: M.IBPR(k=10, max_iter=20, seed=123)),
        ("SKMeans", lambda: M.SKMeans(k=5, max_iter=100, seed=123, verbose=False)),
        ("UserKNN", lambda: M.UserKNN(k=50, verbose=False)),
        ("FM", lambda: M.FM(k2=8, max_iter=50, method="als", seed=123, verbose=False)),
    ]
    for name, make in configs:
        make().fit(rs.train_set)  # warm compile
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            make().fit(rs.train_set)
            best = min(best, time.time() - t0)
        print(
            json.dumps(
                {"metric": f"train_wallclock_{name}", "value": round(best, 3),
                 "unit": "s"}
            )
        )


if __name__ == "__main__":
    main()
