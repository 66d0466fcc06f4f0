"""BPR training throughput at 10M interactions (100k users x 10k items).

Exercises the large-table regime: scatter-add accumulation (the one-hot
matmul would pay rows x batch FLOPs) and CSR-binary-search membership
(the bitmap would exceed its HBM budget — and measures slower here due to
gather locality). Prints one JSON line.
"""

import json
import os
import sys
import time
from collections import OrderedDict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    bench._enable_compile_cache()
    from cornac_tpu.data import Dataset
    from cornac_tpu.models import BPR

    rng = np.random.RandomState(0)
    n_u, n_i, n_r = 100_000, 10_000, 10_000_000
    u = rng.randint(n_u, size=n_r)
    i = rng.randint(n_i, size=n_r)
    key = u.astype(np.int64) * n_i + i
    _, first = np.unique(key, return_index=True)
    u, i = u[first], i[first]

    ds = Dataset(
        num_users=n_u,
        num_items=n_i,
        uid_map=OrderedDict((x, x) for x in range(n_u)),
        iid_map=OrderedDict((x, x) for x in range(n_i)),
        uir_tuple=(u.astype(np.int64), i.astype(np.int64), np.ones(len(u))),
        seed=0,
    )

    BPR(k=32, max_iter=1, seed=123, batch_size=16384).fit(ds)  # warm
    t0 = time.time()
    BPR(k=32, max_iter=10, seed=123, batch_size=16384).fit(ds)
    elapsed = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "bpr_10m_interactions_train_throughput",
                "value": round(10 * len(u) / elapsed / 1e6, 2),
                "unit": "M samples/s",
                "detail": {
                    "interactions": int(len(u)),
                    "epochs": 10,
                    "k": 32,
                    "wallclock_s": round(elapsed, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
