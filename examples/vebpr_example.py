"""VEBPR — BPR with an auxiliary view tier (purchase > view > unobserved),
trained on a PurchaseViewDataset.

Capability parity with reference ``examples/vebpr_example.py``.
"""

import numpy as np

from cornac_tpu.data import PurchaseViewDataset
from cornac_tpu.models import VEBPR

# Synthetic purchases plus view events (views carry weaker preference).
rng = np.random.RandomState(123)
purchases = [(f"u{rng.randint(100)}", f"i{rng.randint(60)}", 1.0) for _ in range(2000)]
views = [(f"u{rng.randint(100)}", f"i{rng.randint(60)}", 1.0) for _ in range(4000)]

dataset = PurchaseViewDataset.build(purchases, views, seed=123)

vebpr = VEBPR(k=10, max_iter=100, learning_rate=0.01, alpha=0.5, seed=123, verbose=True)
vebpr.fit(dataset)

print("Top-5 for user u7:", vebpr.recommend("u7", k=5, remove_seen=True, train_set=dataset))
