"""TPU-pod scaling: train BPR with the embedding tables row-sharded over
the `model` mesh axis and the batch sharded over `data`, then run the
sharded full-catalog top-k evaluation path.

This is framework-native capability with no reference equivalent (the
reference is single-process OpenMP). Runs on any device count — including
a CPU-simulated mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip_sharding.py
"""

import jax
import numpy as np

from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.models import BPR
from cornac_tpu.parallel import make_mesh, shard_rows
from cornac_tpu.parallel.sharded import pad_rows_for_mesh, sharded_topk

print(f"{jax.device_count()} devices: {jax.devices()}")
# All devices on the model axis: the item table is row-sharded across chips.
mesh = make_mesh(data_parallel=1)
print("mesh:", mesh)

rng = np.random.RandomState(0)
data = [
    (f"u{rng.randint(500)}", f"i{rng.randint(2000)}", float(rng.randint(1, 6)))
    for _ in range(20000)
]
rs = RatioSplit(data=data, test_size=0.2, rating_threshold=3.0, seed=123)

# mesh-aware training: factor tables row-sharded under GSPMD
bpr = BPR(k=32, max_iter=50, seed=123, verbose=True, mesh=mesh)
bpr.fit(rs.train_set)

# Row-shard the item factor table over the model axis and rank on-device.
# Rows added by padding (when the catalog doesn't divide the shard count)
# get a -1e30 bias so they can never reach the top-k.
padded, n_items = pad_rows_for_mesh(np.asarray(bpr.i_factors), mesh)
bias = np.where(np.arange(padded.shape[0]) < n_items, 0.0, -1e30).astype(padded.dtype)
item_table = shard_rows(mesh, padded)
user_vecs = np.asarray(bpr.u_factors[:8])
scores, topk = sharded_topk(mesh, user_vecs, item_table, k=10, item_bias=shard_rows(mesh, bias))
print("sharded top-10 items for first 8 users:\n", np.asarray(topk))
