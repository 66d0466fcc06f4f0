"""Hierarchical Poisson Factorization (CAVI entirely on device) vs. its
non-hierarchical variant (PF) on MovieLens 100K.

Capability parity with reference ``examples/hpf_movielens.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, NDCG
from cornac_tpu.models import HPF

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(
    data=ml_100k, test_size=0.2, rating_threshold=4.0,
    exclude_unknowns=True, verbose=True, seed=123,
)

hpf = HPF(k=5, max_iter=100, seed=123, name="HPF")
pf = HPF(k=5, max_iter=100, seed=123, hierarchical=False, name="PF")

ct.Experiment(eval_method=rs, models=[hpf, pf], metrics=[AUC(), NDCG(k=10)]).run()
