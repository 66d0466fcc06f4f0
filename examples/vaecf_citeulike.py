"""VAECF (multinomial likelihood, whole-fit-in-one-jit) on CiteULike.

Capability parity with reference ``examples/vaecf_citeulike.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import citeulike
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import VAECF

data = citeulike.load_feedback()
rs = RatioSplit(
    data=data, test_size=0.2, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
)

vaecf = VAECF(
    k=10, autoencoder_structure=[20], act_fn="tanh", likelihood="mult",
    n_epochs=100, batch_size=100, learning_rate=0.001, beta=1.0,
    seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[vaecf], metrics=[NDCG(k=100), Recall(k=300)]).run()
