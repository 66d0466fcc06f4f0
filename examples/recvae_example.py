"""RecVAE (composite prior, alternating encoder/decoder epochs) on ML-1M.

Capability parity with reference ``examples/recvae_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import RecVAE

ml_1m = movielens.load_feedback(variant="1M")
rs = RatioSplit(
    data=ml_1m, test_size=0.2, rating_threshold=4.0,
    exclude_unknowns=True, verbose=True, seed=123,
)

recvae = RecVAE(
    hidden_dim=600, latent_dim=200, batch_size=500, gamma=0.005,
    lr=5e-4, n_epochs=50, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[recvae], metrics=[NDCG(k=100), Recall(k=20)]).run()
