"""CVAECF — conditional VAE for CF: user preferences conditioned on the
social trust network, on FilmTrust.

Capability parity with reference ``examples/cvaecf_filmtrust.py``
(GraphModality over the trust network as the auxiliary view).
"""

import cornac_tpu as ct
from cornac_tpu.data import GraphModality
from cornac_tpu.datasets import filmtrust
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import CVAECF

ratings = filmtrust.load_feedback()
trust = filmtrust.load_trust()

user_graph_modality = GraphModality(data=trust)

rs = RatioSplit(
    data=ratings, test_size=0.2, rating_threshold=3.0,
    exclude_unknowns=True, verbose=True, seed=123,
    user_graph=user_graph_modality,
)

cvaecf = CVAECF(
    z_dim=20, h_dim=20, autoencoder_structure=[40],
    learning_rate=0.001, n_epochs=70, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[cvaecf], metrics=[NDCG(k=50), Recall(k=50)]).run()
