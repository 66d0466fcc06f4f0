"""SoRec — social-regularized PMF using the FilmTrust trust network.

Capability parity with reference ``examples/sorec_filmtrust.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import GraphModality
from cornac_tpu.datasets import filmtrust
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import PMF, SoRec

ratings = filmtrust.load_feedback()
trust = filmtrust.load_trust()

user_graph = GraphModality(data=trust)

rs = RatioSplit(
    data=ratings, test_size=0.2, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
    user_graph=user_graph,
)

ct.Experiment(
    eval_method=rs,
    models=[
        PMF(k=5, max_iter=100, seed=123),
        SoRec(k=5, max_iter=100, weight_link=True, seed=123, verbose=True),
    ],
    metrics=[MAE(), RMSE()],
).run()
