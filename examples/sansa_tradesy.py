"""SANSA on the (larger, implicit) Tradesy dataset.

Capability parity with reference ``examples/sansa_tradesy.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import tradesy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, Recall
from cornac_tpu.models import SANSA

feedback = tradesy.load_feedback()
rs = RatioSplit(
    data=feedback, test_size=0.1, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
)

ct.Experiment(
    eval_method=rs,
    models=[SANSA(l2=200.0, weight_matrix_density=0.005, verbose=True)],
    metrics=[AUC(), Recall(k=50)],
).run()
