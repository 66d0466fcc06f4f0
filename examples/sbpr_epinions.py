"""Social BPR on Epinions (pos > social > neg three-way ranking).

Capability parity with reference ``examples/sbpr_epinions.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import GraphModality
from cornac_tpu.datasets import epinions
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, NDCG, Recall
from cornac_tpu.models import SBPR

feedback = epinions.load_feedback()
trust = epinions.load_trust()

rs = RatioSplit(
    data=feedback, test_size=0.1, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
    user_graph=GraphModality(data=trust),
)

sbpr = SBPR(k=10, max_iter=50, learning_rate=0.001, seed=123, verbose=True)

ct.Experiment(eval_method=rs, models=[sbpr], metrics=[AUC(), NDCG(k=10), Recall(k=10)]).run()
