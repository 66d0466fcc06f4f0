"""MTER — multi-task explainable recommendation (Tucker tensor SGD), on
Amazon Toy & Games.

Capability parity with reference ``examples/mter_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import SentimentModality
from cornac_tpu.datasets import amazon_toy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, RMSE
from cornac_tpu.models import MTER

feedback = amazon_toy.load_feedback()
sentiment = amazon_toy.load_sentiment()

rs = RatioSplit(
    data=feedback, test_size=0.15, exclude_unknowns=True,
    verbose=True, seed=123,
    sentiment=SentimentModality(data=sentiment),
)

# demo-sized iteration budget; the reference example's full-convergence
# setting on real Amazon data is max_iter=200000 (same fused device loop,
# just longer) — raise it for a production fit
mter = MTER(
    n_user_factors=15, n_item_factors=15, n_aspect_factors=12, n_opinion_factors=12,
    n_bpr_samples=1000, n_element_samples=50, lambda_reg=0.1, lambda_bpr=10,
    max_iter=10000, lr=0.1, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[mter], metrics=[RMSE(), NDCG(k=50)]).run()
