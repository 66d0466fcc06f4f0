"""Companion — comparative explainable recommendation (MTER extension with
aspect/opinion ranking streams), on Amazon Toy & Games.

Capability parity with reference ``examples/companion_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import SentimentModality
from cornac_tpu.datasets import amazon_toy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, RMSE
from cornac_tpu.models import Companion

feedback = amazon_toy.load_feedback()
sentiment = amazon_toy.load_sentiment()

rs = RatioSplit(
    data=feedback, test_size=0.15, exclude_unknowns=True,
    verbose=True, seed=123,
    sentiment=SentimentModality(data=sentiment),
)

companion = Companion(
    n_user_factors=8, n_item_factors=8, n_aspect_factors=8, n_opinion_factors=8,
    n_element_samples=50, n_bpr_samples=1000,
    n_aspect_ranking_samples=1000, n_opinion_ranking_samples=1000,
    max_iter=500000, lr=0.5, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[companion], metrics=[RMSE(), NDCG(k=50)]).run()
