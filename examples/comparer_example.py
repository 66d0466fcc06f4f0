"""ComparERObj / ComparERSub — explainable recommendation with comparative
constraints, on Amazon Toy & Games.
"""

import cornac_tpu as ct
from cornac_tpu.data import SentimentModality
from cornac_tpu.datasets import amazon_toy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, RMSE
from cornac_tpu.models import ComparERObj, ComparERSub

feedback = amazon_toy.load_feedback()
sentiment = amazon_toy.load_sentiment()

rs = RatioSplit(
    data=feedback, test_size=0.15, exclude_unknowns=True,
    verbose=True, seed=123,
    sentiment=SentimentModality(data=sentiment),
)

ct.Experiment(
    eval_method=rs,
    models=[
        ComparERObj(num_explicit_factors=40, num_latent_factors=60, max_iter=100, seed=123, verbose=True),
        ComparERSub(n_user_factors=8, n_item_factors=8, n_aspect_factors=8, max_iter=200000, lr=0.1, seed=123, verbose=True),
    ],
    metrics=[RMSE(), NDCG(k=50)],
).run()
