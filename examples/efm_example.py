"""EFM — explicit factor model over aspect-level sentiment, on Amazon Toy
& Games.

Capability parity with reference ``examples/efm_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import SentimentModality
from cornac_tpu.datasets import amazon_toy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, RMSE
from cornac_tpu.models import EFM

feedback = amazon_toy.load_feedback()
sentiment = amazon_toy.load_sentiment()

rs = RatioSplit(
    data=feedback, test_size=0.15, exclude_unknowns=True,
    verbose=True, seed=123,
    sentiment=SentimentModality(data=sentiment),
)

efm = EFM(
    num_explicit_factors=40, num_latent_factors=60, num_most_cared_aspects=15,
    rating_scale=5.0, alpha=0.85, max_iter=100, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[efm], metrics=[RMSE(), NDCG(k=50)]).run()
