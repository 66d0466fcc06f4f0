"""LRPPM — learning-to-rank tensor model over (user, item, aspect), on
Amazon Toy & Games.

Capability parity with reference ``examples/lrppm_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import SentimentModality
from cornac_tpu.datasets import amazon_toy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, RMSE
from cornac_tpu.models import LRPPM

feedback = amazon_toy.load_feedback()
sentiment = amazon_toy.load_sentiment()

rs = RatioSplit(
    data=feedback, test_size=0.15, exclude_unknowns=True,
    verbose=True, seed=123,
    sentiment=SentimentModality(data=sentiment),
)

# demo-sized iteration budget; the reference example's full-convergence
# setting on real Amazon data is max_iter=200000 (same fused device
# loop, just longer) — raise it for a production fit
lrppm = LRPPM(
    n_factors=8, ld=1.0, reg=0.01, alpha=1.0,
    n_samples=200, n_ranking_samples=1000, max_iter=20000, lr=0.1,
    seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[lrppm], metrics=[RMSE(), NDCG(k=50)]).run()
