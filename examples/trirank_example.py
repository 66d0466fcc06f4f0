"""TriRank — tripartite (user, item, aspect) graph ranking with sentiment
data on Amazon Toy & Games.

Capability parity with reference ``examples/trirank_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import SentimentModality
from cornac_tpu.datasets import amazon_toy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG
from cornac_tpu.models import TriRank

feedback = amazon_toy.load_feedback()
sentiment = amazon_toy.load_sentiment()

rs = RatioSplit(
    data=feedback, test_size=0.2, exclude_unknowns=True,
    verbose=True, seed=123,
    sentiment=SentimentModality(data=sentiment),
)

trirank = TriRank(max_iter=100, verbose=True, seed=123)

ct.Experiment(eval_method=rs, models=[trirank], metrics=[NDCG(k=50)]).run()
