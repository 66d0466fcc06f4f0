"""Neural Collaborative Filtering (GMF / MLP / NeuMF) on Amazon Clothing.

Capability parity with reference ``examples/ncf_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import amazon_clothing
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import GMF, MLP, NeuMF

data = amazon_clothing.load_feedback()
rs = RatioSplit(
    data=data, test_size=0.2, rating_threshold=1.0,
    exclude_unknowns=True, verbose=True, seed=123,
)

models = [
    GMF(num_factors=8, num_epochs=10, learner="adam", batch_size=256, lr=0.001, num_neg=50, seed=123),
    MLP(layers=(32, 16, 8), act_fn="tanh", num_epochs=10, learner="adam", batch_size=256, lr=0.001, num_neg=50, seed=123),
    NeuMF(num_factors=8, layers=(32, 16, 8), act_fn="tanh", num_epochs=10, learner="adam", batch_size=256, lr=0.001, num_neg=50, seed=123),
]

ct.Experiment(eval_method=rs, models=models, metrics=[NDCG(k=10), Recall(k=10)]).run()
