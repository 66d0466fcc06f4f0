"""UserKNN and ItemKNN variants (similarity as blocked matmuls + device
top-k) on MovieLens 100K.

Capability parity with reference ``examples/knn_movielens.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import RMSE
from cornac_tpu.models import ItemKNN, UserKNN

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, seed=123, verbose=True)

K = 50
models = [
    UserKNN(k=K, similarity="cosine", name="UserKNN-Cosine"),
    UserKNN(k=K, similarity="pearson", name="UserKNN-Pearson"),
    UserKNN(k=K, similarity="cosine", weighting="idf", name="UserKNN-IDF"),
    UserKNN(k=K, similarity="cosine", weighting="bm25", name="UserKNN-BM25"),
    UserKNN(k=K, similarity="cosine", amplify=2.0, name="UserKNN-Amplified"),
    ItemKNN(k=K, similarity="cosine", name="ItemKNN-Cosine"),
    ItemKNN(k=K, similarity="cosine", mean_centered=True, name="ItemKNN-AdjustedCosine"),
    ItemKNN(k=K, similarity="pearson", mean_centered=True, name="ItemKNN-AdjustedPearson"),
]

ct.Experiment(eval_method=rs, models=models, metrics=[RMSE()]).run()
