"""ConvMF — CNN-encoded movie plots regularizing MF, on MovieLens 100K.

Capability parity with reference ``examples/conv_mf_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import TextModality
from cornac_tpu.data.text import BaseTokenizer
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall, RMSE
from cornac_tpu.models import ConvMF

plots, movie_ids = movielens.load_plot()
ml_100k = movielens.load_feedback(variant="100K")

item_text = TextModality(
    corpus=plots, ids=movie_ids,
    tokenizer=BaseTokenizer(stop_words="english"),
    max_vocab=8000, max_doc_freq=0.5,
)

rs = RatioSplit(
    data=ml_100k, test_size=0.2, rating_threshold=4.0,
    exclude_unknowns=True, verbose=True, seed=123,
    item_text=item_text,
)

convmf = ConvMF(k=50, n_epochs=5, cnn_epochs=5, verbose=True, seed=123)

ct.Experiment(
    eval_method=rs, models=[convmf],
    metrics=[RMSE(), Precision(k=10), Recall(k=10), NDCG(k=10)],
).run()
