"""HFT — hidden factors as topics (LDA-coupled MF) on MovieLens plots.

Capability parity with reference ``examples/hft_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import TextModality
from cornac_tpu.data.text import BaseTokenizer
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import HFT

plots, movie_ids = movielens.load_plot()
ml_100k = movielens.load_feedback(variant="100K")

item_text = TextModality(
    corpus=plots, ids=movie_ids,
    tokenizer=BaseTokenizer(stop_words="english"),
    max_vocab=5000, max_doc_freq=0.5,
)

rs = RatioSplit(
    data=ml_100k, test_size=0.2, exclude_unknowns=True,
    verbose=True, seed=123, item_text=item_text,
)

hft = HFT(k=10, max_iter=40, grad_iter=5, l2_reg=0.001, lambda_text=0.01, vocab_size=5000, seed=123, verbose=True)

ct.Experiment(eval_method=rs, models=[hft], metrics=[MAE(), RMSE()]).run()
