"""NARRE — neural attentional rating regression with review-level
explanations, on Amazon Digital Music reviews.

Capability parity with reference ``examples/narre_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import ReviewModality
from cornac_tpu.data.text import BaseTokenizer
from cornac_tpu.datasets import amazon_digital_music
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, NDCG, RMSE
from cornac_tpu.models import NARRE

feedback = amazon_digital_music.load_feedback()
reviews = amazon_digital_music.load_review()

review_modality = ReviewModality(
    data=reviews,
    tokenizer=BaseTokenizer(stop_words="english"),
    max_vocab=4000, max_doc_freq=0.5,
)

rs = RatioSplit(
    data=feedback, test_size=0.2, exclude_unknowns=True,
    verbose=True, seed=123, review_text=review_modality,
)

narre = NARRE(
    embedding_size=100, id_embedding_size=32, n_factors=32,
    attention_size=16, n_filters=64, max_text_length=50, max_num_review=32,
    batch_size=64, max_iter=10, verbose=True, seed=123,
)

ct.Experiment(eval_method=rs, models=[narre], metrics=[MAE(), RMSE(), NDCG(k=10)]).run()
