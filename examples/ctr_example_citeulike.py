"""CTR — collaborative topic regression (LDA + MF coordinate ascent) on
CiteULike.

Capability parity with reference ``examples/ctr_example_citeulike.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import TextModality
from cornac_tpu.data.text import BaseTokenizer
from cornac_tpu.datasets import citeulike
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import CTR

docs, item_ids = citeulike.load_text()
feedback = citeulike.load_feedback()

item_text = TextModality(
    corpus=docs, ids=item_ids,
    tokenizer=BaseTokenizer(stop_words="english"),
    max_vocab=8000, max_doc_freq=0.5,
)

rs = RatioSplit(
    data=feedback, test_size=0.2, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
    item_text=item_text,
)

ctr = CTR(k=50, max_iter=50, lambda_v=1, seed=123, verbose=True)

ct.Experiment(eval_method=rs, models=[ctr], metrics=[NDCG(k=100), Recall(k=300)]).run()
