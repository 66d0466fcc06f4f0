"""DMRL — disentangled multimodal representation learning (text modality)
on CiteULike.

Capability parity with reference ``examples/dmrl_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import TextModality
from cornac_tpu.data.text import BaseTokenizer
from cornac_tpu.datasets import citeulike
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall
from cornac_tpu.models import DMRL

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

dmrl = DMRL(
    batch_size=1024, epochs=20, learning_rate=0.001,
    embedding_dim=100, num_factors=4, num_neg=4, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[dmrl], metrics=[Precision(k=10), Recall(k=10), NDCG(k=10)]).run()
