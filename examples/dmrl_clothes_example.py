"""DMRL with text + image modalities on Amazon Clothing.

Capability parity with reference ``examples/dmrl_clothes_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import ImageModality, TextModality
from cornac_tpu.data.text import BaseTokenizer
from cornac_tpu.datasets import amazon_clothing
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall
from cornac_tpu.models import DMRL

feedback = amazon_clothing.load_feedback()
docs, text_item_ids = amazon_clothing.load_text()
features, vis_item_ids = amazon_clothing.load_visual_feature()

rs = RatioSplit(
    data=feedback, test_size=0.2, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
    item_text=TextModality(
        corpus=docs, ids=text_item_ids,
        tokenizer=BaseTokenizer(stop_words="english"),
        max_vocab=8000, max_doc_freq=0.5,
    ),
    item_image=ImageModality(features=features, ids=vis_item_ids, normalized=True),
)

dmrl = DMRL(
    batch_size=1024, epochs=20, learning_rate=0.001,
    embedding_dim=100, image_dim=features.shape[1],
    num_factors=4, num_neg=4, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[dmrl], metrics=[Precision(k=10), Recall(k=10), NDCG(k=10)]).run()
