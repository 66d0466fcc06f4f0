"""VBPR — visual BPR using pre-extracted CNN features, on Tradesy.

Capability parity with reference ``examples/vbpr_tradesy.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import ImageModality
from cornac_tpu.datasets import tradesy
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, Recall
from cornac_tpu.models import VBPR

feedback = tradesy.load_feedback()
features, item_ids = tradesy.load_visual_feature()

item_image = ImageModality(features=features, ids=item_ids, normalized=True)

rs = RatioSplit(
    data=feedback, test_size=0.1, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
    item_image=item_image,
)

vbpr = VBPR(
    k=10, k2=20, n_epochs=50, batch_size=100, learning_rate=0.005,
    lambda_w=1, lambda_b=0.01, lambda_e=0.0, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[vbpr], metrics=[AUC(), Recall(k=50)]).run()
