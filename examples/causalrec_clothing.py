"""CausalRec — deconfounded visual recommendation, on Amazon Clothing.

Capability parity with reference ``examples/causalrec_clothing.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import ImageModality
from cornac_tpu.datasets import amazon_clothing
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, Recall
from cornac_tpu.models import CausalRec

feedback = amazon_clothing.load_feedback()
features, item_ids = amazon_clothing.load_visual_feature()

item_image = ImageModality(features=features, ids=item_ids, normalized=True)

rs = RatioSplit(
    data=feedback, test_size=0.1, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
    item_image=item_image,
)

causalrec = CausalRec(
    k=10, k2=20, n_epochs=50, batch_size=100, learning_rate=0.005,
    lambda_w=1, lambda_b=0.01, lambda_e=0.0, tanh=1, lambda_2=0.8,
    seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[causalrec], metrics=[AUC(), Recall(k=50)]).run()
