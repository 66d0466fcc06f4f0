"""VMF — visual matrix factorization, on Amazon Clothing.

Capability parity with reference ``examples/vmf_clothing.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import ImageModality
from cornac_tpu.datasets import amazon_clothing
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall, RMSE
from cornac_tpu.models import VMF

feedback = amazon_clothing.load_feedback()
features, item_ids = amazon_clothing.load_visual_feature()

item_image = ImageModality(features=features, ids=item_ids, normalized=True)

rs = RatioSplit(
    data=feedback, test_size=0.1, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
    item_image=item_image,
)

vmf = VMF(k=10, d=10, n_epochs=100, batch_size=100, learning_rate=0.001, seed=123, verbose=True)

ct.Experiment(eval_method=rs, models=[vmf], metrics=[RMSE(), Recall(k=50), NDCG(k=50)]).run()
