"""BiVAECF — dual user/item VAEs with optional constrained priors on
MovieLens 100K.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, NDCG, Recall
from cornac_tpu.models import BiVAECF

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123, verbose=True)

bivae = BiVAECF(
    k=10, encoder_structure=[20], act_fn="tanh", likelihood="pois",
    n_epochs=100, batch_size=100, learning_rate=0.001, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[bivae], metrics=[AUC(), NDCG(k=10), Recall(k=10)]).run()
