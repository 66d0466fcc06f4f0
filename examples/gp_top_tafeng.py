"""GPTop — global/personal top-frequency baselines under leave-last-basket
evaluation on Ta Feng, with repetition/exploration breakdowns.

Capability parity with reference ``examples/gp_top_tafeng.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import tafeng
from cornac_tpu.eval_methods import NextBasketEvaluation
from cornac_tpu.metrics import HitRatio, Recall
from cornac_tpu.models import GPTop

baskets = tafeng.load_basket()

nbe = NextBasketEvaluation(
    data=baskets, fmt="UBITJson", test_size=0.2, val_size=0.0,
    repetition_eval=True, exploration_eval=True,
    seed=123, verbose=True,
)

models = [
    GPTop(name="GTop", use_personalized_popularity=False),
    GPTop(name="PTop", use_global_popularity=False),
    GPTop(name="GPTop"),
]

ct.Experiment(
    eval_method=nbe, models=models,
    metrics=[Recall(k=10), Recall(k=50), HitRatio(k=10)],
).run()
