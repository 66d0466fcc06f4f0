"""Evaluating with a user-provided train/test split (no splitter), via
``BaseMethod.from_splits``.

Capability parity with reference ``examples/given_data.py``.
"""

import numpy as np

import cornac_tpu as ct
from cornac_tpu.eval_methods import BaseMethod
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import MF

# Pretend these came from files the user already split themselves.
rng = np.random.RandomState(7)
triplets = [
    (f"u{rng.randint(50)}", f"i{rng.randint(40)}", float(rng.randint(1, 6)))
    for _ in range(1500)
]
train_data, test_data = triplets[:1200], triplets[1200:]

eval_method = BaseMethod.from_splits(
    train_data=train_data, test_data=test_data, exclude_unknowns=False, verbose=True
)

ct.Experiment(
    eval_method=eval_method,
    models=[MF(k=10, max_iter=25, learning_rate=0.01, lambda_reg=0.02, use_bias=True, seed=123)],
    metrics=[MAE(), RMSE()],
).run()
