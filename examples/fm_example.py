"""Factorization Machines (SGD/ALS learners, TPU-native) on MovieLens 100K.

Capability parity with reference ``examples/fm_example.py`` (which requires
Linux-only vendored libFM; here FM runs on any JAX backend).
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import FM

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, seed=123, verbose=True)

fm = FM(k0=1, k1=1, k2=8, max_iter=100, learning_rate=0.01, method="als", seed=123, verbose=True)

ct.Experiment(eval_method=rs, models=[fm], metrics=[MAE(), RMSE()]).run()
