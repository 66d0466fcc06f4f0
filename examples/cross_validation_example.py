"""5-fold cross-validation with fold mean/std reporting on MovieLens 100K."""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import CrossValidation
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import MF, PMF

ml_100k = movielens.load_feedback(variant="100K")
cv = CrossValidation(data=ml_100k, n_folds=5, seed=123, verbose=True)

ct.Experiment(
    eval_method=cv,
    models=[MF(k=10, max_iter=25, seed=123), PMF(k=10, max_iter=100, seed=123)],
    metrics=[MAE(), RMSE()],
).run()
