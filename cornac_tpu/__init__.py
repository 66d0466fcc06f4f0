"""cornac_tpu — a TPU-native comparative framework for multimodal
recommender systems, with the capabilities of Cornac (PreferredAI/cornac
v2.6.0) rebuilt on JAX/XLA/Pallas.

Design stance: models are parameter pytrees + jit-compiled device loops;
evaluation is batched device scoring + vectorized metrics; determinism and
parallelism coexist by construction (seeded ``jax.random``, no hogwild).
"""

from . import data, datasets, eval_methods, experiment, hyperopt, metrics, models
from .config import RuntimeConfig
from .experiment import Experiment

__version__ = "0.1.0"

__all__ = [
    "Experiment",
    "data",
    "datasets",
    "eval_methods",
    "experiment",
    "hyperopt",
    "metrics",
    "models",
]
