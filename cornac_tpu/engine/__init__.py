"""Shared training engine: parameter init, layers, and optimizers for the
neural model family (pure JAX pytrees + optax)."""

from .nn import ACTIVATIONS, dense, init_dense, init_mlp, mlp

__all__ = ["ACTIVATIONS", "dense", "init_dense", "init_mlp", "mlp"]
