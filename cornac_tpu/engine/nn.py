"""Minimal neural-net building blocks as pure functions over pytrees.

The neural model family (VAECF, NCF, RecVAE, ...) shares these instead of
each model bringing its own framework (the reference mixes torch and TF2
per model — SURVEY §2.3). Initialization follows torch's ``nn.Linear``
default (U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both W and b) so models
land in the same regime as their reference counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np

ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": jax.nn.leaky_relu,
    "leaky": jax.nn.leaky_relu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "none": lambda x: x,
}


def init_dense(rng, fan_in, fan_out):
    """One linear layer's params, torch-default initialization."""
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jnp.asarray(
            rng.uniform(-bound, bound, size=(fan_in, fan_out)).astype(np.float32)
        ),
        "b": jnp.asarray(
            rng.uniform(-bound, bound, size=(fan_out,)).astype(np.float32)
        ),
    }


def dense(params, x):
    return x @ params["w"] + params["b"]


def init_mlp(rng, sizes):
    """Stack of linear layers: sizes = [in, h1, h2, ...]."""
    return [init_dense(rng, sizes[i], sizes[i + 1]) for i in range(len(sizes) - 1)]


def mlp(params, x, act, final_act=None):
    """Apply the stack; ``act`` between layers, ``final_act`` after the last
    (None = linear head)."""
    n = len(params)
    for i, layer in enumerate(params):
        x = dense(layer, x)
        if i < n - 1:
            x = act(x)
        elif final_act is not None:
            x = final_act(x)
    return x
