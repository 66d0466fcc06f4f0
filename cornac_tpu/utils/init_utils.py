"""Seeded parameter initializers (host-side numpy).

Capability parity with reference ``cornac/utils/init_utils.py:22-200``.
Models that train on device convert these to ``jnp`` arrays once at the start
of ``fit``; keeping initialization on host numpy gives bit-reproducible
parameter draws independent of the accelerator backend.
"""

import numpy as np

from .common import get_rng


def zeros(shape, dtype=np.float32):
    return np.zeros(shape, dtype=dtype)


def ones(shape, dtype=np.float32):
    return np.ones(shape, dtype=dtype)


def constant(shape, value, dtype=np.float32):
    return np.full(shape, value, dtype=dtype)


def uniform(shape=None, low=0.0, high=1.0, random_state=None, dtype=np.float32):
    return get_rng(random_state).uniform(low, high, shape).astype(dtype)


def normal(shape=None, mean=0.0, std=1.0, random_state=None, dtype=np.float32):
    return get_rng(random_state).normal(mean, std, shape).astype(dtype)


def gamma(shape=None, shape_param=1.0, scale_param=1.0, random_state=None, dtype=np.float32):
    return get_rng(random_state).gamma(shape_param, scale_param, shape).astype(dtype)


def xavier_uniform(shape, random_state=None, dtype=np.float32):
    """Glorot & Bengio (2010) uniform initializer."""
    assert len(shape) == 2  # fan-in/fan-out requires a matrix
    std = np.sqrt(2.0 / np.sum(shape))
    limit = np.sqrt(3.0) * std
    return uniform(shape, -limit, limit, random_state, dtype)


def xavier_normal(shape, random_state=None, dtype=np.float32):
    """Glorot & Bengio (2010) normal initializer."""
    assert len(shape) == 2
    std = np.sqrt(2.0 / np.sum(shape))
    return normal(shape, 0, std, random_state, dtype)
