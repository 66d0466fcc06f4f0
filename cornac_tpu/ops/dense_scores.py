"""Shared device batch scorers for factor-table models.

Feeds the fused on-device eval path (``Recommender.score_batch_device``):
the returned arrays stay on device, so the metric kernel runs in the same
dispatch stream with no (B, N) host transfer.
"""

import jax
import jax.numpy as jnp


@jax.jit
def _dot_rows(u_rows, V):
    return u_rows @ V.T


@jax.jit
def _neg_l2_rows(u_rows, V):
    # -||u - v|| via the Gram expansion: one MXU matmul instead of a
    # (B, N, k) difference tensor
    sq = (
        jnp.sum(u_rows * u_rows, axis=1)[:, None]
        + jnp.sum(V * V, axis=1)[None, :]
        - 2.0 * (u_rows @ V.T)
    )
    return -jnp.sqrt(jnp.maximum(sq, 0.0))


def device_dot(u_rows, V):
    """(B, N) device scores = u_rows @ V.T in float32."""
    return _dot_rows(
        jnp.asarray(u_rows, jnp.float32), jnp.asarray(V, jnp.float32)
    )


def device_neg_l2(u_rows, V):
    """(B, N) device scores = -euclidean distance, matmul-form."""
    return _neg_l2_rows(
        jnp.asarray(u_rows, jnp.float32), jnp.asarray(V, jnp.float32)
    )


def device_broadcast_row(row, batch):
    """(B, N) device scores: one shared row for every user (popularity /
    constant scorers)."""
    r = jnp.asarray(row, jnp.float32)
    return jnp.broadcast_to(r[None, :], (batch, r.shape[0]))
