"""Shared RMSProp-SGD stream kernel for sigmoid-link factor models.

The reference implements the same per-sample loop four times (PMF
``pmf.pyx``, SoRec ``sorec.pyx``, MCF ``mcf.pyx`` rating/net streams); here
it is one jitted minibatched kernel reused by all of them: gather rows of
two factor tables + their RMSProp caches, compute the (optionally
sigmoid-weighted) error, scatter-add updates.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("batch_size", "non_linear"), donate_argnums=(0, 1, 2, 3))
def rmsprop_stream_epoch(
    A,
    B,
    cache_a,
    cache_b,
    perm,
    mask,
    rows,
    cols,
    vals,
    lr_a,
    lr_b,
    reg,
    gamma,
    batch_size,
    non_linear=True,
):
    """One RMSProp epoch over a stream of (row, col, val) observations with
    model val ~ sigmoid(A[row] . B[col]) (or the identity link)."""
    eps = 1e-8
    n_batches = perm.shape[0] // batch_size
    # fast-row-gather layout (see bpr._bpr_epochs): pad the four
    # row-addressed tables to 256-byte-multiple widths; padded columns
    # stay exactly zero (zero grads -> zero cache -> zero updates)
    k = A.shape[1]
    pad_cols = (-k) % 64
    if pad_cols:
        pc = ((0, 0), (0, pad_cols))
        A, B = jnp.pad(A, pc), jnp.pad(B, pc)
        cache_a, cache_b = jnp.pad(cache_a, pc), jnp.pad(cache_b, pc)
    # one (n, 2) row gather per draw instead of two thin gathers
    pairs = jnp.stack([rows, cols], axis=1)

    def body(b, carry):
        A, B, cache_a, cache_b, loss = carry
        idx = jax.lax.dynamic_slice(perm, (b * batch_size,), (batch_size,))
        m = jax.lax.dynamic_slice(mask, (b * batch_size,), (batch_size,))
        pr = pairs[idx]
        r, c, v = pr[:, 0], pr[:, 1], vals[idx]
        pa, pb = A[r], B[c]
        s = jnp.sum(pa * pb, axis=1)
        if non_linear:
            sg = jax.nn.sigmoid(jnp.clip(s, -6.0, 6.0))
            e = v - sg
            we = e * sg * (1.0 - sg)
        else:
            e = v - s
            we = e
        we = we * m
        loss = loss + jnp.sum(
            (e * e + reg * (jnp.sum(pa * pa, axis=1) + jnp.sum(pb * pb, axis=1))) * m
        )

        ga = we[:, None] * pb - reg * pa * m[:, None]
        gb = we[:, None] * pa - reg * pb * m[:, None]

        ca = gamma * cache_a[r] + (1 - gamma) * ga * ga
        cb = gamma * cache_b[c] + (1 - gamma) * gb * gb
        cache_a = cache_a.at[r].set(jnp.where(m[:, None] > 0, ca, cache_a[r]))
        cache_b = cache_b.at[c].set(jnp.where(m[:, None] > 0, cb, cache_b[c]))

        A = A.at[r].add(lr_a * ga / (jnp.sqrt(ca) + eps) * m[:, None])
        B = B.at[c].add(lr_b * gb / (jnp.sqrt(cb) + eps) * m[:, None])
        return A, B, cache_a, cache_b, loss

    A, B, cache_a, cache_b, loss = jax.lax.fori_loop(
        0, n_batches, body, (A, B, cache_a, cache_b, jnp.float32(0.0))
    )
    if pad_cols:
        A, B = A[:, :k], B[:, :k]
        cache_a, cache_b = cache_a[:, :k], cache_b[:, :k]
    return A, B, cache_a, cache_b, loss


def run_stream_epoch(
    A, B, cache_a, cache_b, rows, cols, vals, rng, lr_a, lr_b, reg, gamma,
    batch_size=1024, non_linear=True,
):
    """Host helper: shuffle, pad, and run one stream epoch on device."""
    import numpy as np

    n = len(rows)
    bsz = min(batch_size, n)
    n_pad = (-n) % bsz
    perm = np.concatenate([rng.permutation(n), np.zeros(n_pad, np.int64)])
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
    return rmsprop_stream_epoch(
        A,
        B,
        cache_a,
        cache_b,
        jnp.asarray(perm, dtype=jnp.int32),
        jnp.asarray(mask),
        rows,
        cols,
        vals,
        jnp.float32(lr_a),
        jnp.float32(lr_b),
        jnp.float32(reg),
        jnp.float32(gamma),
        batch_size=bsz,
        non_linear=non_linear,
    )
