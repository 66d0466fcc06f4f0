"""Fused all-pairs co-support cosine similarity + top-k neighbors
(Pallas TPU kernel).

The reference computes KNN similarity with an OpenMP loop over rows and a
C++ ``TopK`` heap per row (``models/knn/similarity.pyx:51-107``); the XLA
redesign is three blocked MXU matmuls producing the full (n, n) similarity
matrix (``models/knn.py``). This kernel goes one step further, per SURVEY
§2.4's "blocked X·Xᵀ with Pallas tile kernel + per-tile top-k merge": the
grid walks column tiles for each row block, computes the co-support
cosine tile on the MXU —

    sim(r, c) = <w_r, w_c> / (||w_r restricted to c's support|| *
                              ||w_c restricted to r's support||)

— and folds it straight into a running top-k held in the revisited output
block. The (n, n) similarity matrix never exists in HBM: per-row-block
traffic is O(n·m + k) instead of O(n·(m + n)).

``cosine_topk`` resolves its path through :mod:`cornac_tpu.ops.dispatch`:
XLA by default on every backend (the r5 silicon measurement — see the
dispatch docstring), with the Pallas kernel opt-in; the XLA path holds
the full similarity tile in HBM and selects with ``lax.top_k``.
``force='pallas_interpret'`` covers CPU tests; r5 validated this kernel
on real silicon against the XLA path (tied-similarity data included).
Production call sites: ``UserKNN.nearest_users`` / ``ItemKNN.nearest_items``
(the related-items serving surface).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sim_topk_kernel(
    r_ref, c_ref, s_ref, i_ref, *, k, tile_c, exclude_self, n_real
):
    """Grid: (row_blocks, col_tiles). Output blocks are revisited across
    the col-tile axis and act as the running top-k accumulator (same merge
    structure as ``pallas_ranking._topk_kernel``: Mosaic has no top_k
    lowering, so k rounds of max/argmax extraction)."""
    bi = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_ref[:] = jnp.full_like(s_ref, NEG_INF)
        i_ref[:] = jnp.zeros_like(i_ref)

    wr = r_ref[:]  # (TR, m)
    wc = c_ref[:]  # (TC, m)
    br = (wr != 0).astype(jnp.float32)
    bc = (wc != 0).astype(jnp.float32)

    num = jnp.dot(wr, wc.T, preferred_element_type=jnp.float32)
    d1 = jnp.dot(wr * wr, bc.T, preferred_element_type=jnp.float32)
    d2 = jnp.dot(br, (wc * wc).T, preferred_element_type=jnp.float32)
    denom = jnp.sqrt(d1) * jnp.sqrt(d2)
    sim = jnp.where(num != 0, num / jnp.maximum(denom, 1e-12), 0.0)

    tr = sim.shape[0]
    row_id = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0) + bi * tr
    col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + j * tile_c
    # padded columns would tie real zero-similarity entries and could beat
    # genuinely negative similarities (mean-centered data) — mask them out
    sim = jnp.where(col < n_real, sim, NEG_INF)
    if exclude_self:
        sim = jnp.where(row_id == col, NEG_INF, sim)

    cand_s = jnp.concatenate([s_ref[:], sim], axis=1)
    cand_i = jnp.concatenate([i_ref[:], col], axis=1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (tr, k), 1)
    int_max = jnp.int32(2**31 - 1)

    def select(t, carry):
        cand_s, new_s, new_i = carry
        m = jnp.max(cand_s, axis=1)
        # explicit smallest-column tie-break (ties are COMMON here — equal
        # or zero similarities): Mosaic's argmax does not share XLA's
        # first-occurrence tie order, observed on silicon in the ranking
        # kernel's r5 hardware run, so resolve ties by a min-reduce
        tied = cand_s == m[:, None]
        val_i = jnp.min(jnp.where(tied, cand_i, int_max), axis=1)
        pick = tied & (cand_i == val_i[:, None])
        at_t = colk == t
        new_s = jnp.where(at_t, m[:, None], new_s)
        new_i = jnp.where(at_t, val_i[:, None].astype(jnp.int32), new_i)
        cand_s = jnp.where(pick, NEG_INF, cand_s)
        return cand_s, new_s, new_i

    _, new_s, new_i = jax.lax.fori_loop(
        0, k, select,
        (
            cand_s,
            jnp.full((tr, k), NEG_INF, jnp.float32),
            jnp.zeros((tr, k), jnp.int32),
        ),
    )
    s_ref[:] = new_s
    i_ref[:] = new_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_r", "tile_c", "exclude_self", "interpret"),
)
def _cosine_topk_pallas(
    W, k, tile_r=128, tile_c=256, exclude_self=True, interpret=False
):
    n, m = W.shape
    k_pad = min(_round_up(k, 128), _round_up(n, 128))
    n_pad_r = _round_up(n, tile_r)
    n_pad_c = _round_up(n, tile_c)
    n_pad = max(n_pad_r, n_pad_c)
    W_p = jnp.pad(W, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // tile_r, n_pad // tile_c)
    kernel = functools.partial(
        _sim_topk_kernel,
        k=k_pad,
        tile_c=tile_c,
        exclude_self=exclude_self,
        n_real=n,
    )
    s, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, m), lambda bi, cj: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, m), lambda bi, cj: (cj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, k_pad), lambda bi, cj: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, k_pad), lambda bi, cj: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(W_p, W_p)
    return s[:n, :k], i[:n, :k]


@functools.partial(jax.jit, static_argnames=("k", "exclude_self"))
def _cosine_topk_xla(W, k, exclude_self=True):
    B = (W != 0).astype(W.dtype)
    num = W @ W.T
    d1 = (W * W) @ B.T
    d2 = B @ (W * W).T
    denom = jnp.sqrt(d1) * jnp.sqrt(d2)
    sim = jnp.where(num != 0, num / jnp.maximum(denom, 1e-12), 0.0)
    if exclude_self:
        n = W.shape[0]
        sim = jnp.where(jnp.eye(n, dtype=bool), NEG_INF, sim)
    return jax.lax.top_k(sim, k)


def cosine_topk(W, k, exclude_self=True, force=None):
    """Top-k most similar rows per row of ``W`` under co-support cosine.

    Parameters
    ----------
    W: (n, m) dense float array (user-item or item-user weights).
    k: neighbors per row (capped at n - exclude_self).
    exclude_self: drop the trivial self-match (default True).
    force: None (XLA default — see module docstring), 'pallas',
        'pallas_interpret', or 'xla'.

    Returns (similarities (n, k), row indices (n, k)).
    """
    W = jnp.asarray(W, jnp.float32)
    n = W.shape[0]
    k = int(min(k, n - 1 if exclude_self else n))
    if force is None:
        from .dispatch import use_pallas

        mode = "pallas" if use_pallas() else "xla"
    else:
        mode = force
    if mode == "xla":
        return _cosine_topk_xla(W, k, exclude_self=exclude_self)
    tile_c = int(min(256, _round_up(n, 128)))
    tile_r = int(min(128, _round_up(n, 8)))
    return _cosine_topk_pallas(
        W, k, tile_r=tile_r, tile_c=tile_c, exclude_self=exclude_self,
        interpret=(mode == "pallas_interpret"),
    )
