"""Fused full-catalog scoring + streaming top-k (Pallas TPU kernel).

The reference ranks with ``fast_dot`` (OpenMP vec·rows, ``utils/
fast_dot.pyx:25-43``) followed by a host ``argpartition`` — two passes and
a full (B, n_items) score matrix in memory.  This kernel fuses them: the
grid walks item tiles for each user block, scores the tile on the MXU, and
folds it into a running top-k held in the revisited output block — the
full score matrix never exists in HBM, per-user-block HBM traffic is
O(n_items·d + k) instead of O(n_items·(d+B)).

``fused_topk`` resolves its path through :mod:`cornac_tpu.ops.dispatch`:
XLA matmul + ``top_k`` by default on every backend (the r5 silicon
measurement in the dispatch docstring), Pallas via env var or
``force=``. CPU tests exercise the
kernel via interpret mode; r5 validated it on real silicon
(benchmarks/pallas_serving_race.py: exact vs XLA at Netflix serving
shape — after fixing a tie-break divergence interpret mode could not
see, Mosaic's argmax not sharing XLA's first-occurrence order).
Production call sites: ``TPUExactANN.knn_query`` and
``Recommender.recommend_batch``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _topk_kernel(u_ref, v_ref, b_ref, s_ref, i_ref, *, k, tile_n, d):
    """Grid: (user_blocks, item_tiles). Output blocks are revisited across
    the item-tile axis and act as the running top-k accumulator.

    Mosaic has no ``top_k`` lowering, so the merge is k rounds of
    max/argmax extraction (VPU row reductions) over the concatenated
    [running buffer | tile scores] candidates — exact, and cheap for the
    serving-sized k this kernel targets."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_ref[:] = jnp.full_like(s_ref, NEG_INF)
        i_ref[:] = jnp.zeros_like(i_ref)

    scores = jnp.dot(
        u_ref[:], v_ref[:].T, preferred_element_type=jnp.float32
    )  # (TB, TN)
    scores = scores + b_ref[:]  # (1, TN) bias (-inf on padded items)

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * tile_n

    cand_s = jnp.concatenate([s_ref[:], scores], axis=1)
    cand_i = jnp.concatenate([i_ref[:], col], axis=1)
    tb = cand_s.shape[0]
    colk = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)
    int_max = jnp.int32(2**31 - 1)

    def select(t, carry):
        cand_s, new_s, new_i = carry
        m = jnp.max(cand_s, axis=1)
        # explicit smallest-item-index tie-break: Mosaic's argmax does not
        # share XLA's first-occurrence tie order (observed on silicon), so
        # resolve ties by a min-reduce over the tied candidates' indices —
        # exactly the host/XLA ranking order
        tied = cand_s == m[:, None]
        val_i = jnp.min(jnp.where(tied, cand_i, int_max), axis=1)
        pick = tied & (cand_i == val_i[:, None])
        # one-hot column write (dynamic_update_slice has no Mosaic lowering)
        at_t = colk == t
        new_s = jnp.where(at_t, m[:, None], new_s)
        new_i = jnp.where(at_t, val_i[:, None].astype(jnp.int32), new_i)
        cand_s = jnp.where(pick, NEG_INF, cand_s)
        return cand_s, new_s, new_i

    _, new_s, new_i = jax.lax.fori_loop(
        0, k, select,
        (
            cand_s,
            jnp.full((tb, k), NEG_INF, jnp.float32),
            jnp.zeros((tb, k), jnp.int32),
        ),
    )
    s_ref[:] = new_s
    i_ref[:] = new_i


@functools.partial(
    jax.jit, static_argnames=("k", "tile_b", "tile_n", "interpret")
)
def _fused_topk_pallas(U, V, bias, k, tile_b=128, tile_n=512, interpret=False):
    B, d = U.shape
    N = V.shape[0]
    k_pad = min(_round_up(k, 128), _round_up(N, 128))
    B_pad = _round_up(B, tile_b)
    N_pad = _round_up(N, tile_n)

    U_p = jnp.pad(U, ((0, B_pad - B), (0, 0)))
    V_p = jnp.pad(V, ((0, N_pad - N), (0, 0)))
    # padded items must never win: bias them to -inf
    b_row = jnp.pad(bias, (0, N_pad - N), constant_values=NEG_INF)
    b_row = jnp.where(
        jnp.arange(N_pad) < N, b_row, NEG_INF
    )[None, :]

    grid = (B_pad // tile_b, N_pad // tile_n)
    kernel = functools.partial(_topk_kernel, k=k_pad, tile_n=tile_n, d=d)
    s, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda bi, nj: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda bi, nj: (nj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda bi, nj: (0, nj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, k_pad), lambda bi, nj: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k_pad), lambda bi, nj: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(U_p, V_p, b_row)
    return s[:B, :k], i[:B, :k]


@functools.partial(jax.jit, static_argnames=("k",))
def _fused_topk_xla(U, V, bias, k):
    scores = U @ V.T + bias[None, :]
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "n_parts"))
def _fused_topk_xla_twostage(U, V, bias, k, n_parts):
    """Exact top-k via partitioned selection: split the catalog into
    ``n_parts`` column blocks, take top-k inside each block, then one small
    top-k over the k*n_parts survivors. Exact by construction (every global
    top-k score wins its own block), and the per-block selections run over
    rows 1/n_parts as wide — the selection network's work drops while the
    scoring matmul is untouched. Replaces the reference's score-then-
    argpartition host path (``utils/fast_dot.pyx:40``).

    Measured at Netflix serving shape (benchmarks/micro_topk_twostage.py):
    on the v5e this is 0.61x single-shot ``lax.top_k`` at the best m (32)
    — XLA's top-k already prunes internally (PartialReduce) and the
    reshape + gather merge only adds HBM traffic — so the exact default
    stays single-shot; the mode is kept for catalogs/backends where the
    tradeoff flips."""
    scores = U @ V.T + bias[None, :]
    B, N = scores.shape
    width = _round_up(N, n_parts) // n_parts
    scores = jnp.pad(
        scores, ((0, 0), (0, width * n_parts - N)), constant_values=NEG_INF
    )
    block_s, block_i = jax.lax.top_k(scores.reshape(B, n_parts, width), k)
    block_i = block_i + (jnp.arange(n_parts) * width)[None, :, None]
    cand_s, cand_i = block_s.reshape(B, -1), block_i.reshape(B, -1)
    final_s, pos = jax.lax.top_k(cand_s, k)
    return final_s, jnp.take_along_axis(cand_i, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "slack"))
def _fused_topk_xla_threshold(U, V, bias, k, slack=8):
    """EXACT top-k via approx-seeded threshold refinement.

    ``lax.top_k`` over the full catalog dominates the exact serving step
    (94% at Netflix shape, PERF.md). Observation: the k-th best score of
    ANY k-subset is a lower bound on the true k-th best, so the k-th
    candidate from the fast ``approx_max_k`` pass gives a provable
    threshold t with {score >= t} ⊇ true top-k. The survivors compact
    into a (B, slack*k) buffer by a cumsum-indexed scatter — O(N) VPU
    work instead of a full selection — and one small exact ``top_k``
    finishes. Scatter order is ascending item index, so score ties
    resolve to the smaller index exactly like single-shot ``top_k``.
    If ties at t overflow the buffer the program falls back to the
    single-shot form (lax.cond), so the result is exact in all cases.

    Measured at Netflix serving shape (benchmarks/micro_topk_refined.py):
    0.04x single-shot — the (B, N) arbitrary-index scatter that compacts
    survivors is serial-ish on TPU and dwarfs the selection it saves.
    Kept (tested, exact) as documentation of the approach; with the
    partitioned form at 0.61x (micro_topk_twostage.py), XLA's TopK
    custom call stands as the exact-path floor on this chip."""
    scores = U @ V.T + bias[None, :]
    B, N = scores.shape
    W = min(slack * k, N)

    approx_s, _ = jax.lax.approx_max_k(scores, k, recall_target=0.95)
    t = approx_s[:, -1:]  # (B, 1): <= true k-th best score, per row

    keep = scores >= t
    pos = jnp.cumsum(keep, axis=1) - 1  # survivor slot, ascending item index
    n_keep = pos[:, -1] + 1
    slot = jnp.where(keep & (pos < W), pos, W)  # overflow/non-survivor -> bin W

    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    buf_s = jnp.full((B, W + 1), NEG_INF, jnp.float32).at[rows, slot].set(
        scores, mode="drop"
    )[:, :W]
    buf_i = jnp.zeros((B, W + 1), jnp.int32).at[rows, slot].set(
        iota, mode="drop"
    )[:, :W]

    def refined(_):
        s, p = jax.lax.top_k(buf_s, k)
        return s, jnp.take_along_axis(buf_i, p, axis=1)

    def full(_):
        s, i = jax.lax.top_k(scores, k)
        return s, i

    return jax.lax.cond(jnp.max(n_keep) > W, full, refined, operand=None)


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def _fused_topk_xla_approx(U, V, bias, k, recall_target):
    # TPU PartialReduce: prunes the per-row candidate set before the
    # exact selection. Measured at Netflix shape (8192 x 17.7k, k=100):
    # 11.5 ms vs 51.6 ms for exact top_k — 4.5x — at recall_target 0.95
    # (recall >= 0.99 degenerates to the full sort and saves nothing).
    scores = U @ V.T + bias[None, :]
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


@functools.partial(jax.jit, static_argnames=("k",))
def _fused_topk_xla_bf16(U, V, bias, k):
    # bf16 operands, f32 accumulation: the MXU streams half the bytes per
    # contraction at full f32 partial-sum precision; the bias add and the
    # top-k selection stay f32
    scores = (
        jax.lax.dot_general(
            U.astype(jnp.bfloat16),
            V.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias[None, :]
    )
    return jax.lax.top_k(scores, k)


def fused_topk(U, V, k, bias=None, force=None, precision="f32",
               recall_target=None, partitions=None):
    """Top-k items per user by dot-product score (+ optional item bias).

    Parameters
    ----------
    U: (B, d) user vectors. V: (N, d) item vectors. k: int.
    bias: optional (N,) item bias added to every user's scores.
    force: None (auto: XLA on every backend — the r5 silicon
        measurement, see ops/dispatch), 'pallas', 'pallas_interpret',
        or 'xla'.
    precision: 'f32' (exact) or 'bf16' (bf16 operands with f32
        accumulation — ~1 ulp-of-bf16 score noise; ranks of
        well-separated scores are unchanged, near-ties may swap).
    recall_target: None for EXACT selection, or a float in (0, 1) for
        the TPU-native approximate mode (``jax.lax.approx_max_k``) —
        the serving analogue of the reference's approximate ANN
        backends, 4.5x faster at Netflix shape for recall 0.95.
    partitions: None for one ``lax.top_k`` over the whole catalog, or an
        int m to select in two exact stages (per-block top-k over m
        catalog blocks, then top-k over the m*k survivors).

    Returns (scores (B, k), item indices (B, k)).
    """
    U = jnp.asarray(U, jnp.float32)
    V = jnp.asarray(V, jnp.float32)
    k = int(min(k, V.shape[0]))
    b = (
        jnp.zeros((V.shape[0],), jnp.float32)
        if bias is None
        else jnp.asarray(bias, jnp.float32)
    )
    if force is None:
        from .dispatch import use_pallas

        mode = "pallas" if use_pallas() else "xla"
    else:
        mode = force
    if recall_target is not None:
        return _fused_topk_xla_approx(U, V, b, k, float(recall_target))
    if precision == "bf16" and mode in ("xla", "pallas"):
        # the Pallas kernel is f32-only; bf16 routes through XLA
        return _fused_topk_xla_bf16(U, V, b, k)
    if mode == "xla":
        # partitioned two-stage selection is an XLA-exact-path variant
        # only: an explicit force='pallas' (or the env opt-in) wins
        if (
            partitions is not None
            and partitions > 1
            and partitions * k < V.shape[0]
        ):
            return _fused_topk_xla_twostage(U, V, b, k, int(partitions))
        return _fused_topk_xla(U, V, b, k)
    tile_n = int(min(512, _round_up(V.shape[0], 128)))
    tile_b = int(min(128, _round_up(U.shape[0], 8)))
    return _fused_topk_pallas(
        U, V, b, k, tile_b=tile_b, tile_n=tile_n,
        interpret=(mode == "pallas_interpret"),
    )
