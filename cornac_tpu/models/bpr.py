"""BPR — Bayesian Personalized Ranking (Rendle et al., UAI 2009) + WBPR.

Capability parity with reference ``cornac/models/bpr/recom_bpr.pyx:66``
(Cython/OpenMP hogwild SGD with per-thread mt19937 streams) redesigned for
TPU:

- Each epoch draws all |R| triplets up front with ``jax.random`` (one key
  fold per epoch — deterministic AND parallel, replacing the reference's
  determinism-vs-threads tradeoff, ``recom_bpr.pyx:132-133``).
- The observed-pair rejection is a vectorized CSR binary search on device
  (:mod:`cornac_tpu.ops.membership`) instead of per-sample C CSR probes;
  rejected samples are masked out of the update, which is exactly the
  reference's skip-not-resample semantics (``recom_bpr.pyx:241-245``).
- Updates run as a jitted ``lax.fori_loop`` over fixed-size minibatches of
  gather → sigmoid → scatter-add, donated buffers, whole epoch on device.

WBPR (reference ``models/bpr/recom_wbpr.pyx:32``) = BPR with negatives drawn
proportionally to item popularity.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.accumulate import accumulate_rows
from ..ops.membership import build_membership
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.init_utils import uniform, zeros
from .recommender import ANNMixin, MEASURE_DOT, Recommender

DTYPE = np.float32

# Above this many samples per epoch, triplets are drawn per-minibatch inside
# the compiled loop instead of in one per-epoch bulk tensor — bounds HBM
# temporaries by batch_size instead of |R| (see _bpr_epochs). NOTE: read at
# trace time; tests that lower it must use a fresh (shape, batch_size) so
# the jit cache cannot serve the old branch.
_BULK_SAMPLING_MAX = 1 << 24

# Gates for the fused one-hot-matmul fetch program (see _bpr_epochs): its
# MXU cost scales with n_users (measured: wins at 943 users, loses at
# 6040), the halfword-membership columns must fit the padded lane width,
# and the augmented table must fit a sane HBM slice. Module-level so the
# gate-boundary goldens (tests/test_bpr_fused.py) can patch them and
# exercise both sides of every gate cheaply.
_FUSED_MAX_USERS = 2048
_FUSED_MAX_COLS = 256
_FUSED_MAX_TABLE_BYTES = 128 * 1024 * 1024


@partial(
    jax.jit,
    static_argnames=("batch_size", "use_bias", "num_items", "variant"),
    donate_argnums=(0, 1, 2),
)
def _bpr_epochs(
    U,
    V,
    Bi,
    key,
    pairs,
    membership,
    neg_population,
    lr,
    reg,
    batch_size,
    use_bias,
    num_items,
    n_epochs,
    epoch_offset=0,
    variant="bpr",
    W16=None,
):
    """Run ``n_epochs`` BPR epochs in one compiled program (no host
    round-trips between epochs). Each epoch: sample |R| triplets, reject
    observed negatives by masking, apply minibatched SGD updates. Returns
    updated params plus the last epoch's (correct, skipped) counters for
    parity with the reference progress stats. ``n_epochs`` is a traced
    scalar so one compilation serves any epoch count.

    TPU specifics (measured on v5e, benchmarks/micro_bpr_epoch.py):

    - the item bias rides as an extra column of V (a user column of ones
      pairs with it), so the whole update is two table writes instead of
      six — and those writes are one-hot matmuls on the MXU rather than
      scatter-adds, which XLA lowers to a serialized update loop at these
      narrow factor widths (~2.3x slower than the matmul form).
    - the epoch cost is dominated by per-element dynamic gathers, not by
      dispatch or MXU work (batch-size invariant: 2.6ms/epoch at ML-100K
      shape for any batch in 2k..16k).
    - **the fast-row-gather layout** (measured on v5e,
      benchmarks/micro_gather_variants.py): XLA's TPU row gather runs
      ~5x faster when rows are 256-byte multiples (64 x f32) — 115 vs 23
      Mrows/s from a 480k-row table — and plain scatter-add then also
      beats the argsorted form (1.33 vs 4.7 ms per 65536-row update).
      So the non-fused path pads the factor tables' column count to a
      multiple of 64 (padded columns are zeros; zero updates keep them
      zero, and the sums over them add exact +0.0 — results unchanged),
      and the positive (user, item) pair is stored as one (|R|, 2) int32
      row so sampling costs ONE 8-byte row gather instead of two 4-byte
      gathers (measured 2x: 0.65 vs 1.36 ms per 65536 draws).  Membership
      rides the same finding: ops/membership.py's b+tree strategy probes
      with two 256-byte row gathers instead of log2(degree) serial thin
      gathers.  Together: 12.3M vs 4.3M samples/s at Netflix shape
      (benchmarks/micro_btree_probe.py).
    - two further gather eliminations for small catalogs:

      * ``W16``: the user->item membership bitmap stored as 16-bit
        halfwords in exact-f32 columns riding on the user table — the
        user-factor fetch and the membership-row fetch become ONE one-hot
        matmul on the MXU (the factor width pads to 128 lanes anyway, so
        the extra columns are free at recommender scale), replacing both
        the per-row U gather and the per-sample bitmap gather. The bit
        test is then pure VPU math: select halfword ``j >> 4``, extract
        bit ``j & 15`` via exp2/floor/mod (exact: halfwords <= 65535 are
        exact f32, and the one-hot matmul moves each value untouched).
    """
    n = pairs.shape[0]
    n_pad = (-n) % batch_size
    n_total = n + n_pad
    n_batches = n_total // batch_size
    n_users = U.shape[0]
    # At huge interaction counts the per-epoch bulk sampling tensors
    # (pos_idx/neg/users/items/valid, each n_total-sized, plus the
    # membership search's lo/hi carries) dominate HBM — ~4 GB of
    # temporaries at Netflix scale (100M) on top of the data arrays, which
    # overflows a 16 GB chip. Past this threshold each minibatch samples
    # its own triplets inside the loop body instead: same marginal
    # distribution, HBM bounded by batch_size regardless of |R|.
    batched_sampling = n_total > _BULK_SAMPLING_MAX
    if not batched_sampling:
        pad_mask = jnp.arange(n_total) < n

    # bias as an extra factor column: U gains a frozen ones column
    if use_bias:
        U = jnp.concatenate([U, jnp.ones((n_users, 1), U.dtype)], axis=1)
        V = jnp.concatenate([V, Bi[:, None]], axis=1)
    k_ext = U.shape[1]
    fused = W16 is not None
    pad_cols = 0
    if fused:
        n_words = W16.shape[1]
        # membership halfwords ride the loop carry as frozen extra columns
        # of U: one fetch matmul AND one update matmul per step (both pad
        # to the same 128-lane width as the factors alone at rec scale)
        U = jnp.concatenate([U, W16], axis=1)
    else:
        # fast-row-gather layout: pad columns to a 256-byte multiple (see
        # docstring). Padded columns are zero and stay zero.
        pad_cols = (-k_ext) % 64
        if pad_cols:
            U = jnp.pad(U, ((0, 0), (0, pad_cols)))
            V = jnp.pad(V, ((0, 0), (0, pad_cols)))
    # gradient gate: the ones column of U (and any pad) must stay fixed
    u_col_gate = (
        jnp.arange(k_ext + pad_cols) < (k_ext - 1 if use_bias else k_ext)
    ).astype(U.dtype)[None, :]

    def sample(k_pos, k_neg, shape):
        pos_idx = jax.random.randint(k_pos, shape, 0, n)
        if neg_population is None:
            neg_items = jax.random.randint(k_neg, shape, 0, num_items)
        else:
            neg_pos = jax.random.randint(
                k_neg, shape, 0, neg_population.shape[0]
            )
            neg_items = neg_population[neg_pos]
        pr = pairs[pos_idx]  # one 8-byte row gather per draw
        return pr[..., 0], pr[..., 1], neg_items

    def epoch(e, carry):
        U, V, _, _ = carry
        # fold on the GLOBAL epoch index: the random stream is invariant to
        # how the host chunks epochs (verbose=1, checkpoint-every, resume)
        k_pos, k_neg = jax.random.split(jax.random.fold_in(key, epoch_offset + e))
        if not batched_sampling:
            users_e, pos_e, neg_e = sample(k_pos, k_neg, (n_total,))
            base_valid = (pos_e != neg_e) & pad_mask
            if not fused:
                observed = membership.query(users_e, neg_e)
                base_valid = ~observed & base_valid

        def body(b, carry):
            U, V, correct, skipped = carry
            if batched_sampling:
                u, i, j = sample(
                    jax.random.fold_in(k_pos, b),
                    jax.random.fold_in(k_neg, b),
                    (batch_size,),
                )
                padm = b * batch_size + jnp.arange(batch_size) < n
                m = (i != j) & padm
                if not fused:
                    m = ~membership.query(u, j) & m
            else:
                sl = lambda a: jax.lax.dynamic_slice(
                    a, (b * batch_size,), (batch_size,)
                )
                u, i, j, m = sl(users_e), sl(pos_e), sl(neg_e), sl(base_valid)
                padm = sl(pad_mask)

            if fused:
                ohu = jax.nn.one_hot(u, n_users, dtype=U.dtype)
                row = ohu @ U  # one MXU op: factors + membership halfwords
                wu, hw = row[:, :k_ext], row[:, k_ext:]
                selw = jax.nn.one_hot(j >> 4, n_words, dtype=U.dtype)
                word = jnp.sum(hw * selw, axis=1)
                bit = jnp.floor(word * jnp.exp2(-(j & 15).astype(U.dtype)))
                m = m & ((bit % 2.0) < 1.0)
            else:
                wu = U[u]
            mf = m.astype(U.dtype)

            vi, vj = V[i], V[j]
            x_uij = jnp.sum(wu * (vi - vj), axis=1)  # bias rides in col k
            if variant == "hinge":
                # max-margin (MMMF, recom_mmmf.pyx:144-159): update only
                # misordered pairs, with unit magnitude and no reg otherwise
                upd = mf * (x_uij <= 0)
                z = upd
            else:
                upd = mf
                z = mf / (1.0 + jnp.exp(x_uij))  # d(-ln sigma(x))/dx

            correct = correct + jnp.sum((x_uij > 0) & m)
            skipped = skipped + jnp.sum(padm & ~m)

            dU = (z[:, None] * (vi - vj) - reg * wu * upd[:, None]) * u_col_gate
            dVi = z[:, None] * wu - reg * vi * upd[:, None]
            dVj = -z[:, None] * wu - reg * vj * upd[:, None]

            if fused:
                # zero columns keep the membership halfwords frozen; the
                # fetch's one-hot is reused for the update
                dUT = jnp.pad(dU, ((0, 0), (0, n_words)))
                U = U + jnp.tensordot(ohu, lr * dUT, axes=((0,), (0,)))
            else:
                # deterministic grouped accumulation; strategy picked by
                # table-vs-batch shape (ops/accumulate.py)
                U = accumulate_rows(U, u, lr * dU)
            ij = jnp.concatenate([i, j])
            dV = jnp.concatenate([dVi, dVj])
            V = accumulate_rows(V, ij, lr * dV)
            return U, V, correct, skipped

        return jax.lax.fori_loop(
            0, n_batches, body, (U, V, jnp.int32(0), jnp.int32(0))
        )

    U, V, correct, skipped = jax.lax.fori_loop(
        0, n_epochs, epoch, (U, V, jnp.int32(0), jnp.int32(0))
    )
    if fused or pad_cols:
        U = U[:, :k_ext]
    if pad_cols:
        V = V[:, :k_ext]
    if use_bias:
        Bi = V[:, -1]
        U, V = U[:, :-1], V[:, :-1]
    return U, V, Bi, correct, skipped


def _membership_halfwords(csr_matrix, n_words):
    """(n_users, n_words) f32 table of 16-bit membership bitmap halfwords
    (values <= 65535, exact in f32) — columns for the fused fetch."""
    n_users = csr_matrix.shape[0]
    rows = np.repeat(
        np.arange(n_users, dtype=np.int64), np.diff(csr_matrix.indptr)
    )
    cols = csr_matrix.indices
    words = np.zeros((n_users, n_words), np.int32)
    np.bitwise_or.at(
        words, (rows, cols >> 4), np.int32(1) << (cols & 15).astype(np.int32)
    )
    return words.astype(np.float32)


@jax.jit
def _dot_scores(U, V, Bi, users):
    return Bi[None, :] + U[users] @ V.T


class BPR(Recommender, ANNMixin):
    """BPR with deterministic batched SGD on device.

    Parameters mirror the reference: ``k``, ``max_iter``, ``learning_rate``,
    ``lambda_reg``, ``use_bias``, ``init_params`` ({'U','V','Bi'}), ``seed``.
    ``batch_size`` controls the on-device minibatch width.

    ``mesh`` (framework extension, no reference analogue): a
    ``jax.sharding.Mesh`` with a ``model`` axis. The factor tables are
    row-sharded over it and the whole multi-epoch program runs under GSPMD —
    XLA partitions the one-hot update matmuls across chips and inserts the
    collectives. Semantics are identical to single-chip training.
    """

    def __init__(
        self,
        name="BPR",
        k=10,
        max_iter=100,
        learning_rate=0.001,
        lambda_reg=0.01,
        use_bias=True,
        num_threads=0,
        batch_size=1024,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.k = int(k)
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.lambda_reg = lambda_reg
        self.use_bias = use_bias
        # reference OpenMP knob (recom_bpr.pyx:129-137); no host threading
        # on TPU — accepted so reference scripts run unchanged
        self.num_threads = num_threads
        self.batch_size = batch_size
        self.seed = seed
        self.rng = get_rng(seed)

        self.init_params = {} if init_params is None else init_params
        self.u_factors = self.init_params.get("U", None)
        self.i_factors = self.init_params.get("V", None)
        self.i_biases = self.init_params.get("Bi", None)

    _variant = "bpr"

    def _init(self):
        # full-table init over total entities: unknown users/items keep
        # their initial vectors, matching reference recom_bpr.pyx:145-152
        n_users, n_items = self.total_users, self.total_items
        if self.u_factors is None:
            self.u_factors = (
                uniform((n_users, self.k), random_state=self.rng, dtype=DTYPE) - 0.5
            ) / self.k
        if self.i_factors is None:
            self.i_factors = (
                uniform((n_items, self.k), random_state=self.rng, dtype=DTYPE) - 0.5
            ) / self.k
        if self.i_biases is None or self.use_bias is False:
            self.i_biases = zeros(n_items, dtype=DTYPE)

    def _neg_population(self, train_set):
        """Device array of candidate negatives, or None for uniform."""
        return None

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        self._init()
        if not self.trainable:
            return self

        rid, cid, _ = train_set.uir_tuple
        # (|R|, 2) packed positive pairs: one 8-byte row gather per draw
        pairs_d = jnp.asarray(
            np.stack(
                [np.asarray(rid, np.int32), np.asarray(cid, np.int32)], axis=1
            )
        )
        membership = build_membership(train_set.csr_matrix)
        neg_pop = self._neg_population(train_set)

        # gather-elimination gate (single-device only; the mesh path keeps
        # the general form). See _bpr_epochs docstring for the measured win.
        # Results are deterministic either way but the two program shapes
        # are not bit-identical (XLA reassociates fused reductions);
        # ``fused_fetch=False`` forces the general form for exact
        # comparisons (e.g. the mesh-equals-single-device tests).
        W16 = None
        if self.mesh is None and getattr(self, "fused_fetch", True):
            n_words = (train_set.num_items + 15) // 16
            k_cols = self.k + (1 if self.use_bias else 0)
            # the fused fetch is an (B x n_users) @ (n_users x cols) MXU op:
            # its cost scales with n_users, the gathers it replaces don't.
            # Measured: wins at 943 users (ML-100K), loses at 6040 (ML-1M).
            if (
                train_set.num_users <= _FUSED_MAX_USERS
                and k_cols + n_words <= _FUSED_MAX_COLS
                and train_set.num_users * n_words * 4 <= _FUSED_MAX_TABLE_BYTES
            ):
                W16 = jnp.asarray(
                    _membership_halfwords(train_set.csr_matrix, n_words)
                )

        U = jnp.asarray(self.u_factors)
        V = jnp.asarray(self.i_factors)
        Bi = jnp.asarray(self.i_biases)

        n_u, n_i = U.shape[0], V.shape[0]
        if self.mesh is not None:
            from ..parallel import replicate_all, shard_tables

            U, V, Bi = shard_tables(self.mesh, U, V, Bi)
            pairs_d, membership, neg_pop = replicate_all(
                self.mesh, pairs_d, membership, neg_pop
            )

        base_key = jax.random.PRNGKey(self.rng.randint(2**31))
        n = len(rid)

        def run_chunk(state, start, e):
            U, V, Bi = state
            U, V, Bi, correct, skipped = _bpr_epochs(
                U,
                V,
                Bi,
                base_key,
                pairs_d,
                membership,
                neg_pop,
                jnp.float32(self.learning_rate),
                jnp.float32(self.lambda_reg),
                batch_size=min(self.batch_size, n),
                use_bias=self.use_bias,
                num_items=train_set.num_items,
                n_epochs=e,
                epoch_offset=start,
                variant=self._variant,
                W16=W16,
            )
            return (U, V, Bi), (correct, skipped)

        def report(done, info):
            correct, skipped = int(info[0]), int(info[1])
            print(
                "Epoch %d/%d, correct: %.2f%%, skipped: %.2f%%"
                % (
                    done,
                    self.max_iter,
                    100.0 * correct / (n - skipped + 1e-8),
                    100.0 * skipped / n,
                )
            )

        place = None
        if self.mesh is not None:
            from ..parallel import shard_tables

            place = lambda s: shard_tables(
                self.mesh, *(jnp.asarray(x) for x in s)
            )

        U, V, Bi = epoch_loop(
            self, self.max_iter, run_chunk, (U, V, Bi), on_report=report,
            place=place,
        )

        self.u_factors = np.asarray(U)[:n_u]
        self.i_factors = np.asarray(V)[:n_i]
        self.i_biases = np.asarray(Bi)[:n_i]

        if self.verbose:
            print("Optimization finished!")

        return self

    # ------------------------------------------------------------------ #
    # scoring
    # ------------------------------------------------------------------ #
    def score(self, user_idx, item_idx=None):
        if item_idx is None:
            return self.i_biases + self.i_factors @ self.u_factors[user_idx]
        return self.i_biases[item_idx] + np.dot(
            self.u_factors[user_idx], self.i_factors[item_idx]
        )

    def score_batch(self, user_indices):
        scores = _dot_scores(
            jnp.asarray(self.u_factors),
            jnp.asarray(self.i_factors),
            jnp.asarray(self.i_biases),
            jnp.asarray(np.asarray(user_indices), dtype=jnp.int32),
        )
        return np.asarray(scores, dtype=np.float64)

    def score_batch_device(self, user_indices):
        return _dot_scores(
            jnp.asarray(self.u_factors),
            jnp.asarray(self.i_factors),
            jnp.asarray(self.i_biases),
            jnp.asarray(np.asarray(user_indices), dtype=jnp.int32),
        )

    def score_pairs(self, user_indices, item_indices):
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        return self.i_biases[items] + np.sum(
            self.u_factors[users] * self.i_factors[items], axis=1
        )

    # ------------------------------------------------------------------ #
    # ANN vectors
    # ------------------------------------------------------------------ #
    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return np.concatenate(
            (self.u_factors, np.ones([self.u_factors.shape[0], 1])), axis=1
        )

    def get_item_vectors(self):
        return np.concatenate(
            (self.i_factors, self.i_biases.reshape((-1, 1))), axis=1
        )


class WBPR(BPR):
    """Weighted BPR (Gantner et al.): negatives sampled by popularity
    (reference ``models/bpr/recom_wbpr.pyx:32``)."""

    def __init__(
        self,
        name="WBPR",
        k=10,
        max_iter=100,
        learning_rate=0.001,
        lambda_reg=0.01,
        use_bias=True,
        num_threads=0,
        batch_size=1024,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name,
            k=k,
            max_iter=max_iter,
            learning_rate=learning_rate,
            lambda_reg=lambda_reg,
            use_bias=use_bias,
            num_threads=num_threads,
            batch_size=batch_size,
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
            mesh=mesh,
        )

    def _neg_population(self, train_set):
        # sampling uniformly from the interaction item array == sampling
        # items proportionally to their train-set frequency
        return jnp.asarray(train_set.uir_tuple[1], dtype=jnp.int32)
