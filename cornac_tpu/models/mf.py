"""MF — biased Matrix Factorization (Koren et al., 2009).

Capability parity with reference ``cornac/models/mf/recom_mf.py:32`` +
``backend_cpu.pyx:20-120`` (Cython/OpenMP hogwild SGD), redesigned for TPU:

- Training is one jit-compiled multi-epoch program: ``lax.fori_loop`` over
  epochs, each a ``lax.fori_loop`` over fixed-size minibatches of observed
  ratings (gather factor rows → elementwise error → grouped row updates).
  One compilation, whole fit on device, deterministic (no hogwild races;
  reference needed ``num_threads=1`` for determinism, ``recom_mf.py``
  docstring). ``verbose``/``early_stop``/checkpointing chunk the program
  per-epoch on the host without changing results (per-epoch randomness is
  keyed on the global epoch index).
- Epoch order is a fresh device-side ``jax.random.permutation`` per epoch
  (the reference CPU kernel iterates in data order; minibatch shuffling is
  standard SGD and changes results only within seed variance).
- ``score_batch`` is one device matmul over the item-factor table —
  this is what the batched eval harness calls.

SVD (reference ``models/svd/recom_svd.py:20``) is MF fitted on mean-centered
ratings; see :class:`SVD` below.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..ops.accumulate import accumulate_rows
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.init_utils import normal, zeros
from .recommender import ANNMixin, MEASURE_DOT, Recommender

DTYPE = np.float32


@partial(
    jax.jit,
    static_argnames=("batch_size", "use_bias"),
    donate_argnums=(0, 1, 2, 3),
)
def _mf_sgd_epochs(
    U, V, Bu, Bi, key, mask, rid, cid, val, lr, reg, mu, batch_size,
    use_bias, n_epochs, epoch_offset,
):
    """``n_epochs`` SGD epochs over all observed ratings in one compiled
    program. Each epoch visits every rating once in a fresh device-side
    permutation keyed on the GLOBAL epoch index (``epoch_offset + e``), so
    results are invariant to how the host chunks epochs (verbose /
    early-stop / checkpoint-resume). Returns the last epoch's loss.

    TPU specifics (same finding as ``bpr._bpr_epochs``): biases ride as
    extra factor columns (U gains [Bu, 1], V gains [1, Bi]) so the whole
    update is two one-hot matmuls on the MXU — XLA's scatter-add lowering
    is ~2.3x slower at these narrow factor widths."""
    n = rid.shape[0]
    n_total = mask.shape[0]
    n_batches = n_total // batch_size
    n_users, n_items = U.shape[0], V.shape[0]
    k = U.shape[1]

    if use_bias:
        ones_u = jnp.ones((n_users, 1), U.dtype)
        ones_i = jnp.ones((n_items, 1), V.dtype)
        U = jnp.concatenate([U, Bu[:, None], ones_u], axis=1)
        V = jnp.concatenate([V, ones_i, Bi[:, None]], axis=1)
        # frozen columns: U's ones (last), V's ones (second-to-last)
        u_gate = jnp.asarray([1.0] * (k + 1) + [0.0], U.dtype)[None, :]
        v_gate = jnp.asarray([1.0] * k + [0.0, 1.0], V.dtype)[None, :]
    else:
        u_gate = v_gate = jnp.ones((1, k), U.dtype)
    # fast-row-gather layout (same measured cliff as bpr._bpr_epochs):
    # pad columns to a 256-byte multiple; padded columns are zero, their
    # updates are zero, and sums over them add exact +0.0
    pad_cols = (-U.shape[1]) % 64
    if pad_cols:
        zpad = jnp.zeros((1, pad_cols), U.dtype)
        U = jnp.pad(U, ((0, 0), (0, pad_cols)))
        V = jnp.pad(V, ((0, 0), (0, pad_cols)))
        u_gate = jnp.concatenate([u_gate, zpad], axis=1)
        v_gate = jnp.concatenate([v_gate, zpad], axis=1)
    # one (|R|, 2) row gather per draw instead of two thin gathers
    pairs = jnp.stack([rid, cid], axis=1)

    def epoch(e, carry):
        U, V, _ = carry
        perm = jax.random.permutation(
            jax.random.fold_in(key, epoch_offset + e), n
        ).astype(jnp.int32)
        perm = jnp.concatenate(
            [perm, jnp.zeros((n_total - n,), jnp.int32)]
        )

        def body(b, carry):
            U, V, loss = carry
            idx = jax.lax.dynamic_slice(perm, (b * batch_size,), (batch_size,))
            m = jax.lax.dynamic_slice(mask, (b * batch_size,), (batch_size,))
            pr = pairs[idx]
            u, i, r = pr[:, 0], pr[:, 1], val[idx]
            pu, qi = U[u], V[i]
            pred = jnp.sum(pu * qi, axis=1)
            if use_bias:
                pred = pred + mu
            err = (r - pred) * m
            loss = loss + jnp.sum(err * err)
            dU = (err[:, None] * qi - reg * pu * m[:, None]) * u_gate
            dV = (err[:, None] * pu - reg * qi * m[:, None]) * v_gate
            U = accumulate_rows(U, u, lr * dU)
            V = accumulate_rows(V, i, lr * dV)
            return U, V, loss

        return jax.lax.fori_loop(
            0, n_batches, body, (U, V, jnp.float32(0.0))
        )

    U, V, loss = jax.lax.fori_loop(
        0, n_epochs, epoch, (U, V, jnp.float32(0.0))
    )
    if use_bias:
        Bu, Bi = U[:, k], V[:, k + 1]
    U, V = U[:, :k], V[:, :k]
    return U, V, Bu, Bi, 0.5 * loss


def _make_optimizer(name, lr):
    import optax

    makers = {
        "sgd": optax.sgd,
        "adam": optax.adam,
        "rmsprop": optax.rmsprop,
        "adagrad": optax.adagrad,
    }
    if name not in makers:
        raise ValueError(
            f"optimizer must be one of {sorted(makers)}, got {name!r}"
        )
    return makers[name](lr)


@partial(
    jax.jit,
    static_argnames=("batch_size", "use_bias", "optimizer", "dropout", "lr"),
    donate_argnums=(0, 1),
)
def _mf_optax_epochs(
    params,
    opt_state,
    mask,
    rid,
    cid,
    val,
    reg,
    mu,
    key,
    batch_size,
    use_bias,
    optimizer,
    dropout,
    lr,
    n_epochs,
    epoch_offset,
):
    """General-optimizer multi-epoch program (reference torch backend
    parity, ``mf/backend_pt.py:29-104``): per minibatch, autodiff through
    the gathered-row prediction (XLA turns the gather's backward into the
    same deterministic scatter-add), optax update, optional embedding
    dropout. Epoch order and dropout keys derive from the global epoch
    index so host chunking doesn't change results."""
    import optax

    opt = _make_optimizer(optimizer, lr)
    n = rid.shape[0]
    n_total = mask.shape[0]
    n_batches = n_total // batch_size

    def epoch(e, carry):
        params, opt_state, _ = carry
        ekey = jax.random.fold_in(key, epoch_offset + e)
        perm = jax.random.permutation(ekey, n).astype(jnp.int32)
        perm = jnp.concatenate([perm, jnp.zeros((n_total - n,), jnp.int32)])

        def body(b, carry):
            params, opt_state, loss_sum = carry
            idx = jax.lax.dynamic_slice(perm, (b * batch_size,), (batch_size,))
            m = jax.lax.dynamic_slice(mask, (b * batch_size,), (batch_size,))
            u, i, r = rid[idx], cid[idx], val[idx]

            def loss_fn(p):
                pu, qi = p["U"][u], p["V"][i]
                if dropout > 0.0:
                    kb = jax.random.fold_in(ekey, b)
                    ku, ki = jax.random.split(kb)
                    keep = 1.0 - dropout
                    pu = pu * jax.random.bernoulli(ku, keep, pu.shape) / keep
                    qi = qi * jax.random.bernoulli(ki, keep, qi.shape) / keep
                pred = jnp.sum(pu * qi, axis=1)
                if use_bias:
                    pred = pred + mu + p["Bu"][u] + p["Bi"][i]
                err = (r - pred) * m
                reg_term = reg * (
                    jnp.sum(jnp.square(p["U"][u]) * m[:, None])
                    + jnp.sum(jnp.square(p["V"][i]) * m[:, None])
                )
                return 0.5 * jnp.sum(err * err) + 0.5 * reg_term

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_sum + loss

        return jax.lax.fori_loop(
            0, n_batches, body, (params, opt_state, jnp.float32(0.0))
        )

    return jax.lax.fori_loop(
        0, n_epochs, epoch, (params, opt_state, jnp.float32(0.0))
    )


@jax.jit
def _mf_scores(U, V, Bu, Bi, mu, users, known_mask):
    """(B, num_items) score matrix: mu + Bu + Bi + U V^T on the MXU.
    Unknown users (mask 0) contribute no personal term, matching reference
    ``recom_mf.py:273-284``."""
    pu = U[users] * known_mask[:, None]
    bu = Bu[users] * known_mask
    return mu + bu[:, None] + Bi[None, :] + pu @ V.T


class MF(Recommender, ANNMixin):
    """Biased MF trained with deterministic minibatch SGD on device.

    Parameters mirror the reference: ``k`` factors, ``max_iter`` epochs,
    ``learning_rate``, ``lambda_reg``, ``use_bias``, ``early_stop`` (stop on
    small delta-loss), ``init_params`` ({'U','V','Bu','Bi'}), ``seed``.
    """

    def __init__(
        self,
        name="MF",
        k=10,
        backend="cpu",
        optimizer="sgd",
        max_iter=20,
        learning_rate=0.01,
        batch_size=256,
        lambda_reg=0.02,
        dropout=0.0,
        use_bias=True,
        early_stop=False,
        num_threads=0,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.k = k
        # reference backend selector (recom_mf.py:96,178-183); every value
        # runs the same TPU path here but unknown ones still error for parity
        if backend not in ("cpu", "pytorch", "tpu"):
            raise ValueError(f"{backend} is not supported")
        self.backend = backend
        self.optimizer = optimizer
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.batch_size = batch_size
        self.lambda_reg = lambda_reg
        self.dropout = dropout
        self.use_bias = use_bias
        self.early_stop = early_stop
        self.num_threads = num_threads  # no-op: no host threading on TPU
        self.seed = seed

        self.init_params = {} if init_params is None else init_params
        self.u_factors = self.init_params.get("U", None)
        self.i_factors = self.init_params.get("V", None)
        self.u_biases = self.init_params.get("Bu", None)
        self.i_biases = self.init_params.get("Bi", None)

    def _init(self):
        rng = get_rng(self.seed)
        if self.u_factors is None:
            self.u_factors = normal(
                [self.num_users, self.k], std=0.01, random_state=rng, dtype=DTYPE
            )
        if self.i_factors is None:
            self.i_factors = normal(
                [self.num_items, self.k], std=0.01, random_state=rng, dtype=DTYPE
            )
        if self.u_biases is None:
            self.u_biases = zeros(self.num_users, dtype=DTYPE)
        if self.i_biases is None:
            self.i_biases = zeros(self.num_items, dtype=DTYPE)
        self.global_mean = np.dtype(DTYPE).type(
            self.global_mean if self.use_bias else 0.0
        )

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        self._init()
        if self.trainable:
            self._fit_tpu(train_set)
        return self

    def _fit_tpu(self, train_set):
        rng = get_rng(self.seed)
        rid, cid, val = train_set.uir_tuple
        n = len(val)
        bsz = min(self.batch_size, n)
        n_pad = (-n) % bsz

        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        val_d = jnp.asarray(val, dtype=jnp.float32)
        mask_h = np.concatenate([np.ones(n, DTYPE), np.zeros(n_pad, DTYPE)])

        U = jnp.asarray(self.u_factors)
        V = jnp.asarray(self.i_factors)
        Bu = jnp.asarray(self.u_biases)
        Bi = jnp.asarray(self.i_biases)

        n_u, n_i = U.shape[0], V.shape[0]
        if self.mesh is not None:
            # GSPMD: row-shard the tables over the mesh model axis (rows
            # padded to the shard multiple; padded rows are never sampled
            # and are sliced off below), replicate the rating arrays
            from ..parallel import replicate_all, shard_tables

            U, V, Bu, Bi = shard_tables(self.mesh, U, V, Bu, Bi)
            rid_d, cid_d, val_d = replicate_all(self.mesh, rid_d, cid_d, val_d)

        if self.optimizer != "sgd" or self.dropout > 0.0:
            self._fit_optax(rng, rid_d, cid_d, val_d, mask_h, U, V, Bu, Bi, n, bsz, n_pad, n_u, n_i)
            return

        key = jax.random.PRNGKey(rng.randint(2**31))
        mask_d = jnp.asarray(mask_h)
        last = {"loss": None}

        def run_chunk(state, start, e):
            U, V, Bu, Bi = state
            U, V, Bu, Bi, loss = _mf_sgd_epochs(
                U,
                V,
                Bu,
                Bi,
                key,
                mask_d,
                rid_d,
                cid_d,
                val_d,
                jnp.float32(self.learning_rate),
                jnp.float32(self.lambda_reg),
                jnp.float32(self.global_mean),
                batch_size=bsz,
                use_bias=self.use_bias,
                n_epochs=e,
                epoch_offset=start,
            )
            return (U, V, Bu, Bi), self._epoch_info(loss, last)

        place = None
        if self.mesh is not None:
            from ..parallel import shard_tables

            place = lambda s: shard_tables(
                self.mesh, *(jnp.asarray(x) for x in s)
            )

        U, V, Bu, Bi = epoch_loop(
            self,
            self.max_iter,
            run_chunk,
            (U, V, Bu, Bi),
            on_report=self._report,
            place=place,
            max_chunk=1 if self.early_stop else None,
        )

        self.u_factors = np.asarray(U)[:n_u]
        self.i_factors = np.asarray(V)[:n_i]
        self.u_biases = np.asarray(Bu)[:n_u]
        self.i_biases = np.asarray(Bi)[:n_i]

    def _epoch_info(self, loss, last):
        """Early-stop bookkeeping shared by both optimizer paths: compare
        this chunk's loss against the previous one on the host (reference
        ``recom_mf.py`` delta-loss rule)."""
        info = {"loss": loss}
        if self.early_stop:
            l = float(loss)
            if last["loss"] is not None and abs(l - last["loss"]) < 1e-5:
                info["stop"] = True
                info["delta"] = l - last["loss"]
            last["loss"] = l
        return info

    def _report(self, done, info):
        print("Epoch %d/%d, loss = %.2f" % (done, self.max_iter, float(info["loss"])))
        if info.get("stop"):
            print("Early stopping, delta_loss = %.4f" % info["delta"])

    def _fit_optax(
        self, rng, rid_d, cid_d, val_d, mask_h, U, V, Bu, Bi, n, bsz, n_pad, n_u, n_i
    ):
        """Non-SGD optimizers and/or embedding dropout (reference torch
        backend, ``mf/backend_pt.py``)."""
        params = {"U": U, "V": V, "Bu": Bu, "Bi": Bi}
        opt_state = _make_optimizer(self.optimizer, self.learning_rate).init(
            params
        )
        key = jax.random.PRNGKey(rng.randint(2**31))
        mask_d = jnp.asarray(mask_h)
        last = {"loss": None}

        def run_chunk(state, start, e):
            params, opt_state = state
            params, opt_state, loss = _mf_optax_epochs(
                params,
                opt_state,
                mask_d,
                rid_d,
                cid_d,
                val_d,
                jnp.float32(self.lambda_reg),
                jnp.float32(self.global_mean),
                key,
                batch_size=bsz,
                use_bias=self.use_bias,
                optimizer=self.optimizer,
                dropout=float(self.dropout),
                lr=float(self.learning_rate),
                n_epochs=e,
                epoch_offset=start,
            )
            return (params, opt_state), self._epoch_info(loss, last)

        place = None
        if self.mesh is not None:
            from ..parallel import replicate_all

            place = lambda s: replicate_all(
                self.mesh, *jax.tree_util.tree_map(jnp.asarray, s)
            )

        params, opt_state = epoch_loop(
            self,
            self.max_iter,
            run_chunk,
            (params, opt_state),
            on_report=self._report,
            place=place,
            max_chunk=1 if self.early_stop else None,
        )

        self.u_factors = np.asarray(params["U"])[:n_u]
        self.i_factors = np.asarray(params["V"])[:n_i]
        self.u_biases = np.asarray(params["Bu"])[:n_u]
        self.i_biases = np.asarray(params["Bi"])[:n_i]

    # ------------------------------------------------------------------ #
    # scoring
    # ------------------------------------------------------------------ #
    def score(self, user_idx, item_idx=None):
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        if item_idx is None:
            known_item_scores = self.global_mean + self.i_biases.astype(np.float64)
            if self.knows_user(user_idx):
                known_item_scores = known_item_scores + self.u_biases[user_idx]
                known_item_scores = known_item_scores + self.i_factors @ self.u_factors[
                    user_idx
                ]
            return known_item_scores

        item_score = self.global_mean + self.i_biases[item_idx]
        if self.knows_user(user_idx):
            item_score += self.u_biases[user_idx]
            item_score += self.u_factors[user_idx].dot(self.i_factors[item_idx])
        return item_score

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = _mf_scores(
            jnp.asarray(self.u_factors),
            jnp.asarray(self.i_factors),
            jnp.asarray(self.u_biases),
            jnp.asarray(self.i_biases),
            jnp.float32(self.global_mean),
            jnp.asarray(np.where(known, users, 0), dtype=jnp.int32),
            jnp.asarray(known.astype(DTYPE)),
        )
        scores = np.asarray(scores, dtype=np.float64)
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores

    def score_batch_device(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        return _mf_scores(
            jnp.asarray(self.u_factors),
            jnp.asarray(self.i_factors),
            jnp.asarray(self.u_biases),
            jnp.asarray(self.i_biases),
            jnp.float32(self.global_mean),
            jnp.asarray(np.where(known, users, 0), dtype=jnp.int32),
            jnp.asarray(known.astype(DTYPE)),
        )

    def score_pairs(self, user_indices, item_indices):
        # mirrors score()/rate(): unknown item -> default score (global mean);
        # unknown user -> mu + item bias; known pair -> full biased dot
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        known_u = (users >= 0) & (users < self.num_users)
        known_i = (items >= 0) & (items < self.num_items)
        u_safe = np.where(known_u, users, 0)
        i_safe = np.where(known_i, items, 0)
        personal = self.u_biases[u_safe] + np.sum(
            self.u_factors[u_safe] * self.i_factors[i_safe], axis=1
        )
        scores = (
            float(self.global_mean)
            + self.i_biases[i_safe]
            + np.where(known_u, personal, 0.0)
        )
        return np.where(known_i, scores, float(self.global_mean))

    # ------------------------------------------------------------------ #
    # ANN vectors
    # ------------------------------------------------------------------ #
    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        user_vectors = self.u_factors
        if self.use_bias:
            user_vectors = np.concatenate(
                (user_vectors, np.ones([user_vectors.shape[0], 1])), axis=1
            )
        return user_vectors

    def get_item_vectors(self):
        item_vectors = self.i_factors
        if self.use_bias:
            item_vectors = np.concatenate(
                (item_vectors, self.i_biases.reshape((-1, 1))), axis=1
            )
        return item_vectors


class SVD(MF):
    """SVD-style MF (reference ``models/svd/recom_svd.py:20`` delegates to MF
    with biases enabled; kept as a named alias for API parity)."""

    def __init__(
        self,
        name="SVD",
        k=10,
        max_iter=20,
        learning_rate=0.01,
        batch_size=256,
        lambda_reg=0.02,
        early_stop=False,
        num_threads=0,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
    ):
        super().__init__(
            name=name,
            k=k,
            max_iter=max_iter,
            learning_rate=learning_rate,
            batch_size=batch_size,
            lambda_reg=lambda_reg,
            use_bias=True,
            early_stop=early_stop,
            num_threads=num_threads,
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
        )
