"""PMF — Probabilistic Matrix Factorization (Mnih & Salakhutdinov, NIPS 2008).

Capability parity with reference ``cornac/models/pmf/recom_pmf.py:25`` +
``cython/pmf.pyx`` (single-thread RMSProp SGD over ratings; linear and
non-linear/sigmoid variants). TPU redesign: minibatched RMSProp epoch under
jit — gather rows of (U, V, cache_u, cache_v), compute masked gradients,
scatter-add updates — identical math per sample, deterministic.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.common import scale, sigmoid
from ..utils.init_utils import normal
from .recommender import ANNMixin, MEASURE_DOT, Recommender


@partial(
    jax.jit,
    static_argnames=("batch_size", "non_linear"),
    donate_argnums=(0, 1, 2, 3),
)
def _pmf_epochs(
    U, V, cache_u, cache_v, key, mask, rid, cid, val, lr, reg, gamma,
    batch_size, non_linear, n_epochs, epoch_offset,
):
    """``n_epochs`` RMSProp SGD epochs over observed ratings in one compiled
    program; per-epoch shuffles are device-side permutations keyed on the
    global epoch index (chunk-invariant -> checkpoint/resume safe)."""
    eps = 1e-8
    n = rid.shape[0]
    n_total = mask.shape[0]
    n_batches = n_total // batch_size
    k = U.shape[1]
    # fast-row-gather layout (see bpr._bpr_epochs): pad all four row-
    # addressed tables to 256-byte-multiple widths; padded columns stay
    # exactly zero (zero grads -> zero cache -> zero updates)
    pad_cols = (-k) % 64
    if pad_cols:
        pc = ((0, 0), (0, pad_cols))
        U, V = jnp.pad(U, pc), jnp.pad(V, pc)
        cache_u, cache_v = jnp.pad(cache_u, pc), jnp.pad(cache_v, pc)
    pairs = jnp.stack([rid, cid], axis=1)

    def body(perm, b, carry):
        U, V, cache_u, cache_v, loss = carry
        idx = jax.lax.dynamic_slice(perm, (b * batch_size,), (batch_size,))
        m = jax.lax.dynamic_slice(mask, (b * batch_size,), (batch_size,))
        pr = pairs[idx]
        u, i, r = pr[:, 0], pr[:, 1], val[idx]
        pu, qi = U[u], V[i]
        s = jnp.sum(pu * qi, axis=1)
        if non_linear:
            sg = jax.nn.sigmoid(jnp.clip(s, -6.0, 6.0))
            e = r - sg
            we = e * sg * (1.0 - sg)
        else:
            e = r - s
            we = e
        we = we * m
        loss = loss + jnp.sum(
            (e * e + reg * (jnp.sum(pu * pu, axis=1) + jnp.sum(qi * qi, axis=1))) * m
        )

        gu = we[:, None] * qi - reg * pu * m[:, None]
        gv = we[:, None] * pu - reg * qi * m[:, None]

        cu = gamma * cache_u[u] + (1 - gamma) * gu * gu
        cv = gamma * cache_v[i] + (1 - gamma) * gv * gv
        cache_u = cache_u.at[u].set(jnp.where(m[:, None] > 0, cu, cache_u[u]))
        cache_v = cache_v.at[i].set(jnp.where(m[:, None] > 0, cv, cache_v[i]))

        U = U.at[u].add(lr * gu / (jnp.sqrt(cu) + eps) * m[:, None])
        V = V.at[i].add(lr * gv / (jnp.sqrt(cv) + eps) * m[:, None])
        return U, V, cache_u, cache_v, loss

    def epoch(e, carry):
        U, V, cache_u, cache_v, _ = carry
        perm = jax.random.permutation(
            jax.random.fold_in(key, epoch_offset + e), n
        ).astype(jnp.int32)
        perm = jnp.concatenate([perm, jnp.zeros((n_total - n,), jnp.int32)])
        return jax.lax.fori_loop(
            0,
            n_batches,
            partial(body, perm),
            (U, V, cache_u, cache_v, jnp.float32(0.0)),
        )

    U, V, cache_u, cache_v, loss = jax.lax.fori_loop(
        0, n_epochs, epoch, (U, V, cache_u, cache_v, jnp.float32(0.0))
    )
    if pad_cols:
        U, V = U[:, :k], V[:, :k]
        cache_u, cache_v = cache_u[:, :k], cache_v[:, :k]
    return U, V, cache_u, cache_v, loss


@jax.jit
def _pmf_scores(U, V, users):
    return U[users] @ V.T


class PMF(Recommender, ANNMixin):
    """PMF with RMSProp minibatch SGD on device.

    ``variant='non_linear'`` passes the Gaussian mean through a sigmoid and
    rescales ratings to [0, 1] for training (reference
    ``recom_pmf.py:131-135``).
    """

    def __init__(
        self,
        k=5,
        max_iter=100,
        learning_rate=0.001,
        gamma=0.9,
        lambda_reg=0.001,
        name="PMF",
        variant="non_linear",
        batch_size=1024,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.k = k
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.gamma = gamma
        self.lambda_reg = lambda_reg
        self.variant = variant
        self.batch_size = batch_size
        self.seed = seed

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.V = self.init_params.get("V", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set)

        if not self.trainable:
            return self

        if self.variant not in ("linear", "non_linear"):
            raise ValueError('variant must be one of {"linear","non_linear"}')

        rng = get_rng(self.seed)
        if self.U is None:
            self.U = normal(
                (self.num_users, self.k), std=0.001, random_state=rng, dtype=np.float64
            )
        if self.V is None:
            self.V = normal(
                (self.num_items, self.k), std=0.001, random_state=rng, dtype=np.float64
            )

        uid, iid, rat = train_set.uir_tuple
        rat = np.asarray(rat, dtype=np.float32)
        if self.variant == "non_linear" and [self.min_rating, self.max_rating] != [0, 1]:
            rat = scale(rat, 0.0, 1.0, self.min_rating, self.max_rating)

        n = len(rat)
        bsz = min(self.batch_size, n)
        n_pad = (-n) % bsz

        rid_d = jnp.asarray(uid, dtype=jnp.int32)
        cid_d = jnp.asarray(iid, dtype=jnp.int32)
        val_d = jnp.asarray(rat, dtype=jnp.float32)
        mask_h = jnp.asarray(
            np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
        )

        U = jnp.asarray(self.U, dtype=jnp.float32)
        V = jnp.asarray(self.V, dtype=jnp.float32)
        n_u, n_i = U.shape[0], V.shape[0]
        if self.mesh is not None:
            # row-shard tables + RMSProp caches over the model axis (SURVEY
            # §2.4); padded rows are never indexed and are sliced off below
            from ..parallel import replicate_all, shard_tables

            U, V = shard_tables(self.mesh, U, V)
            rid_d, cid_d, val_d, mask_h = replicate_all(
                self.mesh, rid_d, cid_d, val_d, mask_h
            )
        cache_u = jnp.zeros_like(U)
        cache_v = jnp.zeros_like(V)
        key = jax.random.PRNGKey(rng.randint(2**31))

        def run_chunk(state, start, e):
            U, V, cache_u, cache_v, loss = _pmf_epochs(
                *state,
                key,
                mask_h,
                rid_d,
                cid_d,
                val_d,
                jnp.float32(self.learning_rate),
                jnp.float32(self.lambda_reg),
                jnp.float32(self.gamma),
                batch_size=bsz,
                non_linear=(self.variant == "non_linear"),
                n_epochs=e,
                epoch_offset=start,
            )
            return (U, V, cache_u, cache_v), loss

        place = None
        if self.mesh is not None:
            from ..parallel import shard_tables

            place = lambda s: shard_tables(
                self.mesh, *(jnp.asarray(x) for x in s)
            )

        U, V, cache_u, cache_v = epoch_loop(
            self,
            self.max_iter,
            run_chunk,
            (U, V, cache_u, cache_v),
            on_report=lambda done, loss: print(
                "epoch %i, loss: %f" % (done - 1, float(loss))
            ),
            place=place,
        )

        self.U = np.asarray(U, dtype=np.float64)[:n_u]
        self.V = np.asarray(V, dtype=np.float64)[:n_i]
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        if item_idx is None:
            return self.V.dot(self.U[user_idx, :])

        user_pred = self.V[item_idx, :].dot(self.U[user_idx, :])
        if self.variant == "non_linear":
            user_pred = sigmoid(user_pred)
            user_pred = scale(user_pred, self.min_rating, self.max_rating, 0.0, 1.0)
        return user_pred

    def _known_scores_device(self, safe_users, known):
        return _pmf_scores(
            jnp.asarray(self.U, dtype=jnp.float32),
            jnp.asarray(self.V, dtype=jnp.float32),
            jnp.asarray(safe_users, dtype=jnp.int32),
        )

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = np.asarray(
            _pmf_scores(
                jnp.asarray(self.U, dtype=jnp.float32),
                jnp.asarray(self.V, dtype=jnp.float32),
                jnp.asarray(np.where(known, users, 0), dtype=jnp.int32),
            ),
            dtype=np.float64,
        )
        # cold-start users: flat default score row (reference falls back via
        # ScoreException in rank(), recommender.py:500-503)
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores

    def score_pairs(self, user_indices, item_indices):
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        known = (
            (users >= 0)
            & (users < self.num_users)
            & (items >= 0)
            & (items < self.num_items)
        )
        u_safe = np.where(known, users, 0)
        i_safe = np.where(known, items, 0)
        preds = np.sum(self.U[u_safe] * self.V[i_safe], axis=1)
        if self.variant == "non_linear":
            preds = scale(sigmoid(preds), self.min_rating, self.max_rating, 0.0, 1.0)
        return np.where(known, preds, self.default_score())

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return self.U

    def get_item_vectors(self):
        return self.V
