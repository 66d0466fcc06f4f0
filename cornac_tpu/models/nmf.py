"""NMF — Non-negative MF via multiplicative updates (Lee & Seung, 2001).

Capability parity with reference ``cornac/models/nmf/recom_nmf.pyx:37`` (a
single-thread Cython loop accumulating per-epoch numerators/denominators).
The multiplicative-update structure is embarrassingly parallel, so the TPU
version is a direct whole-epoch device computation: one gather+predict pass
over all observed ratings, scatter-add of the four accumulator tables, then
elementwise multiplicative updates — no minibatching, one jit call for the
entire fit (epoch loop via ``lax.fori_loop`` with a traced bound).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..utils import get_rng
from ..utils.init_utils import uniform, zeros
from .recommender import ANNMixin, MEASURE_DOT, Recommender


@partial(jax.jit, static_argnames=("use_bias",), donate_argnums=(0, 1, 2, 3))
def _nmf_fit(
    U,
    V,
    Bu,
    Bi,
    rid,
    cid,
    val,
    user_counts,
    item_counts,
    lr,
    lambda_u,
    lambda_v,
    lambda_bu,
    lambda_bi,
    mu,
    n_epochs,
    use_bias,
):
    """Full NMF training loop on device."""
    eps = 1e-9

    def epoch(_, carry):
        U, V, Bu, Bi = carry
        pu, qi = U[rid], V[cid]
        pred = jnp.sum(pu * qi, axis=1)
        if use_bias:
            pred = pred + mu + Bu[rid] + Bi[cid]
        err = val - pred

        if use_bias:
            Bu = Bu.at[rid].add(lr * (err - lambda_bu * Bu[rid]))
            Bi = Bi.at[cid].add(lr * (err - lambda_bi * Bi[cid]))

        U_num = jnp.zeros_like(U).at[rid].add(val[:, None] * qi)
        U_den = jnp.zeros_like(U).at[rid].add(pred[:, None] * qi)
        V_num = jnp.zeros_like(V).at[cid].add(val[:, None] * pu)
        V_den = jnp.zeros_like(V).at[cid].add(pred[:, None] * pu)

        U = U * U_num / (U_den + user_counts[:, None] * lambda_u * U + eps)
        V = V * V_num / (V_den + item_counts[:, None] * lambda_v * V + eps)
        return U, V, Bu, Bi

    return jax.lax.fori_loop(0, n_epochs, epoch, (U, V, Bu, Bi))


@jax.jit
def _nmf_scores(U, V, Bu, Bi, mu, users, known_mask):
    pu = U[users] * known_mask[:, None]
    bu = Bu[users] * known_mask
    return mu + bu[:, None] + Bi[None, :] + pu @ V.T


class NMF(Recommender, ANNMixin):
    """NMF with whole-epoch multiplicative updates on device.

    Parameters mirror the reference: ``k``, ``max_iter``, ``learning_rate``
    (biases only), per-table regularizers, ``use_bias``, ``init_params``
    ({'U','V','Bu','Bi','mu'}), ``seed``.
    """

    def __init__(
        self,
        name="NMF",
        k=15,
        max_iter=50,
        learning_rate=0.005,
        lambda_reg=0.0,
        lambda_u=0.06,
        lambda_v=0.06,
        lambda_bu=0.02,
        lambda_bi=0.02,
        use_bias=False,
        num_threads=0,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.num_threads = num_threads  # no-op: no host threading on TPU
        self.k = k
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.lambda_reg = lambda_reg
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.lambda_bu = lambda_bu
        self.lambda_bi = lambda_bi
        self.use_bias = use_bias
        self.seed = seed

        if self.lambda_reg > 0:
            self.lambda_u = self.lambda_reg
            self.lambda_v = self.lambda_reg
            self.lambda_bu = self.lambda_reg
            self.lambda_bi = self.lambda_reg

        self.init_params = {} if init_params is None else init_params
        self.u_factors = self.init_params.get("U", None)
        self.i_factors = self.init_params.get("V", None)
        self.u_biases = self.init_params.get("Bu", None)
        self.i_biases = self.init_params.get("Bi", None)
        self.global_mean_init = self.init_params.get("mu", None)

    def _init(self):
        rng = get_rng(self.seed)
        if self.u_factors is None:
            self.u_factors = uniform((self.num_users, self.k), random_state=rng)
        if self.i_factors is None:
            self.i_factors = uniform((self.num_items, self.k), random_state=rng)
        if self.u_biases is None:
            self.u_biases = zeros(self.num_users)
        if self.i_biases is None:
            self.i_biases = zeros(self.num_items)
        self.global_mean = (
            self.global_mean_init
            if self.global_mean_init is not None
            else self.global_mean
        ) if self.use_bias else 0.0

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        self._init()
        if not self.trainable:
            return self

        rid, cid, val = train_set.uir_tuple
        user_counts = np.zeros(self.num_users, np.float32)
        np.add.at(user_counts, rid, 1)
        item_counts = np.zeros(self.num_items, np.float32)
        np.add.at(item_counts, cid, 1)

        U0 = jnp.asarray(self.u_factors, dtype=jnp.float32)
        V0 = jnp.asarray(self.i_factors, dtype=jnp.float32)
        Bu0 = jnp.asarray(self.u_biases, dtype=jnp.float32)
        Bi0 = jnp.asarray(self.i_biases, dtype=jnp.float32)
        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        val_d = jnp.asarray(val, dtype=jnp.float32)
        ucnt_d = jnp.asarray(user_counts)
        icnt_d = jnp.asarray(item_counts)
        n_u, n_i = U0.shape[0], V0.shape[0]
        if self.mesh is not None:
            # multiplicative updates touch whole tables each epoch:
            # row-sharding both factor tables splits the epoch's matmul
            # accumulations across the model axis (counts stay row-aligned)
            from ..parallel import replicate_all, shard_tables

            U0, Bu0, ucnt_d = shard_tables(self.mesh, U0, Bu0, ucnt_d)
            V0, Bi0, icnt_d = shard_tables(self.mesh, V0, Bi0, icnt_d)
            rid_d, cid_d, val_d = replicate_all(self.mesh, rid_d, cid_d, val_d)

        U, V, Bu, Bi = _nmf_fit(
            U0,
            V0,
            Bu0,
            Bi0,
            rid_d,
            cid_d,
            val_d,
            ucnt_d,
            icnt_d,
            jnp.float32(self.learning_rate),
            jnp.float32(self.lambda_u),
            jnp.float32(self.lambda_v),
            jnp.float32(self.lambda_bu),
            jnp.float32(self.lambda_bi),
            jnp.float32(self.global_mean),
            jnp.int32(self.max_iter),
            use_bias=self.use_bias,
        )
        self.u_factors = np.asarray(U)[:n_u]
        self.i_factors = np.asarray(V)[:n_i]
        self.u_biases = np.asarray(Bu)[:n_u]
        self.i_biases = np.asarray(Bi)[:n_i]
        return self

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

    def score_batch_device(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        return _nmf_scores(
            jnp.asarray(self.u_factors, dtype=jnp.float32),
            jnp.asarray(self.i_factors, dtype=jnp.float32),
            jnp.asarray(self.u_biases, dtype=jnp.float32),
            jnp.asarray(self.i_biases, dtype=jnp.float32),
            jnp.float32(self.global_mean),
            jnp.asarray(np.where(known, users, 0), dtype=jnp.int32),
            jnp.asarray(known.astype(np.float32)),
        )

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = np.asarray(
            _nmf_scores(
                jnp.asarray(self.u_factors, dtype=jnp.float32),
                jnp.asarray(self.i_factors, dtype=jnp.float32),
                jnp.asarray(self.u_biases, dtype=jnp.float32),
                jnp.asarray(self.i_biases, dtype=jnp.float32),
                jnp.float32(self.global_mean),
                jnp.asarray(np.where(known, users, 0), dtype=jnp.int32),
                jnp.asarray(known.astype(np.float32)),
            ),
            dtype=np.float64,
        )
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
        return np.where(known_i, scores, self.default_score())

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
