"""HPF — (Hierarchical) Poisson Factorization (Gopalan et al., UAI 2015).

Capability parity with reference ``cornac/models/hpf/recom_hpf.py:25`` +
``cpp/cpp_hpf.cpp`` (Eigen C++ coordinate-ascent variational inference; one
of SURVEY §7's 'genuinely hard native ports'). TPU redesign: the CAVI sweep
is expressed as dense Gamma-parameter tables + per-observation gather /
normalize / scatter-add (segment-sum form), with the whole ``max_iter`` loop
compiled into one device program. Both the plain (``hierarchical=False``)
and hierarchical variants are supported with the reference's
hyperparameters.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..utils import get_rng
from ..utils.init_utils import gamma as gamma_init
from .recommender import ANNMixin, MEASURE_DOT, Recommender


@partial(jax.jit, static_argnames=("hierarchical",), donate_argnums=(0, 1, 2, 3))
def _hpf_cavi(G_s, G_r, L_s, L_r, K_r, T_r, rid, cid, val, n_iters, hierarchical):
    """Run the full CAVI loop on device. Shapes: G_* (n,k), L_* (d,k)."""
    if hierarchical:
        a_, b_, c_ = 0.3, 0.3, 1.0
        k_dim = G_s.shape[1]
        k_s = a_ + k_dim * a_
        t_s = b_ + k_dim * b_
    else:
        a_, b_, c_, d_ = 0.3, 1.0, 0.3, 1.0
        k_s, t_s = a_, c_

    eps = 2.0**-52

    def kappa_update(K, S, R, shape_hyper, rate_hyper):
        return shape_hyper / rate_hyper + jnp.sum(S / jnp.maximum(R, eps), axis=1)

    if hierarchical:
        K_r = kappa_update(K_r, G_s, G_r, a_, c_)
        T_r = kappa_update(T_r, L_s, L_r, b_, c_)

    def body(_, carry):
        G_s, G_r, L_s, L_r, K_r, T_r = carry

        # E[exp(log theta)] and E[exp(log beta)]
        Lt = jnp.exp(jax.scipy.special.digamma(G_s) - jnp.log(jnp.maximum(G_r, eps)))
        Lb = jnp.exp(jax.scipy.special.digamma(L_s) - jnp.log(jnp.maximum(L_r, eps)))

        # per-observation multinomial responsibilities
        p = Lt[rid] * Lb[cid]  # (nnz, k)
        denom = jnp.sum(p, axis=1) + eps
        contrib = p * (val / denom)[:, None]

        item_shape = b_ if hierarchical else c_
        G_s = jnp.full_like(G_s, a_).at[rid].add(contrib)
        G_r = (k_s / K_r)[:, None] + jnp.sum(
            L_s / jnp.maximum(L_r, eps), axis=0
        )[None, :]
        if hierarchical:
            K_r = kappa_update(K_r, G_s, G_r, a_, c_)

        L_s = jnp.full_like(L_s, item_shape).at[cid].add(contrib)
        L_r = (t_s / T_r)[:, None] + jnp.sum(
            G_s / jnp.maximum(G_r, eps), axis=0
        )[None, :]
        if hierarchical:
            T_r = kappa_update(T_r, L_s, L_r, b_, c_)

        return G_s, G_r, L_s, L_r, K_r, T_r

    return jax.lax.fori_loop(0, n_iters, body, (G_s, G_r, L_s, L_r, K_r, T_r))


class HPF(Recommender, ANNMixin):
    """Poisson factorization by whole-loop CAVI on device."""

    def __init__(
        self,
        k=5,
        max_iter=100,
        name="HPF",
        trainable=True,
        verbose=False,
        hierarchical=True,
        seed=None,
        init_params=None,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.k = k
        self.max_iter = max_iter
        self.hierarchical = hierarchical
        self.seed = seed

        self.init_params = {} if init_params is None else init_params
        self.Theta = self.init_params.get("Theta", None)
        self.Beta = self.init_params.get("Beta", None)
        self.Gs = self.init_params.get("G_s", None)
        self.Gr = self.init_params.get("G_r", None)
        self.Ls = self.init_params.get("L_s", None)
        self.Lr = self.init_params.get("L_r", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        n, d, k = self.num_users, self.num_items, self.k
        a_, b_ = (0.3, 0.3) if self.hierarchical else (0.3, 1.0)

        def init_tbl(existing, rows):
            if existing is not None:
                return np.asarray(existing, dtype=np.float64)
            return gamma_init(
                (rows, k), shape_param=a_, scale_param=b_ / a_, random_state=rng,
                dtype=np.float64,
            )

        G_s = init_tbl(self.Gs, n)
        G_r = init_tbl(self.Gr, n)
        L_s = init_tbl(self.Ls, d)
        L_r = init_tbl(self.Lr, d)
        K_r = np.ones(n)
        T_r = np.ones(d)

        rid, cid, val = train_set.uir_tuple

        states = [
            jnp.asarray(G_s), jnp.asarray(G_r), jnp.asarray(L_s),
            jnp.asarray(L_r), jnp.asarray(K_r), jnp.asarray(T_r),
        ]
        edges = [
            jnp.asarray(rid, dtype=jnp.int32),
            jnp.asarray(cid, dtype=jnp.int32),
            jnp.asarray(val, dtype=jnp.float32),
        ]
        if self.mesh is not None:
            # edge parallelism: the per-observation responsibility rows
            # (nnz, k) shard over the mesh, variational state tables stay
            # replicated; GSPMD psums the scatter-add accumulations —
            # identical math to single-device CAVI. Edges pad to the
            # device count with val == 0 rows, whose contributions are
            # exactly zero.
            from ..parallel import replicate_all, shard_batch

            states = list(replicate_all(self.mesh, *states))
            pad = (-len(rid)) % self.mesh.size
            if pad:
                edges = [
                    jnp.concatenate([e, jnp.zeros(pad, e.dtype)]) for e in edges
                ]
            edges = [shard_batch(self.mesh, e) for e in edges]

        G_s, G_r, L_s, L_r, K_r, T_r = _hpf_cavi(
            *states,
            *edges,
            jnp.int32(self.max_iter),
            hierarchical=self.hierarchical,
        )

        self.Gs, self.Gr = np.asarray(G_s), np.asarray(G_r)
        self.Ls, self.Lr = np.asarray(L_s), np.asarray(L_r)
        self.Theta = self.Gs / np.maximum(self.Gr, 1e-12)
        self.Beta = self.Ls / np.maximum(self.Lr, 1e-12)
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return self.Beta @ self.Theta[user_idx]
        return self.Beta[item_idx] @ self.Theta[user_idx]

    def _known_scores_device(self, safe_users, known):
        from ..ops.dense_scores import device_dot

        return device_dot(self.Theta[safe_users], self.Beta)

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = self.Theta[np.where(known, users, 0)] @ self.Beta.T
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
        preds = np.sum(
            self.Theta[np.where(known, users, 0)] * self.Beta[np.where(known, items, 0)],
            axis=1,
        )
        return np.where(known, preds, self.default_score())

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return self.Theta

    def get_item_vectors(self):
        return self.Beta
