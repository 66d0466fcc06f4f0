"""SBPR — Social Bayesian Personalized Ranking (Zhao, McAuley & King,
CIKM 2014).

Capability parity with reference ``cornac/models/sbpr/recom_sbpr.pyx:38``
(Cython/OpenMP three-way ranking SGD: positive > social-positive >
negative, with 1/(1+count) social confidence). TPU redesign: per-epoch the
kernel samples (interaction, social item, negative) triplets on device,
masks invalid draws, and applies both pairwise updates in one fused
minibatched program — users without social positives fall back to plain
BPR, exactly as the reference does (``recom_sbpr.pyx`` no-social branch).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.membership import build_membership
from .bpr import BPR


@partial(
    jax.jit,
    static_argnames=("batch_size", "num_items", "use_bias"),
    donate_argnums=(0, 1, 2),
)
def _sbpr_epochs(
    U,
    V,
    Bi,
    key,
    rid,
    cid,
    membership,
    soc_ids,
    soc_counts,
    soc_indptr,
    lr,
    lbd_u,
    lbd_v,
    lbd_b,
    batch_size,
    num_items,
    n_epochs,
    use_bias=True,
):
    n = rid.shape[0]
    n_pad = (-n) % batch_size
    n_total = n + n_pad
    n_batches = n_total // batch_size
    pad_mask = jnp.arange(n_total) < n

    def epoch(e, carry):
        U, V, Bi = carry
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, e), 3)
        pos_idx = jax.random.randint(k1, (n_total,), 0, n)
        users = rid[pos_idx]
        pos_items = cid[pos_idx]
        negs = jax.random.randint(k2, (n_total,), 0, num_items)

        n_soc = soc_indptr[users + 1] - soc_indptr[users]
        k_rand = jax.random.uniform(k3, (n_total,))
        k_index = soc_indptr[users] + jnp.floor(
            k_rand * jnp.maximum(n_soc, 1)
        ).astype(jnp.int32)
        soc_item = soc_ids[jnp.minimum(k_index, soc_ids.shape[0] - 1)]
        soc_cnt = soc_counts[jnp.minimum(k_index, soc_counts.shape[0] - 1)]
        has_social = n_soc > 0

        observed = membership.query(users, negs)
        valid = ~observed & (negs != soc_item) & pad_mask

        def body(b, carry):
            U, V, Bi = carry
            sl = lambda a: jax.lax.dynamic_slice(a, (b * batch_size,), (batch_size,))
            u, i, j, k = sl(users), sl(pos_items), sl(negs), sl(soc_item)
            m = sl(valid).astype(U.dtype)
            hs = sl(has_social)
            s_uk = 1.0 / (1.0 + sl(soc_cnt).astype(U.dtype))

            wu, vi, vj, vk = U[u], V[i], V[j], V[k]

            # plain-BPR branch quantities
            x_ij = Bi[i] - Bi[j] + jnp.sum(wu * (vi - vj), axis=1)
            z_ij = m * (~hs) / (1.0 + jnp.exp(x_ij))

            # social branch quantities
            x_ik = (Bi[i] - Bi[k] + jnp.sum(wu * (vi - vk), axis=1)) * s_uk
            x_kj = Bi[k] - Bi[j] + jnp.sum(wu * (vk - vj), axis=1)
            z_ik = m * hs / (1.0 + jnp.exp(x_ik))
            z_kj = m * hs / (1.0 + jnp.exp(x_kj))

            dU = (
                z_ij[:, None] * (vi - vj)
                + (z_ik * s_uk)[:, None] * (vi - vk)
                + z_kj[:, None] * (vk - vj)
                - lbd_u * wu * m[:, None]
            )
            dVi = (z_ij + z_ik * s_uk)[:, None] * wu - lbd_v * vi * m[:, None]
            dVj = (-z_ij - z_kj)[:, None] * wu - lbd_v * vj * m[:, None]
            dVk = (z_kj - z_ik * s_uk)[:, None] * wu - lbd_v * vk * (
                m * hs
            )[:, None]

            U = U.at[u].add(lr * dU)
            V = V.at[i].add(lr * dVi)
            V = V.at[j].add(lr * dVj)
            V = V.at[k].add(lr * dVk)
            if use_bias:
                Bi = Bi.at[i].add(lr * (z_ij + z_ik * s_uk - lbd_b * Bi[i] * m))
                Bi = Bi.at[j].add(lr * (-z_ij - z_kj - lbd_b * Bi[j] * m))
                Bi = Bi.at[k].add(
                    lr * (z_kj - z_ik * s_uk - lbd_b * Bi[k] * (m * hs))
                )
            return U, V, Bi

        return jax.lax.fori_loop(0, n_batches, body, (U, V, Bi))

    return jax.lax.fori_loop(0, n_epochs, epoch, (U, V, Bi))


class SBPR(BPR):
    """BPR with a social middle tier: positives > friends' items > negatives."""

    def __init__(
        self,
        name="SBPR",
        k=10,
        max_iter=100,
        learning_rate=0.001,
        lambda_u=0.01,
        lambda_v=0.01,
        lambda_b=0.01,
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
            lambda_reg=lambda_u,
            use_bias=use_bias,
            num_threads=num_threads,
            batch_size=batch_size,
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
            mesh=mesh,
        )
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.lambda_b = lambda_b

    def _prepare_social_data(self, train_set):
        """Per-user social-positive item lists: items purchased by the
        user's social connections but not by the user (with counts)."""
        X = train_set.csr_matrix
        Y = train_set.user_graph.matrix[: self.num_users, : self.num_users].tocsr()

        ids, counts, indptr = [], [], [0]
        for uid in range(self.num_users):
            friends = Y[uid].indices
            if len(friends):
                soc_items, soc_counts = np.unique(
                    X[friends].indices, return_counts=True
                )
                own = X[uid].indices
                mask = ~np.isin(soc_items, own, assume_unique=True)
                ids.extend(soc_items[mask])
                counts.extend(soc_counts[mask])
            indptr.append(len(ids))
        return (
            np.asarray(ids, dtype=np.int32),
            np.asarray(counts, dtype=np.int32),
            np.asarray(indptr, dtype=np.int32),
        )

    def fit(self, train_set, val_set=None):
        from .recommender import Recommender

        Recommender.fit(self, train_set, val_set)
        self._init()
        if not self.trainable:
            return self

        if train_set.user_graph is None:
            raise ValueError("this model needs the user_graph modality attached to the eval method")

        soc_ids, soc_counts, soc_indptr = self._prepare_social_data(train_set)
        if len(soc_ids) == 0:  # degenerate: no social signal at all
            soc_ids = np.zeros(1, dtype=np.int32)
            soc_counts = np.zeros(1, dtype=np.int32)

        rid, cid, _ = train_set.uir_tuple
        membership = build_membership(train_set.csr_matrix)

        U, V, Bi = (
            jnp.asarray(self.u_factors),
            jnp.asarray(self.i_factors),
            jnp.asarray(self.i_biases),
        )
        U, V, Bi = _sbpr_epochs(
            U,
            V,
            Bi,
            jax.random.PRNGKey(self.rng.randint(2**31)),
            jnp.asarray(rid, dtype=jnp.int32),
            jnp.asarray(cid, dtype=jnp.int32),
            membership,
            jnp.asarray(soc_ids),
            jnp.asarray(soc_counts),
            jnp.asarray(soc_indptr),
            jnp.float32(self.learning_rate),
            jnp.float32(self.lambda_u),
            jnp.float32(self.lambda_v),
            jnp.float32(self.lambda_b),
            batch_size=min(self.batch_size, len(rid)),
            num_items=train_set.num_items,
            n_epochs=jnp.int32(self.max_iter),
            use_bias=self.use_bias,
        )
        self.u_factors = np.asarray(U)
        self.i_factors = np.asarray(V)
        self.i_biases = np.asarray(Bi)
        return self
