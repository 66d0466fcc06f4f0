"""VEBPR — View-Enhanced BPR (Ding et al., TKDE 2019).

Capability parity with reference ``cornac/models/bpr/recom_vebpr.pyx:50``
(Cython three-way ranking over purchase > view > unobserved with alpha
trade-off; consumes a PurchaseViewDataset). TPU redesign mirrors the SBPR
kernel shape: per-epoch device sampling of (purchase, viewed item,
negative), masked updates, users without views fall back to plain BPR.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.membership import build_membership
from .bpr import BPR


@partial(jax.jit, static_argnames=("batch_size", "num_items"), donate_argnums=(0, 1))
def _vebpr_epochs(
    U,
    V,
    key,
    rid,
    cid,
    purchase_mem,
    view_mem,
    view_ids,
    view_indptr,
    lr,
    reg,
    alpha,
    batch_size,
    num_items,
    n_epochs,
):
    n = rid.shape[0]
    n_pad = (-n) % batch_size
    n_total = n + n_pad
    n_batches = n_total // batch_size
    pad_mask = jnp.arange(n_total) < n

    def epoch(e, carry):
        U, V = carry
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, e), 3)
        pos_idx = jax.random.randint(k1, (n_total,), 0, n)
        users = rid[pos_idx]
        pos_items = cid[pos_idx]
        negs = jax.random.randint(k2, (n_total,), 0, num_items)

        n_view = view_indptr[users + 1] - view_indptr[users]
        v_rand = jax.random.uniform(k3, (n_total,))
        v_index = view_indptr[users] + jnp.floor(
            v_rand * jnp.maximum(n_view, 1)
        ).astype(jnp.int32)
        view_item = view_ids[jnp.minimum(v_index, view_ids.shape[0] - 1)]
        has_view = n_view > 0

        bad = purchase_mem.query(users, negs) | (
            has_view & view_mem.query(users, negs)
        )
        valid = ~bad & pad_mask

        def body(b, carry):
            U, V = carry
            sl = lambda a: jax.lax.dynamic_slice(a, (b * batch_size,), (batch_size,))
            u, i, j, v = sl(users), sl(pos_items), sl(negs), sl(view_item)
            m = sl(valid).astype(U.dtype)
            hv = sl(has_view)

            wu, vi, vj, vv = U[u], V[i], V[j], V[v]

            # no-view branch: plain BPR
            x_ij = jnp.clip(jnp.sum(wu * (vi - vj), axis=1), -50.0, 50.0)
            d_ij = m * (~hv) / (1.0 + jnp.exp(x_ij))

            # view branch: purchase > view (weight alpha), view > neg (1-alpha)
            x_iv = jnp.clip(jnp.sum(wu * (vi - vv), axis=1), -50.0, 50.0)
            x_vj = jnp.clip(jnp.sum(wu * (vv - vj), axis=1), -50.0, 50.0)
            d_iv = alpha * m * hv / (1.0 + jnp.exp(x_iv))
            d_vj = (1.0 - alpha) * m * hv / (1.0 + jnp.exp(x_vj))

            dU = (
                d_ij[:, None] * (vi - vj)
                + d_iv[:, None] * (vi - vv)
                + d_vj[:, None] * (vv - vj)
                - reg * wu * m[:, None]
            )
            dVi = (d_ij + d_iv)[:, None] * wu - reg * vi * m[:, None]
            dVj = (-d_ij - d_vj)[:, None] * wu - reg * vj * m[:, None]
            dVv = (d_vj - d_iv)[:, None] * wu - reg * vv * (m * hv)[:, None]

            U = U.at[u].add(lr * dU)
            V = V.at[i].add(lr * dVi)
            V = V.at[j].add(lr * dVj)
            V = V.at[v].add(lr * dVv)
            return U, V

        return jax.lax.fori_loop(0, n_batches, body, (U, V))

    return jax.lax.fori_loop(0, n_epochs, epoch, (U, V))


class VEBPR(BPR):
    """BPR with a view middle tier (PurchaseViewDataset required)."""

    def __init__(
        self,
        name="VEBPR",
        k=10,
        max_iter=100,
        learning_rate=0.01,
        lambda_reg=0.1,
        alpha=0.5,
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
            use_bias=False,
            num_threads=num_threads,
            batch_size=batch_size,
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
            mesh=mesh,
        )
        self.alpha = alpha

    def fit(self, train_set, val_set=None):
        from .recommender import Recommender

        Recommender.fit(self, train_set, val_set)
        self._init()
        if not self.trainable:
            return self

        if not hasattr(train_set, "view_matrix"):
            raise ValueError(
                "VEBPR requires a PurchaseViewDataset (view_matrix missing)."
            )

        rid, cid, _ = train_set.uir_tuple
        purchase_mem = build_membership(train_set.csr_matrix)
        view_csr = train_set.view_matrix.tocsr()
        view_mem = build_membership(view_csr)
        view_ids = np.asarray(view_csr.indices, dtype=np.int32)
        view_indptr = np.asarray(view_csr.indptr, dtype=np.int32)
        if len(view_ids) == 0:
            view_ids = np.zeros(1, dtype=np.int32)

        U, V = jnp.asarray(self.u_factors), jnp.asarray(self.i_factors)
        n_u, n_i = U.shape[0], V.shape[0]
        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        view_ids_d = jnp.asarray(view_ids)
        view_indptr_d = jnp.asarray(view_indptr)
        if self.mesh is not None:
            from ..parallel import replicate_all, shard_tables

            U, V = shard_tables(self.mesh, U, V)
            (rid_d, cid_d, purchase_mem, view_mem, view_ids_d,
             view_indptr_d) = replicate_all(
                self.mesh, rid_d, cid_d, purchase_mem, view_mem,
                view_ids_d, view_indptr_d,
            )
        U, V = _vebpr_epochs(
            U,
            V,
            jax.random.PRNGKey(self.rng.randint(2**31)),
            rid_d,
            cid_d,
            purchase_mem,
            view_mem,
            view_ids_d,
            view_indptr_d,
            jnp.float32(self.learning_rate),
            jnp.float32(self.lambda_reg),
            jnp.float32(self.alpha),
            batch_size=min(self.batch_size, len(rid)),
            num_items=train_set.num_items,
            n_epochs=jnp.int32(self.max_iter),
        )
        self.u_factors = np.asarray(U)[:n_u]
        self.i_factors = np.asarray(V)[:n_i]
        return self
