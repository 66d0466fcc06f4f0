"""ConvMF — Convolutional Matrix Factorization (Kim et al., RecSys 2016).

Capability parity with reference ``cornac/models/conv_mf/recom_convmf.py:30``
(TF1 CNN text encoder + numpy per-entity ALS). TPU redesign: the ALS solves
are batched k x k device solves; the CNN (word embedding -> multi-width
conv1d -> max-pool -> dense) is pure JAX trained with Adam to regress item
factors from documents. Both halves are jitted.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import dense, init_dense
from ..exception import ScoreException
from ..utils import get_rng
from .recommender import Recommender


def _init_cnn(rng, vocab, emb_dim, filter_sizes, num_filters, hidden, out_dim):
    params = {
        "emb": jnp.asarray(rng.uniform(-1, 1, (vocab, emb_dim)).astype(np.float32)),
        "convs": [],
        "fc1": init_dense(rng, num_filters * len(filter_sizes), hidden),
        "fc2": init_dense(rng, hidden, out_dim),
    }
    for fs in filter_sizes:
        bound = 1.0 / np.sqrt(fs * emb_dim)
        params["convs"].append(
            {
                "w": jnp.asarray(
                    rng.uniform(-bound, bound, (fs, emb_dim, num_filters)).astype(
                        np.float32
                    )
                ),
                "b": jnp.zeros(num_filters, jnp.float32),
            }
        )
    return params


def _cnn_forward(params, docs):
    """(B, L) token ids -> (B, out_dim) document vectors."""
    x = params["emb"][docs]  # (B, L, E)
    feats = []
    for conv in params["convs"]:
        # conv1d via dot_general: (B, L, E) * (fs, E, F)
        y = jax.lax.conv_general_dilated(
            x,
            conv["w"],
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + conv["b"]
        feats.append(jnp.max(jax.nn.relu(y), axis=1))  # global max pool
    h = jnp.concatenate(feats, axis=1)
    h = jnp.tanh(dense(params["fc1"], h))
    return jnp.tanh(dense(params["fc2"], h))


@jax.jit
def _als_u(V, pad_idx, pad_val, pad_mask, lambda_u):
    Vs = V[pad_idx] * pad_mask[:, :, None]
    A = jnp.einsum("blk,blm->bkm", Vs, Vs) + lambda_u * jnp.eye(V.shape[1])[None]
    rhs = jnp.einsum("blk,bl->bk", Vs, pad_val * pad_mask)
    return jnp.linalg.solve(A, rhs[..., None]).squeeze(-1)


@jax.jit
def _als_v(U, theta, weights, pad_idx, pad_val, pad_mask, lambda_v):
    Us = U[pad_idx] * pad_mask[:, :, None]
    A = jnp.einsum("blk,blm->bkm", Us, Us) + (
        lambda_v * weights
    )[:, None, None] * jnp.eye(U.shape[1])[None]
    rhs = jnp.einsum("blk,bl->bk", Us, pad_val * pad_mask) + (
        lambda_v * weights
    )[:, None] * theta
    return jnp.linalg.solve(A, rhs[..., None]).squeeze(-1)


class ConvMF(Recommender):
    """CNN-text-regularized MF solved by alternating ALS + CNN regression."""

    def __init__(
        self,
        name="ConvMF",
        k=50,
        n_epochs=50,
        cnn_epochs=5,
        cnn_bs=128,
        cnn_lr=0.001,
        lambda_u=1,
        lambda_v=100,
        emb_dim=200,
        max_len=300,
        filter_sizes=(3, 4, 5),
        num_filters=100,
        hidden_dim=200,
        dropout_rate=0.2,
        give_item_weight=True,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.n_epochs = n_epochs
        self.cnn_epochs = cnn_epochs
        self.cnn_bs = cnn_bs
        self.cnn_lr = cnn_lr
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.emb_dim = emb_dim
        self.max_len = max_len
        self.filter_sizes = list(filter_sizes)
        self.num_filters = num_filters
        self.hidden_dim = hidden_dim
        self.dropout_rate = dropout_rate
        self.give_item_weight = give_item_weight
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.V = self.init_params.get("V", None)
        self.W = self.init_params.get("W", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.item_text is None:
            raise ValueError("this model needs the item_text modality attached to the eval method")
        rng = get_rng(self.seed)
        if self.U is None:
            self.U = rng.uniform(size=(self.num_users, self.k)).astype(np.float32)
        if self.V is None:
            self.V = rng.uniform(size=(self.num_items, self.k)).astype(np.float32)
        if not self.trainable:
            return self

        csr = train_set.matrix
        csc = csr.T.tocsr()
        item_counts = np.diff(csc.indptr)
        if self.give_item_weight:
            w = np.sqrt(np.maximum(item_counts, 1)).astype(np.float64)
            item_weight = (self.num_items / w.sum()) * w
        else:
            item_weight = np.ones(self.num_items)

        docs = train_set.item_text.batch_seq(
            np.arange(self.num_items), max_length=self.max_len
        ).astype(np.int32)
        vocab = train_set.item_text.vocab.size

        cnn = _init_cnn(
            rng, vocab, self.emb_dim, self.filter_sizes, self.num_filters,
            self.hidden_dim, self.k,
        )
        optimizer = optax.adam(self.cnn_lr)
        opt_state = optimizer.init(cnn)

        def padded(mat, pad_len):
            n = mat.shape[0]
            idx = np.zeros((n, pad_len), np.int32)
            val = np.zeros((n, pad_len), np.float32)
            mask = np.zeros((n, pad_len), np.float32)
            for r in range(n):
                s, e = mat.indptr[r], mat.indptr[r + 1]
                L = e - s
                idx[r, :L] = mat.indices[s:e]
                val[r, :L] = mat.data[s:e]
                mask[r, :L] = 1.0
            return jnp.asarray(idx), jnp.asarray(val), jnp.asarray(mask)

        u_pad = padded(csr, max(1, int(np.diff(csr.indptr).max(initial=1))))
        i_pad = padded(csc, max(1, int(np.diff(csc.indptr).max(initial=1))))
        weights_d = jnp.asarray(item_weight, dtype=jnp.float32)
        docs_d = jnp.asarray(docs)

        # mesh: per-entity ALS rows shard over the data axis (independent
        # kxk solves; zero-mask padding rows solve to 0 and are sliced
        # off); the CNN regression runs data-parallel over item batches
        shard_als = lambda t: t
        shard_b = lambda t: t
        dsz = 1
        if self.mesh is not None:
            from ..parallel import replicate_all, shard_batch
            from ..parallel.mesh import DATA_AXIS, pad_rows_to_multiple

            dsz = self.mesh.shape[DATA_AXIS]
            shard_als = lambda t: shard_batch(
                self.mesh, pad_rows_to_multiple(np.asarray(t), dsz)
            )
            shard_b = lambda t: shard_batch(self.mesh, t)
            u_pad = tuple(shard_als(t) for t in u_pad)
            i_pad = tuple(shard_als(t) for t in i_pad)
            cnn, opt_state, docs_d = replicate_all(
                self.mesh, cnn, opt_state, docs_d
            )

        @jax.jit
        def cnn_train_step(cnn, opt_state, doc_batch, target, weight):
            def loss_fn(c):
                pred = _cnn_forward(c, doc_batch)
                return jnp.sum(weight[:, None] * (pred - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(cnn)
            updates, opt_state = optimizer.update(grads, opt_state, cnn)
            return optax.apply_updates(cnn, updates), opt_state, loss

        theta = np.asarray(_cnn_forward(cnn, docs_d))

        bsz = min(self.cnn_bs, self.num_items)
        if self.mesh is not None:
            bsz = max(dsz, bsz - bsz % dsz)
        for epoch in range(self.n_epochs):
            self.U = np.asarray(
                _als_u(
                    jnp.asarray(self.V), *u_pad, jnp.float32(self.lambda_u)
                )
            )[: self.num_users]
            self.V = np.asarray(
                _als_v(
                    jnp.asarray(self.U),
                    shard_als(jnp.asarray(theta, dtype=jnp.float32)),
                    shard_als(weights_d),
                    *i_pad,
                    jnp.float32(self.lambda_v),
                )
            )[: self.num_items]

            # CNN regression toward current item factors (seeded shuffle:
            # reproducible fits, and the mesh path sees the same order)
            for _ in range(self.cnn_epochs):
                order = rng.permutation(self.num_items)
                for s in range(0, self.num_items, bsz):
                    ids = order[s : s + bsz]
                    if len(ids) < bsz:  # stable jit shapes: tile to bsz
                        ids = np.resize(ids, bsz)
                    cnn, opt_state, _ = cnn_train_step(
                        cnn, opt_state,
                        shard_b(jnp.asarray(docs[ids])),
                        shard_b(jnp.asarray(self.V[ids], dtype=jnp.float32)),
                        shard_b(jnp.asarray(item_weight[ids], dtype=jnp.float32)),
                    )
            theta = np.asarray(_cnn_forward(cnn, docs_d))
            if self.verbose:
                print("Epoch %d/%d done" % (epoch + 1, self.n_epochs))

        self.theta = theta
        self.cnn = cnn
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return self.V @ self.U[user_idx]
        return self.V[item_idx] @ self.U[user_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = (self.U[np.where(known, users, 0)] @ self.V.T).astype(np.float64)
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
