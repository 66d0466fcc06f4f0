"""CTR — Collaborative Topic Regression (Wang & Blei, KDD 2011).

Capability parity with reference ``cornac/models/ctr/recom_ctr.py:26`` +
``ctr/ctr.py`` (numpy coordinate ascent: confidence-weighted ALS for the CF
part, projected-gradient simplex optimization for the per-item topic
proportions). TPU split: the ALS half-sweeps run as batched k x k solves on
device (same kernel family as WMF); the LDA simplex step stays host-side
numpy (tiny, branch-heavy line search) with the phi/gamma statistics
vectorized per item.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..utils import get_rng
from .recommender import ANNMixin, MEASURE_DOT, Recommender

EPS = 1e-100


def _simplex_project(v, s=1.0):
    if v.sum() < s + 1e-10 and np.all(v > 0):
        return v
    u = np.sort(v)[::-1]
    cssv = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, len(v) + 1) > (cssv - s))[0][-1]
    theta = (cssv[rho] - s) / (rho + 1.0)
    return (v - theta).clip(min=0)


def _f_simplex(gamma, v, lambda_v, x):
    return 0.5 * lambda_v * np.dot(v - x, v - x) - np.sum(
        gamma * np.log(np.maximum(x, EPS))
    )


def _optimize_simplex(gamma, v, lambda_v, opt_x, s=1.0):
    """Projected-gradient step with backtracking (reference ctr.py:55-81)."""
    opt_x_old = np.copy(opt_x)
    f_old = _f_simplex(gamma, v, lambda_v, opt_x)
    # gradient: lambda_v (x - v) - colsum(gamma)/x
    df = lambda_v * (opt_x - v) - gamma.sum(axis=0) / np.maximum(opt_x, EPS)
    ab_sum = np.sum(np.abs(df))
    if ab_sum > 1.0:
        df /= ab_sum
    opt_x = opt_x - df
    x_bar = _simplex_project(opt_x, s) - opt_x_old
    r = 0.5 * np.dot(df, x_bar)
    t = 0.5
    f_new = f_old
    for _ in range(100):
        opt_x = opt_x_old + t * x_bar
        f_new = _f_simplex(gamma, v, lambda_v, opt_x)
        if f_new > f_old + r * t:
            t *= 0.5
        else:
            break
    return opt_x, f_new


@jax.jit
def _ctr_als_users(V, pad_idx, pad_val, pad_mask, a, b, lambda_u):
    G = V.T @ V
    Vs = V[pad_idx] * pad_mask[:, :, None]
    A = b * G[None] + (a - b) * jnp.einsum("blk,blm->bkm", Vs, Vs)
    A = A + lambda_u * jnp.eye(V.shape[1])[None]
    rhs = a * jnp.einsum("blk,bl->bk", Vs, pad_val * pad_mask)
    return jnp.linalg.solve(A, rhs[..., None]).squeeze(-1)


@jax.jit
def _ctr_als_items(U, theta, pad_idx, pad_val, pad_mask, a, b, lambda_v):
    G = U.T @ U
    Us = U[pad_idx] * pad_mask[:, :, None]
    A = b * G[None] + (a - b) * jnp.einsum("blk,blm->bkm", Us, Us)
    A = A + lambda_v * jnp.eye(U.shape[1])[None]
    rhs = a * jnp.einsum("blk,bl->bk", Us, pad_val * pad_mask) + lambda_v * theta
    return jnp.linalg.solve(A, rhs[..., None]).squeeze(-1)


class CTR(Recommender, ANNMixin):
    """LDA-regularized weighted MF over item text."""

    def __init__(
        self,
        name="CTR",
        k=200,
        lambda_u=0.01,
        lambda_v=0.01,
        eta=0.01,
        a=1,
        b=0.01,
        max_iter=100,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.eta = eta
        self.a = a
        self.b = b
        self.max_iter = max_iter
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.V = self.init_params.get("V", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.item_text is None:
            raise ValueError("this model needs the item_text modality attached to the eval method")
        rng = get_rng(self.seed)
        if self.U is None:
            self.U = rng.random_sample((self.num_users, self.k))
        if self.V is None:
            self.V = rng.random_sample((self.num_items, self.k))
        if not self.trainable:
            return self

        csr = train_set.matrix
        csc = csr.T.tocsr()

        # LDA state
        theta = rng.random_sample((self.num_items, self.k))
        theta = theta / theta.sum(1, keepdims=True)
        n_vocab = train_set.item_text.vocab.size
        beta = rng.random_sample((n_vocab, self.k))
        beta = beta / beta.sum(0)
        phi_sum = np.zeros((n_vocab, self.k)) + self.eta

        bow = train_set.item_text.batch_bow(
            np.arange(self.num_items), keep_sparse=True
        ).tocsr()

        def padded(mat, ids, pad_len):
            B = len(ids)
            idx = np.zeros((B, pad_len), np.int32)
            val = np.zeros((B, pad_len), np.float32)
            mask = np.zeros((B, pad_len), np.float32)
            for b_, r_ in enumerate(ids):
                s, e = mat.indptr[r_], mat.indptr[r_ + 1]
                L = e - s
                idx[b_, :L] = mat.indices[s:e]
                val[b_, :L] = mat.data[s:e]
                mask[b_, :L] = 1.0
            return jnp.asarray(idx), jnp.asarray(val), jnp.asarray(mask)

        u_pad = padded(csr, np.arange(self.num_users), max(1, int(np.diff(csr.indptr).max(initial=1))))
        i_pad = padded(csc, np.arange(self.num_items), max(1, int(np.diff(csc.indptr).max(initial=1))))

        a_, b_ = jnp.float32(self.a), jnp.float32(self.b)

        # mesh: the per-entity ALS solves shard over the data axis (rows
        # are independent kxk solves; zero-mask padding rows solve to 0
        # and are sliced off). The LDA coordinate step stays host-side.
        shard_als = lambda t: t
        if self.mesh is not None:
            from ..parallel import shard_batch
            from ..parallel.mesh import DATA_AXIS, pad_rows_to_multiple

            dsz = self.mesh.shape[DATA_AXIS]
            shard_als = lambda t: shard_batch(
                self.mesh, pad_rows_to_multiple(np.asarray(t), dsz)
            )
            u_pad = tuple(shard_als(t) for t in u_pad)
            i_pad = tuple(shard_als(t) for t in i_pad)

        for it in range(self.max_iter):
            U_d = _ctr_als_users(
                jnp.asarray(self.V, dtype=jnp.float32), *u_pad, a_, b_,
                jnp.float32(self.lambda_u),
            )
            self.U = np.asarray(U_d, dtype=np.float64)[: self.num_users]
            V_d = _ctr_als_items(
                jnp.asarray(self.U, dtype=jnp.float32),
                shard_als(jnp.asarray(theta, dtype=jnp.float32)),
                *i_pad,
                a_,
                b_,
                jnp.float32(self.lambda_v),
            )
            self.V = np.asarray(V_d, dtype=np.float64)[: self.num_items]

            # LDA updates (host): per-item phi responsibilities + simplex step
            for vi in range(self.num_items):
                s, e = bow.indptr[vi], bow.indptr[vi + 1]
                if s == e:
                    continue
                w = bow.indices[s:e]
                cnt = bow.data[s:e]
                phi = theta[vi] * beta[w, :] + 1e-100
                phi = phi / phi.sum(1, keepdims=True)
                gamma = cnt[:, None] * phi
                theta[vi], _ = _optimize_simplex(
                    gamma=gamma, v=self.V[vi], lambda_v=self.lambda_v,
                    opt_x=theta[vi],
                )
                phi_sum[w, :] += gamma
            beta = phi_sum / phi_sum.sum(0)
            phi_sum = np.zeros((n_vocab, self.k)) + self.eta

            if self.verbose:
                print("Iter %d/%d done" % (it + 1, self.max_iter))

        self.theta, self.beta = theta, beta
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
        scores = self.U[np.where(known, users, 0)] @ self.V.T
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return self.U

    def get_item_vectors(self):
        return self.V
