"""FM — Factorization Machines (Rendle, 2012).

Capability parity with reference ``cornac/models/fm/recom_fm.py:28``, which
wraps the vendored libFM C++ library (Linux-only, SGD/SGDA/ALS/MCMC
learners) over user+item one-hot features. TPU redesign: with the
user/item one-hot design matrix the FM prediction reduces to

    y(u, i) = k0*w0 + k1*(w_u + w_i) + k2 * <v_u, v_i>

so training runs as fused minibatched device SGD (methods 'sgd'/'sgda'),
coordinate ALS sweeps (method 'als'), or a Gibbs sampler (method 'mcmc',
matching libFM ``fm_learn_mcmc.h`` semantics — see ``_fm_mcmc``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..ops.accumulate import accumulate_rows
from ..utils import get_rng
from ..utils.init_utils import normal, zeros
from .recommender import Recommender


@partial(
    jax.jit,
    static_argnames=("batch_size", "use_w0", "use_w", "use_v"),
    donate_argnums=(0, 1, 2),
)
def _fm_sgd(
    w0, w, V, key, rid, cid_off, val, lr, regs, batch_size, use_w0, use_w, use_v, n_epochs
):
    n = rid.shape[0]
    n_pad = (-n) % batch_size
    n_total = n + n_pad
    n_batches = n_total // batch_size
    pad_mask = (jnp.arange(n_total) < n).astype(jnp.float32)
    reg0, reg1, reg2 = regs

    def epoch(e, carry):
        w0, w, V, _ = carry
        perm = jax.random.permutation(jax.random.fold_in(key, e), n_total) % n

        def body(b, carry):
            w0, w, V, loss = carry
            idx = jax.lax.dynamic_slice(perm, (b * batch_size,), (batch_size,))
            m = jax.lax.dynamic_slice(pad_mask, (b * batch_size,), (batch_size,))
            u, i, r = rid[idx], cid_off[idx], val[idx]
            pred = jnp.zeros_like(r)
            if use_w0:
                pred = pred + w0
            if use_w:
                pred = pred + w[u] + w[i]
            if use_v:
                pred = pred + jnp.sum(V[u] * V[i], axis=1)
            e_ = (pred - r) * m
            loss = loss + jnp.sum(e_ * e_)
            # clip summed batch gradients: the reference applies
            # per-sample sequential updates whose within-epoch
            # self-correction bounds the step; our batched sum can
            # compound (measured: divergence to nan at 48k interactions /
            # batch 1024, lr 0.01) — the clip bounds the batched
            # equivalent and is inactive at golden scales
            clip = lambda g: jnp.clip(g, -10.0, 10.0)
            if use_w0:
                w0 = w0 - lr * clip(jnp.sum(e_) + reg0 * w0)
            # deterministic grouped accumulation; strategy picked by
            # table-vs-batch shape (ops/accumulate.py)
            ui = jnp.concatenate([u, i])
            if use_w:
                dw = jnp.concatenate(
                    [e_ + reg1 * w[u] * m, e_ + reg1 * w[i] * m]
                )
                w = accumulate_rows(w, ui, -lr * clip(dw))
            if use_v:
                dV = jnp.concatenate(
                    [
                        e_[:, None] * V[i] + reg2 * V[u] * m[:, None],
                        e_[:, None] * V[u] + reg2 * V[i] * m[:, None],
                    ]
                )
                V = accumulate_rows(V, ui, -lr * clip(dV))
            return w0, w, V, loss

        return jax.lax.fori_loop(0, n_batches, body, (w0, w, V, jnp.float32(0.0)))

    return jax.lax.fori_loop(0, n_epochs, epoch, (w0, w, V, jnp.float32(0.0)))


def _seg_sum(x, perm, starts, ends):
    """Segment sums over columns of x via one permutation gather + a
    cumulative sum read at precomputed segment boundaries — measured
    ~4x faster than XLA's scatter-based segment_sum at this size
    (gather-latency bound; see PERF.md)."""
    xp = x[perm]  # (n, C) rows gathered once
    c = jnp.concatenate([jnp.zeros((1, xp.shape[1]), xp.dtype),
                         jnp.cumsum(xp, axis=0)])
    return c[ends] - c[starts]  # (n_feat, C)


@partial(
    jax.jit,
    static_argnames=("use_w0", "use_w", "use_v", "n_feat"),
)
def _fm_als(w0, w, V, val, rid, cid, blocks, reg0, reg1, reg2,
            use_w0, use_w, use_v, n_feat, n_sweeps):
    """All FM-ALS sweeps in one program (libFM fm_learn_als semantics on
    the two-block user/item design). ``blocks`` holds, per feature block,
    (ids, stable sort permutation, sorted ids, per-feature counts)."""
    n = val.shape[0]
    k2 = V.shape[1]

    seg_sum = _seg_sum

    def predict(w0, w, V):
        p = jnp.zeros_like(val)
        if use_w0:
            p = p + w0
        if use_w:
            p = p + w[rid] + w[cid]
        if use_v:
            p = p + jnp.sum(V[rid] * V[cid], axis=1)
        return p

    def sweep(s, carry):
        w0, w, V = carry
        err = val - predict(w0, w, V)  # fresh each sweep: bounds f32 drift
        if use_w0:
            w0_new = jnp.sum(err + w0) / (n + reg0)
            err = err + (w0 - w0_new)
            w0 = w0_new
        if use_w:
            for ids, perm, starts, ends, cnt in blocks:
                num = seg_sum((err + w[ids])[:, None], perm, starts, ends)[:, 0]
                w_new = jnp.where(cnt > 0, num / (cnt + reg1), w)
                err = err - (w_new[ids] - w[ids])
                w = w_new
        if use_v:
            for (ids, perm, starts, ends, cnt), other in zip(blocks, (cid, rid)):

                def f_step(f, carry, ids=ids, perm=perm,
                           starts=starts, ends=ends, other=other):
                    V, err = carry
                    vf = jnp.take(V, f, axis=1)
                    h = vf[other]
                    e_f = err + vf[ids] * h
                    nd = seg_sum(
                        jnp.stack([e_f * h, h * h], axis=1), perm, starts, ends
                    )
                    num, den = nd[:, 0], nd[:, 1]
                    vf_new = jnp.where(den > 0, num / (den + reg2), vf)
                    err = err - (vf_new[ids] - vf[ids]) * h
                    V = jax.lax.dynamic_update_slice_in_dim(
                        V, vf_new[:, None], f, axis=1
                    )
                    return V, err

                V, err = jax.lax.fori_loop(0, k2, f_step, (V, err))
        return w0, w, V

    return jax.lax.fori_loop(0, n_sweeps, sweep, (w0, w, V))


@partial(
    jax.jit,
    static_argnames=("use_w0", "use_w", "use_v", "n_feat"),
)
def _fm_mcmc(w0, w, V, key, val, rid, cid, blocks, reg0, reg1, reg2,
             use_w0, use_w, use_v, n_feat, n_sweeps):
    """Bayesian FM Gibbs sampler (Freudenthaler et al. 2011), matching the
    reference libFM learner ``fm/libfm/libfm/src/fm_learn_mcmc.h`` with
    ``do_sample=do_multilevel=True`` (how the reference wires method='mcmc',
    ``backend_libfm.pyx:202-224``) on the user/item one-hot design with one
    attribute group (the reference wrapper passes no meta groups).

    TPU redesign of the sequential per-feature sweep: one-hot features
    within a block (all users / all items) have pairwise-disjoint training
    supports, so their conditional posteriors given the block boundary are
    independent — the libFM feature-by-feature loop collapses EXACTLY into
    two vectorized block draws per sweep (users, then items with the fresh
    user draws), with the k2 factor loop kept sequential as in libFM. All
    hyperpriors at the libFM defaults: alpha_0=gamma_0=beta_0=1, mu_0=0
    (``fm_learn_mcmc.h:1305-1312``). Like the reference wrapper (which
    extracts final ``fm.w/v`` after learn, ``recom_fm.py:189-226``), the
    returned parameters are the LAST Gibbs draw. Deviation: features absent
    from training keep their init values instead of receiving pure prior
    draws (libFM draws noise for them; they carry no signal either way).
    """
    n = val.shape[0]
    k2 = V.shape[1]
    alpha_0 = gamma_0 = beta_0 = jnp.float32(1.0)
    mu_0 = jnp.float32(0.0)

    def predict(w0, w, V):
        p = jnp.zeros_like(val)
        if use_w0:
            p = p + w0
        if use_w:
            p = p + w[rid] + w[cid]
        if use_v:
            p = p + jnp.sum(V[rid] * V[cid], axis=1)
        return p

    def gamma_draw(k, shape_param, rate):
        return jax.random.gamma(k, shape_param) / rate

    def sweep(s, carry):
        w0, w, V, alpha, w_mu, w_lambda, v_mu, v_lambda = carry
        ks = jax.random.fold_in(key, s)
        # e follows the libFM sign convention: e = prediction - target,
        # recomputed fresh each sweep to bound f32 drift.
        e = predict(w0, w, V) - val

        # -- noise precision: alpha | e ~ Gamma((a0+n)/2, (g0+SSE)/2)
        alpha = gamma_draw(
            jax.random.fold_in(ks, 0),
            (alpha_0 + n) / 2.0,
            (gamma_0 + jnp.sum(e * e)) / 2.0,
        )

        # -- global bias
        if use_w0:
            mean_raw = jnp.sum(e) - n * w0  # sum(e - w0)
            sigma2 = 1.0 / (reg0 + alpha * n)
            mean = -sigma2 * (alpha * mean_raw - mu_0 * reg0)
            w0_new = mean + jnp.sqrt(sigma2) * jax.random.normal(
                jax.random.fold_in(ks, 1)
            )
            e = e + (w0_new - w0)
            w0 = w0_new

        # -- first-order weights
        if use_w:
            # hyper draws: lambda with the OLD mu, then mu with the NEW
            # lambda (libFM order: draw_w_lambda then draw_w_mu)
            g = beta_0 * (w_mu - mu_0) ** 2 + gamma_0 + jnp.sum((w - w_mu) ** 2)
            w_lambda = gamma_draw(
                jax.random.fold_in(ks, 2), (alpha_0 + n_feat + 1) / 2.0, g / 2.0
            )
            mu_mean = (jnp.sum(w) + beta_0 * mu_0) / (n_feat + beta_0)
            w_mu = mu_mean + jnp.sqrt(
                1.0 / ((n_feat + beta_0) * w_lambda)
            ) * jax.random.normal(jax.random.fold_in(ks, 3))

            for j, (ids, perm, starts, ends, cnt) in enumerate(blocks):
                S_e = _seg_sum(e[:, None], perm, starts, ends)[:, 0]
                mean_raw = S_e - cnt * w  # sum over support of (e - w*x)
                sigma2 = 1.0 / (w_lambda + alpha * cnt)
                mean = -sigma2 * (alpha * mean_raw - w_mu * w_lambda)
                draw = mean + jnp.sqrt(sigma2) * jax.random.normal(
                    jax.random.fold_in(ks, 4 + j), (n_feat,)
                )
                w_new = jnp.where(cnt > 0, draw, w)
                e = e + (w_new - w)[ids]
                w = w_new

        # -- pairwise factors
        if use_v:
            # per-factor hyper draws, vectorized over f (one group)
            g_f = (
                beta_0 * (v_mu - mu_0) ** 2
                + gamma_0
                + jnp.sum((V - v_mu[None, :]) ** 2, axis=0)
            )
            v_lambda = gamma_draw(
                jax.random.fold_in(ks, 6),
                (alpha_0 + n_feat + 1) / 2.0,
                g_f / 2.0,
            )
            mu_mean = (jnp.sum(V, axis=0) + beta_0 * mu_0) / (n_feat + beta_0)
            v_mu = mu_mean + jnp.sqrt(
                1.0 / ((n_feat + beta_0) * v_lambda)
            ) * jax.random.normal(jax.random.fold_in(ks, 7), (k2,))

            def f_step(f, carry):
                V, e = carry
                vf = jnp.take(V, f, axis=1)
                lam_f = v_lambda[f]
                mu_f = v_mu[f]
                for j, ((ids, perm, starts, ends, cnt), other) in enumerate(
                    zip(blocks, (cid, rid))
                ):
                    h = vf[other]  # the case's other one-hot side
                    nd = _seg_sum(
                        jnp.stack([h * e, h * h], axis=1), perm, starts, ends
                    )
                    S_he, S_h2 = nd[:, 0], nd[:, 1]
                    mean_raw = S_he - vf * S_h2
                    sigma2 = 1.0 / (lam_f + alpha * S_h2)
                    mean = -sigma2 * (alpha * mean_raw - mu_f * lam_f)
                    draw = mean + jnp.sqrt(sigma2) * jax.random.normal(
                        jax.random.fold_in(jax.random.fold_in(ks, 8 + j), f),
                        (n_feat,),
                    )
                    vf_new = jnp.where(cnt > 0, draw, vf)
                    e = e + (vf_new - vf)[ids] * h
                    vf = vf_new
                V = jax.lax.dynamic_update_slice_in_dim(
                    V, vf[:, None], f, axis=1
                )
                return V, e

            V, e = jax.lax.fori_loop(0, k2, f_step, (V, e))

        return w0, w, V, alpha, w_mu, w_lambda, v_mu, v_lambda

    init = (
        w0,
        w,
        V,
        jnp.float32(1.0),       # alpha     (fm_learn_mcmc.h:1310)
        jnp.float32(0.0),       # w_mu
        jnp.maximum(reg1, 1e-8),  # w_lambda init from regw (backend_libfm.pyx:223)
        jnp.zeros((k2,), jnp.float32),                      # v_mu
        jnp.full((k2,), 1.0, jnp.float32) * jnp.maximum(reg2, 1e-8),  # v_lambda
    )
    out = jax.lax.fori_loop(0, n_sweeps, sweep, init)
    return out[0], out[1], out[2]


class FM(Recommender):
    """Factorization machine over user+item one-hot features."""

    def __init__(
        self,
        name="FM",
        k0=1,
        k1=1,
        k2=8,
        max_iter=100,
        learning_rate=0.01,
        reg0=0.0,
        reg1=0.0,
        reg2=0.0,
        reg_all=0.0,
        init_stdev=0.1,
        method="mcmc",
        num_threads=0,
        batch_size=1024,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.num_threads = num_threads  # no-op: no host threading on TPU
        self.k0 = k0
        self.k1 = k1
        self.k2 = k2
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.reg_all = reg_all  # stored so clone() round-trips the signature
        self.reg0 = reg_all if reg_all != 0.0 else reg0
        self.reg1 = reg_all if reg_all != 0.0 else reg1
        self.reg2 = reg_all if reg_all != 0.0 else reg2
        self.init_stdev = init_stdev
        self.method = method.lower()
        self.batch_size = batch_size
        self.seed = seed
        self.mesh = mesh

        if self.method not in ("sgd", "sgda", "als", "mcmc"):
            raise ValueError("Unknown method: {}".format(method))

        self.init_params = {} if init_params is None else init_params
        self.w0 = self.init_params.get("w0", None)
        self.w = self.init_params.get("w", None)
        self.V = self.init_params.get("V", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        rng = get_rng(self.seed)
        n_feat = self.num_users + self.num_items
        if self.w0 is None:
            self.w0 = 0.0
        if self.w is None:
            self.w = zeros(n_feat, dtype=np.float32)
        if self.V is None:
            self.V = normal(
                (n_feat, max(self.k2, 1)), std=self.init_stdev, random_state=rng,
                dtype=np.float32,
            )
        if not self.trainable:
            return self

        rid, cid, val = train_set.uir_tuple
        cid_off = cid + self.num_users  # item feature block offset

        if self.method == "mcmc":
            self._fit_mcmc(rid, cid_off, val, rng)
        elif self.method == "als":
            self._fit_als(rid, cid_off, val)
        else:
            n = len(rid)
            w_d, V_d = jnp.asarray(self.w), jnp.asarray(self.V)
            rid_d = jnp.asarray(rid, dtype=jnp.int32)
            cid_d = jnp.asarray(cid_off, dtype=jnp.int32)
            val_d = jnp.asarray(val, dtype=jnp.float32)
            if self.mesh is not None and self.method in ("sgd", "sgda"):
                # row-shard the feature tables over the model axis (PMF's
                # treatment); padded rows are never indexed, sliced below
                from ..parallel import replicate_all, shard_tables

                w_d, V_d = shard_tables(self.mesh, w_d, V_d)
                rid_d, cid_d, val_d = replicate_all(
                    self.mesh, rid_d, cid_d, val_d
                )
            w0, w, V, _ = _fm_sgd(
                jnp.float32(self.w0),
                w_d,
                V_d,
                jax.random.PRNGKey(rng.randint(2**31)),
                rid_d,
                cid_d,
                val_d,
                jnp.float32(self.learning_rate),
                (
                    jnp.float32(self.reg0),
                    jnp.float32(self.reg1),
                    jnp.float32(self.reg2),
                ),
                batch_size=min(self.batch_size, n),
                use_w0=self.k0 > 0,
                use_w=self.k1 > 0,
                use_v=self.k2 > 0,
                n_epochs=jnp.int32(self.max_iter),
            )
            n_feat_ = self.num_users + self.num_items
            w, V = w[:n_feat_], V[:n_feat_]
            self.w0 = float(w0)
            self.w = np.asarray(w)
            self.V = np.asarray(V)
        return self

    def _make_blocks(self, rid, cid_off):
        """Per feature block (users, items): device arrays of (case ids,
        stable sort permutation, segment starts/ends, per-feature counts)
        for the sorted-segment-sum sweeps."""
        n_feat = self.w.shape[0]
        blocks = []
        for idx_arr in (rid, cid_off):
            perm = np.argsort(idx_arr, kind="stable")
            sorted_ids = idx_arr[perm]
            feats = np.arange(n_feat)
            blocks.append(
                (
                    jnp.asarray(idx_arr, dtype=jnp.int32),
                    jnp.asarray(perm, dtype=jnp.int32),
                    jnp.asarray(
                        np.searchsorted(sorted_ids, feats), dtype=jnp.int32
                    ),
                    jnp.asarray(
                        np.searchsorted(sorted_ids, feats, side="right"),
                        dtype=jnp.int32,
                    ),
                    jnp.asarray(
                        np.bincount(idx_arr, minlength=n_feat), dtype=jnp.float32
                    ),
                )
            )
        return blocks

    def _fit_mcmc(self, rid, cid_off, val, rng):
        """Gibbs sampling sweeps (libFM fm_learn_mcmc semantics), one
        compiled program for all sweeps; see ``_fm_mcmc``."""
        blocks = self._make_blocks(rid, cid_off)
        w0, w, V = _fm_mcmc(
            jnp.float32(self.w0),
            jnp.asarray(self.w, dtype=jnp.float32),
            jnp.asarray(self.V, dtype=jnp.float32),
            jax.random.PRNGKey(rng.randint(2**31)),
            jnp.asarray(val, dtype=jnp.float32),
            blocks[0][0],
            blocks[1][0],
            blocks,
            jnp.float32(self.reg0),
            jnp.float32(self.reg1),
            jnp.float32(self.reg2),
            use_w0=self.k0 > 0,
            use_w=self.k1 > 0,
            use_v=self.k2 > 0,
            n_feat=self.w.shape[0],
            n_sweeps=jnp.int32(self.max_iter),
        )
        self.w0 = float(w0)
        self.w = np.asarray(w, dtype=np.float64)
        self.V = np.asarray(V, dtype=np.float64)

    def _fit_als(self, rid, cid_off, val):
        """Coordinate-descent sweeps on the degenerate two-feature design,
        entirely on device: the error vector is maintained incrementally
        (recomputed fresh each sweep to bound f32 drift) and per-feature
        aggregations are sorted segment-sums over permutations precomputed
        once on the host — one compiled program runs all sweeps."""
        blocks = self._make_blocks(rid, cid_off)
        rid_d = blocks[0][0]
        cid_d = blocks[1][0]

        w0, w, V = _fm_als(
            jnp.float32(self.w0),
            jnp.asarray(self.w, dtype=jnp.float32),
            jnp.asarray(self.V, dtype=jnp.float32),
            jnp.asarray(val, dtype=jnp.float32),
            rid_d,
            cid_d,
            blocks,
            jnp.float32(self.reg0),
            jnp.float32(self.reg1),
            jnp.float32(self.reg2),
            use_w0=self.k0 > 0,
            use_w=self.k1 > 0,
            use_v=self.k2 > 0,
            n_feat=self.w.shape[0],
            n_sweeps=jnp.int32(self.max_iter),
        )
        self.w0 = float(w0)
        self.w = np.asarray(w, dtype=np.float64)
        self.V = np.asarray(V, dtype=np.float64)

    def _predict(self, users, items):
        users = np.asarray(users)
        items_off = np.asarray(items) + self.num_users
        pred = np.zeros(len(users))
        if self.k0:
            pred += self.w0
        if self.k1:
            pred += self.w[users] + self.w[items_off]
        if self.k2:
            pred += np.sum(self.V[users] * self.V[items_off], axis=1)
        return pred

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return self._predict(
                np.full(self.num_items, user_idx), np.arange(self.num_items)
            )
        return float(self._predict([user_idx], [item_idx])[0])

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        items = self.V[self.num_users : self.num_users + self.num_items]
        scores = np.zeros((len(users), self.num_items))
        if self.k0:
            scores += self.w0
        if self.k1:
            scores += (
                self.w[safe][:, None]
                + self.w[self.num_users : self.num_users + self.num_items][None, :]
            )
        if self.k2:
            scores += self.V[safe] @ items.T
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
        preds = self._predict(np.where(known, users, 0), np.where(known, items, 0))
        return np.where(known, preds, self.default_score())
