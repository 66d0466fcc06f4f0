"""LRPPM — Learning to Rank user Preferences with Paired features from
Multiple aspects (Chen et al., SIGIR 2016).

Capability parity with reference ``cornac/models/lrppm/recom_lrppm.pyx:56``
(560-line Cython engine: rating SGD + aspect-pair BPR over the additive
score U.UA + I.IA + U.I, plain SGD with gated reg + non-negativity). TPU
redesign like MTER: sampled gradients per iteration as batched einsums /
scatter-adds, the whole loop fused on device; the aspect-membership skip
uses a packed-key sorted array with binary search. Ranking uses the paper's
top-aspect composite score (reference ``rank()`` override), driving
``score_batch``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..exception import ScoreException
from ..ops.csr_lookup import CsrLookup
from ..utils import get_rng
from ..utils.init_utils import uniform
from .recommender import Recommender


@partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("n_samples", "n_ranking", "aspect_steps", "batch_sharding"),
)
def _lrppm_fit(
    params,
    key,
    rid, cid, rvals,
    X_u, X_i, X_a, X_l,
    aspect_indptr, aspect_indices,
    rating_lookup,
    n_aspects,
    lr, reg, ld,
    n_iters,
    n_samples,
    n_ranking,
    aspect_steps,
    batch_sharding=None,
):
    # mesh: sharding the sampled index streams makes GSPMD shard the
    # per-sample work and psum the scatter-adds into replicated tables
    shard = (
        (lambda x: jax.lax.with_sharding_constraint(x, batch_sharding))
        if batch_sharding is not None
        else (lambda x: x)
    )

    def iteration(it, params):
        U, I, UA, IA = params
        ikey = jax.random.fold_in(key, it)
        k1, k2, k3 = jax.random.split(ikey, 3)

        dU = jnp.zeros_like(U)
        dI = jnp.zeros_like(I)
        dUA = jnp.zeros_like(UA)
        dIA = jnp.zeros_like(IA)

        # rating stream: r ~ U.I
        s = shard(jax.random.randint(k1, (n_samples,), 0, rid.shape[0]))
        u, i, r = rid[s], cid[s], rvals[s]
        e = 2.0 * (jnp.sum(U[u] * I[i], axis=1) - r)
        dU = dU.at[u].add(e[:, None] * I[i])
        dI = dI.at[i].add(e[:, None] * U[u])

        # aspect-pair ranking stream
        s2 = shard(jax.random.randint(k2, (n_ranking,), 0, X_u.shape[0]))
        u, i, a = X_u[s2], X_i[s2], X_a[s2]
        a_neg = shard(jax.random.randint(k3, (n_ranking,), 0, n_aspects))
        # skip if (u, i, a_neg) is an observed aspect triple: look up the
        # pair's nnz position in the rating CSR, then search a_neg in that
        # row of the (nnz x n_aspects) aspect CSR (all int32-safe)
        from ..ops.membership import Membership

        _, _, pair_pos = rating_lookup.query_position(u, i)
        aspect_member = Membership(
            "csr", (aspect_indptr, aspect_indices), 0, search_steps=aspect_steps
        )
        observed = aspect_member.query(pair_pos, a_neg)
        valid = (~observed) & (a_neg != a)

        def aspect_score(aa):
            return (
                jnp.sum(U[u] * UA[aa], axis=1)
                + jnp.sum(I[i] * IA[aa], axis=1)
                + jnp.sum(U[u] * I[i], axis=1)
            )

        pred = aspect_score(a) - aspect_score(a_neg)
        z = ld * valid / (1.0 + jnp.exp(pred))

        dU = dU.at[u].add(-z[:, None] * (UA[a] - UA[a_neg]))
        dI = dI.at[i].add(-z[:, None] * (IA[a] - IA[a_neg]))
        dUA = dUA.at[a].add(-z[:, None] * U[u]).at[a_neg].add(z[:, None] * U[u])
        dIA = dIA.at[a].add(-z[:, None] * I[i]).at[a_neg].add(z[:, None] * I[i])

        # weighted rating refit on the sampled (u, i) pairs
        _, r_ui = rating_lookup.query(u, i)
        l_ui = X_l[s2]
        del_rating = 2.0 * l_ui * (r_ui - jnp.sum(U[u] * I[i], axis=1))
        dU = dU.at[u].add(del_rating[:, None] * I[i])
        dI = dI.at[i].add(del_rating[:, None] * U[u])

        def apply(tbl, g):
            # clip summed batch gradients: the reference applies per-sample
            # hogwild updates, so colliding samples cannot compound into a
            # single huge step; the clip bounds our batched equivalent
            g = jnp.clip(g, -10.0, 10.0)
            touched = g != 0
            g = jnp.where(touched, g + reg * tbl, 0.0)
            return jnp.maximum(tbl - lr * g, 0.0)

        return (apply(U, dU), apply(I, dI), apply(UA, dUA), apply(IA, dIA))

    return jax.lax.fori_loop(0, n_iters, iteration, params)


class LRPPM(Recommender):
    """Aspect-pair ranking tensor model with composite top-aspect scoring."""

    def __init__(
        self,
        name="LRPPM",
        rating_scale=5,
        n_factors=8,
        ld=1,
        reg=0.01,
        alpha=1,
        num_top_aspects=99999,
        n_ranking_samples=1000,
        n_samples=200,
        max_iter=200000,
        lr=0.1,
        n_threads=0,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.n_threads = n_threads  # no-op: no host threading on TPU
        self.rating_scale = rating_scale
        self.n_factors = n_factors
        self.ld = ld
        self.reg = reg
        self.alpha = alpha
        self.num_top_aspects = num_top_aspects
        self.n_ranking_samples = n_ranking_samples
        self.n_samples = n_samples
        self.max_iter = max_iter
        self.lr = lr
        self.seed = seed
        self.mesh = mesh
        self.rng = get_rng(seed)

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.I = self.init_params.get("I", None)
        self.UA = self.init_params.get("UA", None)
        self.IA = self.init_params.get("IA", None)

    def _compute_quality_score(self, total_sentiment):
        return 1.0 / (1.0 + np.exp(-total_sentiment))

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.sentiment is None:
            raise ValueError("this model needs the sentiment modality attached to the eval method")
        sentiment = train_set.sentiment
        self.num_aspects = sentiment.num_aspects
        rng = self.rng

        if self.U is None:
            self.U = uniform((self.num_users, self.n_factors), random_state=rng)
        if self.I is None:
            self.I = uniform((self.num_items, self.n_factors), random_state=rng)
        if self.UA is None:
            self.UA = uniform((self.num_aspects, self.n_factors), random_state=rng)
        if self.IA is None:
            self.IA = uniform((self.num_aspects, self.n_factors), random_state=rng)

        # aspect data
        user_item_aspect = {}
        item_aspect_quality = {}
        for uid, by_item in sentiment.user_sentiment.items():
            if uid >= self.num_users:
                continue
            for iid, tup_idx in by_item.items():
                for aid, oid, polarity in sentiment.sentiment[tup_idx]:
                    user_item_aspect[(uid, iid, aid)] = (
                        user_item_aspect.get((uid, iid, aid), 0) + polarity
                    )
                    item_aspect_quality[(iid, aid)] = (
                        item_aspect_quality.get((iid, aid), 0) + polarity
                    )

        iq_i, iq_a, iq_v = [], [], []
        for (iid, aid), total in item_aspect_quality.items():
            iq_i.append(iid)
            iq_a.append(aid)
            iq_v.append(self._compute_quality_score(total))
        self.item_aspect_quality = sp.csr_matrix(
            (iq_v, (iq_i, iq_a)), shape=(self.num_items, self.num_aspects)
        )

        if not self.trainable:
            return self

        ui_num_aspects = {}
        for (uid, iid, aid) in user_item_aspect:
            ui_num_aspects[(uid, iid)] = ui_num_aspects.get((uid, iid), 0) + 1

        X_u, X_i, X_a, X_l = [], [], [], []
        for (uid, iid, aid) in user_item_aspect:
            X_u.append(uid)
            X_i.append(iid)
            X_a.append(aid)
            cnt = ui_num_aspects[(uid, iid)]
            neg_cnt = max(self.num_aspects - cnt, 1)
            X_l.append(1.0 / (cnt * neg_cnt))

        rid, cid, rvals = train_set.uir_tuple
        csr = train_set.csr_matrix
        if not csr.has_sorted_indices:
            csr = csr.sorted_indices()
        rating_lookup = CsrLookup.build(csr)

        # aspect CSR keyed by the pair's nnz position in the rating CSR
        pair_pos = {}
        for u_ in range(self.num_users):
            for p in range(csr.indptr[u_], csr.indptr[u_ + 1]):
                pair_pos[(u_, int(csr.indices[p]))] = p
        rows = [[] for _ in range(csr.nnz)]
        for (uid, iid, aid) in user_item_aspect:
            p = pair_pos.get((uid, iid))
            if p is not None:
                rows[p].append(aid)
        aspect_indptr = np.zeros(csr.nnz + 1, dtype=np.int32)
        aspect_indices = []
        for p, aids in enumerate(rows):
            aspect_indices.extend(sorted(aids))
            aspect_indptr[p + 1] = len(aspect_indices)
        aspect_indices = np.asarray(aspect_indices, dtype=np.int32)

        params = tuple(
            jnp.asarray(t, dtype=jnp.float32)
            for t in (self.U, self.I, self.UA, self.IA)
        )
        batch_sharding = None
        n_s_eff, n_r_eff = self.n_samples, self.n_ranking_samples
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_sharding = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            msz = self.mesh.size
            n_s_eff = max(msz, n_s_eff - n_s_eff % msz)
            n_r_eff = max(msz, n_r_eff - n_r_eff % msz)
            params = replicate_all(self.mesh, params)
        params = _lrppm_fit(
            params,
            jax.random.PRNGKey(rng.randint(2**31)),
            jnp.asarray(rid, dtype=jnp.int32),
            jnp.asarray(cid, dtype=jnp.int32),
            jnp.asarray(rvals, dtype=jnp.float32),
            jnp.asarray(X_u, dtype=jnp.int32),
            jnp.asarray(X_i, dtype=jnp.int32),
            jnp.asarray(X_a, dtype=jnp.int32),
            jnp.asarray(X_l, dtype=jnp.float32),
            jnp.asarray(aspect_indptr),
            jnp.asarray(aspect_indices),
            rating_lookup,
            self.num_aspects,
            jnp.float32(self.lr),
            jnp.float32(self.reg),
            jnp.float32(self.ld),
            jnp.int32(self.max_iter),
            n_samples=n_s_eff,
            n_ranking=n_r_eff,
            aspect_steps=max(
                1, int(np.diff(aspect_indptr).max(initial=0)).bit_length() + 1
            ),
            batch_sharding=batch_sharding,
        )
        self.U, self.I, self.UA, self.IA = (
            np.asarray(t, dtype=np.float64) for t in params
        )
        return self

    def score(self, u_idx, i_idx=None):
        if self.is_unknown_user(u_idx):
            raise ScoreException("Can't make score prediction for user %d" % u_idx)
        if i_idx is None:
            return self.I @ self.U[u_idx]
        if not self.knows_item(i_idx):
            raise ScoreException("Can't make score prediction for item %d" % i_idx)
        return self.I[i_idx] @ self.U[u_idx]

    def _composite_scores(self, users):
        """Reference rank() override: alpha-weighted mean of top-aspect
        (score x quality) plus (1-alpha) rating score."""
        B = len(users)
        base = self.U[users] @ self.I.T  # (B, n_items)
        if not (self.alpha > 0 and self.num_top_aspects > 0):
            return base
        kta = min(self.num_top_aspects, self.num_aspects)
        qual = np.asarray(self.item_aspect_quality.todense())  # (n_items, n_asp)
        out = np.empty_like(base)
        for b, u in enumerate(users):
            item_aspect = (
                (self.UA @ self.U[u])[None, :]
                + self.I @ self.IA.T
                + base[b][:, None]
            )  # (n_items, n_aspects)
            top_ids = np.argsort(-item_aspect, axis=1)[:, :kta]
            rows = np.arange(self.num_items)[:, None]
            top_scores = item_aspect[rows, top_ids]
            out[b] = (
                self.alpha
                * (top_scores * qual[rows, top_ids]).mean(axis=1)
                * self.rating_scale
                + (1 - self.alpha) * base[b]
            )
        return out

    def rank(self, user_idx, item_indices=None, k=-1, **kwargs):
        if not (self.alpha > 0 and self.num_top_aspects > 0):
            return super().rank(user_idx, item_indices, k, **kwargs)
        known_item_scores = self._composite_scores(np.asarray([user_idx]))[0]
        all_item_scores = np.ones(self.total_items) * np.min(known_item_scores)
        all_item_scores[: self.num_items] = known_item_scores
        item_indices = (
            np.arange(self.num_items)
            if item_indices is None
            else np.asarray(item_indices)
        )
        item_scores = all_item_scores[item_indices]
        if k != -1:
            partitioned_idx = np.argpartition(item_scores, -k)
            top_k_idx = partitioned_idx[-k:]
            sorted_top_k_idx = top_k_idx[np.argsort(item_scores[top_k_idx])]
            partitioned_idx[-k:] = sorted_top_k_idx
            ranked_items = item_indices[partitioned_idx[::-1]]
        else:
            ranked_items = item_indices[item_scores.argsort()[::-1]]
        return ranked_items, item_scores

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = self._composite_scores(np.where(known, users, 0))
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
