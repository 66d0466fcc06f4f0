"""Companion — Comparative Aspects and Opinions Ranking for Recommendation
Explanations (Le & Lauw, 2024).

Capability parity with reference
``cornac/models/companion/recom_companion.pyx:50`` (1043-line Cython/OpenMP
engine): Tucker tensors G1 (user-item-aspect) plus *stacked* opinion
tensors G2/G3 of shape (n_user_factors + n_item_factors, aspect, opinion)
— positive and negative opinion channels respectively, predicted as the
sum of the user half and item half — trained with sampled element
reconstruction, overall-rating BPR, aspect-ranking (vs random aspect, and
vs random item), and positive/negative opinion-ranking streams; Adagrad
with non-negativity projection.

TPU redesign: the reference's nested pointer-chasing lookups
(``IntFloatDict`` over 3- and 4-part keys) become chained compact CSR
lookups (pair→position, position×aspect→position, position×opinion), so
every sampled stream is a batched einsum + scatter-add inside one
compiled iteration loop — same scaffold as ``mter.py``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..exception import ScoreException
from ..ops.csr_lookup import CsrLookup
from ..utils.init_utils import uniform
from .mter import MTER, _tucker3
from .recommender import Recommender


def _split_pred(G, nu, Uu, Ii, Aa, Oo):
    """Stacked-tensor prediction: user half + item half."""
    return _tucker3(G[:nu], Uu, Aa, Oo) + _tucker3(G[nu:], Ii, Aa, Oo)


@partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=(
        "n_el", "n_bpr", "n_asp_rank", "n_op_rank", "nu", "batch_sharding"
    ),
)
def _companion_fit(
    state, key,
    X, X_u, X_i, X_a,
    YP, YP_u, YP_i, YP_a, YP_o,
    YN, YN_u, YN_i, YN_a, YN_o,
    rat_users, rat_items,
    rating_lookup, uia_lookup, pos_op_lookup, neg_op_lookup,
    lr, ld_reg, ld_bpr, ld_p, ld_a, ld_y, ld_z,
    n_iters, n_el, n_bpr, n_asp_rank, n_op_rank, nu,
    batch_sharding=None,
):
    params, sgrads = state
    # mesh: sharded sample streams -> GSPMD shards the per-sample work
    # and psums the scatter-adds into the replicated tables
    _shard = (
        (lambda x: jax.lax.with_sharding_constraint(x, batch_sharding))
        if batch_sharding is not None
        else (lambda x: x)
    )
    n_items = params["I"].shape[0]
    n_aspects = params["A"].shape[0] - 1
    n_opinions = params["O"].shape[0]
    eps = 1e-9

    def uia_score(params, u, i, a):
        return _tucker3(params["G1"], params["U"][u], params["I"][i], params["A"][a])

    def add_g1_grads(grads, w, u, i, a, Uu, Ii, Aa, params):
        """G1-stream gradient: d(pred)/dθ scaled by w (signed weight)."""
        G1 = params["G1"]
        grads["G1"] = grads["G1"] + jnp.einsum("s,sp,sq,sr->pqr", w, Uu, Ii, Aa)
        grads["U"] = grads["U"].at[u].add(
            jnp.einsum("s,sq,sr,pqr->sp", w, Ii, Aa, G1)
        )
        grads["I"] = grads["I"].at[i].add(
            jnp.einsum("s,sp,sr,pqr->sq", w, Uu, Aa, G1)
        )
        grads["A"] = grads["A"].at[a].add(
            jnp.einsum("s,sp,sq,pqr->sr", w, Uu, Ii, G1)
        )
        return grads

    def add_split_grads(grads, gname, w, u, i, a, o, params):
        """Stacked opinion tensor stream (G2 or G3)."""
        G = params[gname]
        Uu, Ii = params["U"][u], params["I"][i]
        Aa, Oo = params["A"][a], params["O"][o]
        grads[gname] = (
            grads[gname]
            .at[:nu].add(jnp.einsum("s,sp,sq,sr->pqr", w, Uu, Aa, Oo))
            .at[nu:].add(jnp.einsum("s,sp,sq,sr->pqr", w, Ii, Aa, Oo))
        )
        grads["U"] = grads["U"].at[u].add(
            jnp.einsum("s,sq,sr,pqr->sp", w, Aa, Oo, G[:nu])
        )
        grads["I"] = grads["I"].at[i].add(
            jnp.einsum("s,sq,sr,pqr->sp", w, Aa, Oo, G[nu:])
        )
        grads["A"] = grads["A"].at[a].add(
            jnp.einsum("s,sp,sr,pqr->sq", w, Uu, Oo, G[:nu])
            + jnp.einsum("s,sp,sr,pqr->sq", w, Ii, Oo, G[nu:])
        )
        grads["O"] = grads["O"].at[o].add(
            jnp.einsum("s,sp,sq,pqr->sr", w, Uu, Aa, G[:nu])
            + jnp.einsum("s,sp,sq,pqr->sr", w, Ii, Aa, G[nu:])
        )
        return grads

    def iteration(it, state):
        params, sgrads = state
        ikey = jax.random.fold_in(key, it)
        keys = jax.random.split(ikey, 12)
        grads = {name: jnp.zeros_like(p) for name, p in params.items()}

        # --- element reconstruction streams ---------------------------
        s1 = _shard(jax.random.randint(keys[0], (n_el,), 0, X.shape[0]))
        u, i, a = X_u[s1], X_i[s1], X_a[s1]
        Uu, Ii, Aa = params["U"][u], params["I"][i], params["A"][a]
        pred = _tucker3(params["G1"], Uu, Ii, Aa)
        grads = add_g1_grads(grads, 2.0 * (pred - X[s1]), u, i, a, Uu, Ii, Aa, params)

        s2 = _shard(jax.random.randint(keys[1], (n_el,), 0, YP.shape[0]))
        u, i, a, o = YP_u[s2], YP_i[s2], YP_a[s2], YP_o[s2]
        pred = _split_pred(
            params["G2"], nu, params["U"][u], params["I"][i],
            params["A"][a], params["O"][o],
        )
        grads = add_split_grads(
            grads, "G2", 2.0 * (pred - YP[s2]), u, i, a, o, params
        )

        s3 = _shard(jax.random.randint(keys[2], (n_el,), 0, YN.shape[0]))
        u, i, a, o = YN_u[s3], YN_i[s3], YN_a[s3], YN_o[s3]
        pred = _split_pred(
            params["G3"], nu, params["U"][u], params["I"][i],
            params["A"][a], params["O"][o],
        )
        grads = add_split_grads(
            grads, "G3", 2.0 * (pred - YN[s3]), u, i, a, o, params
        )

        # --- overall-rating BPR (recom_companion.pyx:696-727) ---------
        pos_idx = _shard(jax.random.randint(keys[3], (n_bpr,), 0, rat_users.shape[0]))
        u = rat_users[pos_idx]
        i = rat_items[pos_idx]
        j = _shard(jax.random.randint(keys[4], (n_bpr,), 0, n_items))
        found, j_rating = rating_lookup.query(u, j)
        _, i_rating = rating_lookup.query(u, i)
        s = jnp.where(found & (i_rating < j_rating), -1.0, 1.0)
        valid = ~(found & (i_rating == j_rating))
        Uu = params["U"][u]
        Ii, Ij = params["I"][i], params["I"][j]
        Aov = jnp.broadcast_to(
            params["A"][n_aspects], (n_bpr, params["A"].shape[1])
        )
        pred = (
            _tucker3(params["G1"], Uu, Ii, Aov)
            - _tucker3(params["G1"], Uu, Ij, Aov)
        ) * s
        del_bpr = ld_bpr * (1.0 / (1.0 + jnp.exp(pred))) * s * valid
        i_ij = Ii - Ij
        grads["G1"] = grads["G1"] - jnp.einsum(
            "s,sp,sq,sr->pqr", del_bpr, Uu, i_ij, Aov
        )
        grads["U"] = grads["U"].at[u].add(
            -jnp.einsum("s,sq,sr,pqr->sp", del_bpr, i_ij, Aov, params["G1"])
        )
        g_i = jnp.einsum("s,sp,sr,pqr->sq", del_bpr, Uu, Aov, params["G1"])
        grads["I"] = grads["I"].at[i].add(-g_i).at[j].add(g_i)
        grads["A"] = grads["A"].at[n_aspects].add(
            -jnp.einsum("s,sp,sq,pqr->r", del_bpr, Uu, i_ij, params["G1"])
        )

        # --- aspect ranking vs random aspect (ld_p) -------------------
        sp_ = _shard(jax.random.randint(keys[5], (n_asp_rank,), 0, X.shape[0]))
        u, i, a = X_u[sp_], X_i[sp_], X_a[sp_]
        a_j = _shard(jax.random.randint(keys[6], (n_asp_rank,), 0, n_aspects))
        foundp, pos_p = uia_lookup.query_pair(u, i)
        found_j, j_score, _ = uia_lookup.query_aspect(pos_p, a_j)
        i_score = X[sp_]
        s = jnp.where(found_j & (i_score < j_score), -1.0, 1.0)
        valid = ~(found_j & (i_score == j_score))
        Uu, Ii = params["U"][u], params["I"][i]
        Aa, Aj = params["A"][a], params["A"][a_j]
        pred = (uia_score(params, u, i, a) - uia_score(params, u, i, a_j)) * s
        w = -ld_p * (1.0 / (1.0 + jnp.exp(pred))) * s * valid
        a_diff = Aa - Aj
        grads["G1"] = grads["G1"] + jnp.einsum(
            "s,sp,sq,sr->pqr", w, Uu, Ii, a_diff
        )
        grads["U"] = grads["U"].at[u].add(
            jnp.einsum("s,sq,sr,pqr->sp", w, Ii, a_diff, params["G1"])
        )
        grads["I"] = grads["I"].at[i].add(
            jnp.einsum("s,sp,sr,pqr->sq", w, Uu, a_diff, params["G1"])
        )
        g_a = jnp.einsum("s,sp,sq,pqr->sr", w, Uu, Ii, params["G1"])
        grads["A"] = grads["A"].at[a].add(g_a).at[a_j].add(-g_a)

        # --- aspect ranking vs random item (ld_a) ---------------------
        si = _shard(jax.random.randint(keys[7], (n_asp_rank,), 0, X.shape[0]))
        u, i, a = X_u[si], X_i[si], X_a[si]
        i_j = _shard(jax.random.randint(keys[8], (n_asp_rank,), 0, n_items))
        found_pj, pos_pj = uia_lookup.query_pair(u, i_j)
        found_ja, j_score, _ = uia_lookup.query_aspect(pos_pj, a)
        i_score = X[si]
        s = jnp.where(found_ja & (i_score < j_score), -1.0, 1.0)
        valid = ~(found_ja & (i_score == j_score))
        Uu, Aa = params["U"][u], params["A"][a]
        Ii, Ij = params["I"][i], params["I"][i_j]
        pred = (uia_score(params, u, i, a) - uia_score(params, u, i_j, a)) * s
        w = -ld_a * (1.0 / (1.0 + jnp.exp(pred))) * s * valid
        i_diff = Ii - Ij
        grads["G1"] = grads["G1"] + jnp.einsum(
            "s,sp,sq,sr->pqr", w, Uu, i_diff, Aa
        )
        grads["U"] = grads["U"].at[u].add(
            jnp.einsum("s,sq,sr,pqr->sp", w, i_diff, Aa, params["G1"])
        )
        g_i = jnp.einsum("s,sp,sr,pqr->sq", w, Uu, Aa, params["G1"])
        grads["I"] = grads["I"].at[i].add(g_i).at[i_j].add(-g_i)
        grads["A"] = grads["A"].at[a].add(
            jnp.einsum("s,sp,sq,pqr->sr", w, Uu, i_diff, params["G1"])
        )

        # --- opinion ranking streams (ld_y positive / ld_z negative) --
        for gname, Yv, Yu, Yi, Ya, Yo, lookup, ld in (
            ("G2", YP, YP_u, YP_i, YP_a, YP_o, pos_op_lookup, ld_y),
            ("G3", YN, YN_u, YN_i, YN_a, YN_o, neg_op_lookup, ld_z),
        ):
            ko = jax.random.fold_in(keys[9], 0 if gname == "G2" else 1)
            so = _shard(jax.random.randint(ko, (n_op_rank,), 0, Yv.shape[0]))
            u, i, a, o = Yu[so], Yi[so], Ya[so], Yo[so]
            o_j = jax.random.randint(
                jax.random.fold_in(ko, 1), (n_op_rank,), 0, n_opinions
            )
            found_o, j_score = lookup.query(so, o_j)
            i_score = Yv[so]
            s = jnp.where(found_o & (i_score < j_score), -1.0, 1.0)
            valid = ~(found_o & (i_score == j_score))
            Uu, Ii = params["U"][u], params["I"][i]
            Aa = params["A"][a]
            Oo, Oj = params["O"][o], params["O"][o_j]
            pred = (
                _split_pred(params[gname], nu, Uu, Ii, Aa, Oo)
                - _split_pred(params[gname], nu, Uu, Ii, Aa, Oj)
            ) * s
            w = -ld * (1.0 / (1.0 + jnp.exp(pred))) * s * valid
            o_diff = Oo - Oj
            G = params[gname]
            grads[gname] = (
                grads[gname]
                .at[:nu].add(jnp.einsum("s,sp,sq,sr->pqr", w, Uu, Aa, o_diff))
                .at[nu:].add(jnp.einsum("s,sp,sq,sr->pqr", w, Ii, Aa, o_diff))
            )
            grads["U"] = grads["U"].at[u].add(
                jnp.einsum("s,sq,sr,pqr->sp", w, Aa, o_diff, G[:nu])
            )
            grads["I"] = grads["I"].at[i].add(
                jnp.einsum("s,sq,sr,pqr->sp", w, Aa, o_diff, G[nu:])
            )
            grads["A"] = grads["A"].at[a].add(
                jnp.einsum("s,sp,sr,pqr->sq", w, Uu, o_diff, G[:nu])
                + jnp.einsum("s,sp,sr,pqr->sq", w, Ii, o_diff, G[nu:])
            )
            g_o = (
                jnp.einsum("s,sp,sq,pqr->sr", w, Uu, Aa, G[:nu])
                + jnp.einsum("s,sp,sq,pqr->sr", w, Ii, Aa, G[nu:])
            )
            grads["O"] = grads["O"].at[o].add(g_o).at[o_j].add(-g_o)

        # --- Adagrad + reg + non-negativity ---------------------------
        new_params, new_sgrads = {}, {}
        for name in params:
            g = grads[name]
            touched = g != 0
            g_reg = jnp.where(touched, g + ld_reg * params[name], 0.0)
            sg = sgrads[name] + eps + g_reg * g_reg
            new_sgrads[name] = sg
            new_params[name] = jnp.maximum(
                params[name] - (lr / jnp.sqrt(sg)) * g_reg, 0.0
            )
        return new_params, new_sgrads

    return jax.lax.fori_loop(0, n_iters, iteration, state)


class _PairAspectLookup:
    """Two-level device lookup: (u, i) -> pair position, then
    (pair position, aspect) -> (found, score, entry position).

    Avoids int64 triple keys (x64 disabled) by chaining compact CSR
    lookups — same trick as ``lrppm.py``."""

    def __init__(self, pair_lookup, aspect_lookup):
        self.pair = pair_lookup
        self.aspect = aspect_lookup

    def query_pair(self, u, i):
        found, _, pos = self.pair.query_position(u, i)
        return found, jnp.where(found, pos, 0)

    def query_aspect(self, pos, a):
        return self.aspect.query_position(pos, a)

    def tree_flatten(self):
        return (self.pair, self.aspect), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    _PairAspectLookup,
    _PairAspectLookup.tree_flatten,
    lambda aux, children: _PairAspectLookup(*children),
)


class Companion(MTER):
    """Comparative aspect/opinion ranking Tucker model."""

    def __init__(
        self,
        name="Companion",
        rating_scale=5.0,
        n_user_factors=8,
        n_item_factors=8,
        n_aspect_factors=8,
        n_opinion_factors=8,
        n_element_samples=50,
        n_bpr_samples=1000,
        n_aspect_ranking_samples=1000,
        n_opinion_ranking_samples=1000,
        n_top_aspects=100,
        alpha=0.5,
        min_user_freq=2,
        min_pair_freq=1,
        min_common_freq=1,
        use_item_aspect_popularity=True,
        enum_window=None,
        lambda_reg=0.1,
        lambda_bpr=10,
        lambda_p=10,
        lambda_a=10,
        lambda_y=10,
        lambda_z=10,
        max_iter=200000,
        lr=0.5,
        n_threads=0,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        MTER.__init__(
            self,
            name=name,
            rating_scale=rating_scale,
            n_user_factors=n_user_factors,
            n_item_factors=n_item_factors,
            n_aspect_factors=n_aspect_factors,
            n_opinion_factors=n_opinion_factors,
            n_bpr_samples=n_bpr_samples,
            n_element_samples=n_element_samples,
            lambda_reg=lambda_reg,
            lambda_bpr=lambda_bpr,
            max_iter=max_iter,
            lr=lr,
            mesh=mesh,
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
        )
        self.n_aspect_ranking_samples = n_aspect_ranking_samples
        self.n_opinion_ranking_samples = n_opinion_ranking_samples
        self.n_top_aspects = n_top_aspects
        self.alpha = alpha
        # Signature parity: the reference Companion accepts these but never
        # reads them (recom_companion.pyx:147-154 — not even stored except
        # the popularity flag, whose item-quality matrix is built and then
        # discarded, ":262-268,:342 vs the _build_data return tuple).
        self.min_user_freq = min_user_freq
        self.min_pair_freq = min_pair_freq
        self.min_common_freq = min_common_freq
        self.use_item_aspect_popularity = use_item_aspect_popularity
        self.enum_window = enum_window
        self.lambda_p = lambda_p
        self.lambda_a = lambda_a
        self.lambda_y = lambda_y
        self.lambda_z = lambda_z
        self.n_threads = n_threads  # API parity

    def _init(self, train_set):
        """Stacked G2/G3 shapes differ from MTER."""
        sentiment = train_set.sentiment
        self.num_aspects = sentiment.num_aspects
        self.num_opinions = sentiment.num_opinions
        rng = self.rng
        nu, ni = self.n_user_factors, self.n_item_factors
        if self.G1 is None:
            self.G1 = uniform(
                (nu, ni, self.n_aspect_factors), random_state=rng
            )
        if self.G2 is None:
            self.G2 = uniform(
                (nu + ni, self.n_aspect_factors, self.n_opinion_factors),
                random_state=rng,
            )
        if self.G3 is None:
            self.G3 = uniform(
                (nu + ni, self.n_aspect_factors, self.n_opinion_factors),
                random_state=rng,
            )
        if self.U is None:
            self.U = uniform((self.num_users, nu), random_state=rng)
        if self.I is None:
            self.I = uniform((self.num_items, ni), random_state=rng)
        if self.A is None:
            self.A = uniform(
                (self.num_aspects + 1, self.n_aspect_factors), random_state=rng
            )
        if self.O is None:
            self.O = uniform(
                (self.num_opinions, self.n_opinion_factors), random_state=rng
            )

    def _build_data(self, data_set):
        """uia scores + per-(u,i,a) positive/negative opinion counts
        (recom_companion.pyx:270-355)."""
        sentiment = data_set.sentiment
        u_arr, i_arr, r_vals = data_set.uir_tuple
        rating_matrix = sp.csr_matrix(
            (r_vals, (u_arr, i_arr)), shape=(self.num_users, self.num_items)
        )

        uia = {}
        pos_op = {}
        neg_op = {}
        for u_idx, by_item in sentiment.user_sentiment.items():
            if u_idx >= self.num_users:
                continue
            for i_idx, tup_idx in by_item.items():
                uia[(u_idx, i_idx, sentiment.num_aspects)] = rating_matrix[
                    u_idx, i_idx
                ]
                for a_idx, o_idx, polarity in sentiment.sentiment[tup_idx]:
                    uia[(u_idx, i_idx, a_idx)] = (
                        uia.get((u_idx, i_idx, a_idx), 0) + polarity
                    )
                    pos_op.setdefault((u_idx, i_idx, a_idx, o_idx), 0)
                    neg_op.setdefault((u_idx, i_idx, a_idx, o_idx), 0)
                    if polarity > 0:
                        pos_op[(u_idx, i_idx, a_idx, o_idx)] += polarity
                    elif polarity < 0:
                        neg_op[(u_idx, i_idx, a_idx, o_idx)] += abs(polarity)

        for key in uia:
            if key[2] != sentiment.num_aspects:
                uia[key] = self._compute_quality_score(uia[key])
        for key in pos_op:
            pos_op[key] = self._compute_attention_score(pos_op[key])
        for key in neg_op:
            neg_op[key] = self._compute_attention_score(neg_op[key])
        return rating_matrix, uia, pos_op, neg_op

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.sentiment is None:
            raise ValueError("this model needs the sentiment modality attached to the eval method")
        self._init(train_set)
        if not self.trainable:
            return self

        rating_matrix, uia, pos_op, neg_op = self._build_data(train_set)

        # element arrays (excluding the overall-rating pseudo aspect for
        # the ranking lookup; kept for the reconstruction stream)
        uia_items = [(k, v) for k, v in uia.items()]
        X = np.asarray([v for _, v in uia_items], np.float32)
        X_u = np.asarray([k[0] for k, _ in uia_items], np.int32)
        X_i = np.asarray([k[1] for k, _ in uia_items], np.int32)
        X_a = np.asarray([k[2] for k, _ in uia_items], np.int32)

        def quad_arrays(d):
            items = list(d.items())
            return (
                np.asarray([v for _, v in items], np.float32),
                np.asarray([k[0] for k, _ in items], np.int32),
                np.asarray([k[1] for k, _ in items], np.int32),
                np.asarray([k[2] for k, _ in items], np.int32),
                np.asarray([k[3] for k, _ in items], np.int32),
                items,
            )

        YP, YP_u, YP_i, YP_a, YP_o, pos_items = quad_arrays(pos_op)
        YN, YN_u, YN_i, YN_a, YN_o, neg_items = quad_arrays(neg_op)

        # chained lookups: (u,i) -> pair pos; (pair pos, aspect) -> score
        pair_lookup = CsrLookup.build(rating_matrix)
        n_pairs = rating_matrix.nnz
        pair_pos = {}  # (u, i) -> nnz position
        coo = rating_matrix.tocoo()
        # CSR order: sorted by row then column
        order = np.lexsort((coo.col, coo.row))
        for p, idx in enumerate(order):
            pair_pos[(int(coo.row[idx]), int(coo.col[idx]))] = p
        uia_rows = [
            pair_pos[(int(k[0]), int(k[1]))]
            for k, _ in uia_items
            if k[2] != self.num_aspects
        ]
        uia_cols = [int(k[2]) for k, _ in uia_items if k[2] != self.num_aspects]
        uia_vals = [float(v) for k, v in uia_items if k[2] != self.num_aspects]
        uia_csr = sp.csr_matrix(
            (uia_vals, (uia_rows, uia_cols)),
            shape=(n_pairs, self.num_aspects),
        )
        uia_lookup = _PairAspectLookup(pair_lookup, CsrLookup.build(uia_csr))

        # opinion lookups keyed by the ELEMENT index of YP/YN rows:
        # row = sample index of the (u,i,a) element drawn, col = opinion.
        # The ranking stream draws a row of YP and a random opinion o_j,
        # asking "does (u,i,a,o_j) exist with what score" — build a CSR
        # over (element row of same (u,i,a) group, opinion).
        def opinion_lookup(items, n_rows):
            group = {}
            for row_id, (k, _) in enumerate(items):
                group.setdefault((k[0], k[1], k[2]), []).append(row_id)
            rows, cols, vals = [], [], []
            for row_id, (k, v) in enumerate(items):
                for sibling in group[(k[0], k[1], k[2])]:
                    sk, sv = items[sibling]
                    rows.append(row_id)
                    cols.append(sk[3])
                    vals.append(sv)
            m = sp.csr_matrix(
                (vals, (rows, cols)), shape=(n_rows, self.num_opinions)
            )
            m.sum_duplicates()
            return CsrLookup.build(m)

        pos_op_lookup = opinion_lookup(pos_items, len(pos_items))
        neg_op_lookup = opinion_lookup(neg_items, len(neg_items))

        rid, cid, _ = train_set.uir_tuple

        params = {
            "G1": jnp.asarray(self.G1, dtype=jnp.float32),
            "G2": jnp.asarray(self.G2, dtype=jnp.float32),
            "G3": jnp.asarray(self.G3, dtype=jnp.float32),
            "U": jnp.asarray(self.U, dtype=jnp.float32),
            "I": jnp.asarray(self.I, dtype=jnp.float32),
            "A": jnp.asarray(self.A, dtype=jnp.float32),
            "O": jnp.asarray(self.O, dtype=jnp.float32),
        }
        sgrads = {k: jnp.zeros_like(v) for k, v in params.items()}

        batch_sharding = None
        eff = {
            "n_el": self.n_element_samples,
            "n_bpr": self.n_bpr_samples,
            "n_asp_rank": self.n_aspect_ranking_samples,
            "n_op_rank": self.n_opinion_ranking_samples,
        }
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_sharding = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            msz = self.mesh.size
            eff = {k_: max(msz, v - v % msz) for k_, v in eff.items()}
            params, sgrads = replicate_all(self.mesh, params, sgrads)

        params, sgrads = _companion_fit(
            (params, sgrads),
            jax.random.PRNGKey(self.rng.randint(2**31)),
            jnp.asarray(X), jnp.asarray(X_u), jnp.asarray(X_i), jnp.asarray(X_a),
            jnp.asarray(YP), jnp.asarray(YP_u), jnp.asarray(YP_i),
            jnp.asarray(YP_a), jnp.asarray(YP_o),
            jnp.asarray(YN), jnp.asarray(YN_u), jnp.asarray(YN_i),
            jnp.asarray(YN_a), jnp.asarray(YN_o),
            jnp.asarray(rid, dtype=jnp.int32),
            jnp.asarray(cid, dtype=jnp.int32),
            pair_lookup, uia_lookup, pos_op_lookup, neg_op_lookup,
            jnp.float32(self.lr),
            jnp.float32(self.lambda_reg),
            jnp.float32(self.lambda_bpr),
            jnp.float32(self.lambda_p),
            jnp.float32(self.lambda_a),
            jnp.float32(self.lambda_y),
            jnp.float32(self.lambda_z),
            jnp.int32(self.max_iter),
            n_el=eff["n_el"],
            n_bpr=eff["n_bpr"],
            n_asp_rank=eff["n_asp_rank"],
            n_op_rank=eff["n_op_rank"],
            nu=self.n_user_factors,
            batch_sharding=batch_sharding,
        )

        for name in ("G1", "G2", "G3", "U", "I", "A", "O"):
            setattr(self, name, np.asarray(params[name], dtype=np.float64))
        return self
