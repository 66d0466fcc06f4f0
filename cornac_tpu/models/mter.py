"""MTER — Multi-Task Explainable Recommendation (Wang et al., SIGIR 2018).

Capability parity with reference ``cornac/models/mter/recom_mter.pyx:59``
(730-line Cython/OpenMP engine: sampled Tucker-decomposition SGD over three
tensors — user-item-aspect X, user-aspect-opinion YU, item-aspect-opinion
YI — plus a BPR term on the overall-rating slice, Adagrad with
non-negativity projection). TPU redesign: each iteration's sampled
gradients are batched einsums + scatter-adds, the Adagrad/projection update
is elementwise table math, and ``max_iter`` iterations run as one fused
``lax.fori_loop`` device program. The reference's rating-order reversal for
observed negatives uses the device CSR value lookup.
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


def _tucker3(G, u, i, a):
    """einsum over sample batches: (S,p)(S,q)(S,r)(p,q,r) -> (S,)"""
    return jnp.einsum("sp,sq,sr,pqr->s", u, i, a, G)


@partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("n_el", "n_bpr", "n_pair", "batch_sharding"),
)
def _mter_fit(
    state,
    key,
    X, X_u, X_i, X_a,
    YU, YU_u, YU_a, YU_o,
    YI, YI_i, YI_a, YI_o,
    rat_users, rat_items,
    rating_lookup,
    lr, ld_reg, ld_bpr,
    n_iters,
    n_el,
    n_bpr,
    # optional comparative-constraint stream (ComparERSub); n_pair=0 => off
    p_u=None, p_early=None, p_late=None, p_asp=None, ld_d=None, n_pair=0,
    batch_sharding=None,
):
    params, sgrads = state
    # mesh: annotating every sampled index stream with the data-axis
    # sharding makes GSPMD shard the per-sample einsum work and psum the
    # scatter-add accumulations into the replicated tables
    shard = (
        (lambda x: jax.lax.with_sharding_constraint(x, batch_sharding))
        if batch_sharding is not None
        else (lambda x: x)
    )
    n_items = params["I"].shape[0]
    n_aspects = params["A"].shape[0] - 1  # last row = overall-rating aspect
    eps = 1e-9

    def stream_grads(G, T1, T2, T3, idx1, idx2, idx3, target, grads, names):
        """One sampled tensor stream's gradient contributions."""
        t1, t2, t3 = T1[idx1], T2[idx2], T3[idx3]
        pred = _tucker3(G, t1, t2, t3)
        e = 2.0 * (pred - target)
        gG = jnp.einsum("s,sp,sq,sr->pqr", e, t1, t2, t3)
        g1 = jnp.einsum("s,sq,sr,pqr->sp", e, t2, t3, G)
        g2 = jnp.einsum("s,sp,sr,pqr->sq", e, t1, t3, G)
        g3 = jnp.einsum("s,sp,sq,pqr->sr", e, t1, t2, G)
        grads[names[0]] = grads[names[0]] + gG
        grads[names[1]] = grads[names[1]].at[idx1].add(g1)
        grads[names[2]] = grads[names[2]].at[idx2].add(g2)
        grads[names[3]] = grads[names[3]].at[idx3].add(g3)
        return grads

    def iteration(it, state):
        params, sgrads = state
        ikey = jax.random.fold_in(key, it)
        k1, k2, k3, k4, k5 = jax.random.split(ikey, 5)

        grads = {name: jnp.zeros_like(p) for name, p in params.items()}

        # three sampled tensor-reconstruction streams
        s1 = shard(jax.random.randint(k1, (n_el,), 0, X.shape[0]))
        grads = stream_grads(
            params["G1"], params["U"], params["I"], params["A"],
            X_u[s1], X_i[s1], X_a[s1], X[s1], grads, ("G1", "U", "I", "A"),
        )
        s2 = shard(jax.random.randint(k2, (n_el,), 0, YU.shape[0]))
        grads = stream_grads(
            params["G2"], params["U"], params["A"], params["O"],
            YU_u[s2], YU_a[s2], YU_o[s2], YU[s2], grads, ("G2", "U", "A", "O"),
        )
        s3 = shard(jax.random.randint(k3, (n_el,), 0, YI.shape[0]))
        grads = stream_grads(
            params["G3"], params["I"], params["A"], params["O"],
            YI_i[s3], YI_a[s3], YI_o[s3], YI[s3], grads, ("G3", "I", "A", "O"),
        )

        # BPR stream on the overall-rating slice (aspect index = n_aspects)
        pos_idx = shard(jax.random.randint(k4, (n_bpr,), 0, rat_users.shape[0]))
        u = rat_users[pos_idx]
        i = rat_items[pos_idx]
        j = shard(jax.random.randint(k5, (n_bpr,), 0, n_items))

        found, j_rating = rating_lookup.query(u, j)
        _, i_rating = rating_lookup.query(u, i)
        # unobserved j: s=+1; observed with lower rating: s=-1; equal: skip
        s = jnp.where(found & (i_rating < j_rating), -1.0, 1.0)
        valid = ~(found & (i_rating == j_rating))

        Uu = params["U"][u]
        Ii, Ij = params["I"][i], params["I"][j]
        Aov = jnp.broadcast_to(params["A"][n_aspects], (n_bpr, params["A"].shape[1]))
        pred = (_tucker3(params["G1"], Uu, Ii, Aov) - _tucker3(params["G1"], Uu, Ij, Aov)) * s
        z = 1.0 / (1.0 + jnp.exp(pred))
        del_bpr = ld_bpr * z * s * valid

        i_ij = Ii - Ij
        grads["G1"] = grads["G1"] - jnp.einsum("s,sp,sq,sr->pqr", del_bpr, Uu, i_ij, Aov)
        grads["U"] = grads["U"].at[u].add(
            -jnp.einsum("s,sq,sr,pqr->sp", del_bpr, i_ij, Aov, params["G1"])
        )
        g_i = jnp.einsum("s,sp,sr,pqr->sq", del_bpr, Uu, Aov, params["G1"])
        grads["I"] = grads["I"].at[i].add(-g_i).at[j].add(g_i)
        grads["A"] = grads["A"].at[n_aspects].add(
            -jnp.einsum("s,sp,sq,pqr->r", del_bpr, Uu, i_ij, params["G1"])
        )

        if n_pair > 0:
            # comparative aspect-BPR stream (ComparERSub,
            # recom_comparer_sub.pyx:667-694): for a sampled chrono pair
            # (u, earlier i, later j, aspect a), push score(u,j,a) above
            # score(u,i,a)
            k6 = jax.random.fold_in(ikey, 6)
            sp_ = shard(jax.random.randint(k6, (n_pair,), 0, p_u.shape[0]))
            pu = params["U"][p_u[sp_]]
            pi = params["I"][p_early[sp_]]
            pj = params["I"][p_late[sp_]]
            pa = params["A"][p_asp[sp_]]
            pred_p = _tucker3(params["G1"], pu, pj, pa) - _tucker3(
                params["G1"], pu, pi, pa
            )
            zp = 1.0 / (1.0 + jnp.exp(pred_p))
            del_p = ld_d * zp
            a_ji = pj - pi
            grads["G1"] = grads["G1"] - jnp.einsum(
                "s,sp,sq,sr->pqr", del_p, pu, a_ji, pa
            )
            grads["U"] = grads["U"].at[p_u[sp_]].add(
                -jnp.einsum("s,sq,sr,pqr->sp", del_p, a_ji, pa, params["G1"])
            )
            g_pi = jnp.einsum("s,sp,sr,pqr->sq", del_p, pu, pa, params["G1"])
            grads["I"] = (
                grads["I"].at[p_late[sp_]].add(-g_pi).at[p_early[sp_]].add(g_pi)
            )
            grads["A"] = grads["A"].at[p_asp[sp_]].add(
                -jnp.einsum("s,sp,sq,pqr->sr", del_p, pu, a_ji, params["G1"])
            )

        # Adagrad + reg (gated on touched entries) + non-negativity
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

    return jax.lax.fori_loop(0, n_iters, iteration, (params, sgrads))


class MTER(Recommender):
    """Joint Tucker factorization of rating/attention/quality tensors."""

    def __init__(
        self,
        name="MTER",
        rating_scale=5.0,
        n_user_factors=15,
        n_item_factors=15,
        n_aspect_factors=12,
        n_opinion_factors=12,
        n_bpr_samples=1000,
        n_element_samples=50,
        lambda_reg=0.1,
        lambda_bpr=10,
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
        self.n_user_factors = n_user_factors
        self.n_item_factors = n_item_factors
        self.n_aspect_factors = n_aspect_factors
        self.n_opinion_factors = n_opinion_factors
        self.n_bpr_samples = n_bpr_samples
        self.n_element_samples = n_element_samples
        self.lambda_reg = lambda_reg
        self.lambda_bpr = lambda_bpr
        self.max_iter = max_iter
        self.lr = lr
        self.seed = seed
        self.mesh = mesh
        self.rng = get_rng(seed)

        self.init_params = {} if init_params is None else init_params
        self.G1 = self.init_params.get("G1", None)
        self.G2 = self.init_params.get("G2", None)
        self.G3 = self.init_params.get("G3", None)
        self.U = self.init_params.get("U", None)
        self.I = self.init_params.get("I", None)
        self.A = self.init_params.get("A", None)
        self.O = self.init_params.get("O", None)

    def _compute_attention_score(self, count):
        return 1 + (self.rating_scale - 1) * (2 / (1 + np.exp(-count)) - 1)

    def _compute_quality_score(self, sentiment):
        return 1 + (self.rating_scale - 1) / (1 + np.exp(-sentiment))

    def _init(self, train_set):
        sentiment = train_set.sentiment
        self.num_aspects = sentiment.num_aspects
        self.num_opinions = sentiment.num_opinions
        rng = self.rng

        if self.G1 is None:
            self.G1 = uniform(
                (self.n_user_factors, self.n_item_factors, self.n_aspect_factors),
                random_state=rng,
            )
        if self.G2 is None:
            self.G2 = uniform(
                (self.n_user_factors, self.n_aspect_factors, self.n_opinion_factors),
                random_state=rng,
            )
        if self.G3 is None:
            self.G3 = uniform(
                (self.n_item_factors, self.n_aspect_factors, self.n_opinion_factors),
                random_state=rng,
            )
        if self.U is None:
            self.U = uniform((self.num_users, self.n_user_factors), random_state=rng)
        if self.I is None:
            self.I = uniform((self.num_items, self.n_item_factors), random_state=rng)
        if self.A is None:
            self.A = uniform(
                (self.num_aspects + 1, self.n_aspect_factors), random_state=rng
            )
        if self.O is None:
            self.O = uniform(
                (self.num_opinions, self.n_opinion_factors), random_state=rng
            )

    def _build_data(self, data_set):
        sentiment = data_set.sentiment
        u_idx_arr, i_idx_arr, r_vals = data_set.uir_tuple
        rating_matrix = sp.csr_matrix(
            (r_vals, (u_idx_arr, i_idx_arr)), shape=(self.num_users, self.num_items)
        )

        user_item_aspect = {}
        user_aspect_opinion = {}
        item_aspect_opinion = {}
        for u_idx, by_item in sentiment.user_sentiment.items():
            if u_idx >= self.num_users:
                continue
            for i_idx, tup_idx in by_item.items():
                user_item_aspect[(u_idx, i_idx, sentiment.num_aspects)] = (
                    rating_matrix[u_idx, i_idx]
                )
                for a_idx, o_idx, polarity in sentiment.sentiment[tup_idx]:
                    user_item_aspect[(u_idx, i_idx, a_idx)] = (
                        user_item_aspect.get((u_idx, i_idx, a_idx), 0) + polarity
                    )
                    if polarity > 0:  # positive opinions only
                        user_aspect_opinion[(u_idx, a_idx, o_idx)] = (
                            user_aspect_opinion.get((u_idx, a_idx, o_idx), 0) + 1
                        )
                        item_aspect_opinion[(i_idx, a_idx, o_idx)] = (
                            item_aspect_opinion.get((i_idx, a_idx, o_idx), 0) + 1
                        )

        for key in user_item_aspect:
            if key[2] != sentiment.num_aspects:
                user_item_aspect[key] = self._compute_quality_score(
                    user_item_aspect[key]
                )
        for key in user_aspect_opinion:
            user_aspect_opinion[key] = self._compute_attention_score(
                user_aspect_opinion[key]
            )
        for key in item_aspect_opinion:
            item_aspect_opinion[key] = self._compute_attention_score(
                item_aspect_opinion[key]
            )

        return rating_matrix, user_item_aspect, user_aspect_opinion, item_aspect_opinion

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.sentiment is None:
            raise ValueError("this model needs the sentiment modality attached to the eval method")
        self._init(train_set)
        if not self.trainable:
            return self

        (rating_matrix, uia, uao, iao) = self._build_data(train_set)

        def unpack(d):
            keys = np.asarray(list(d.keys()), dtype=np.int32)
            vals = np.asarray(list(d.values()), dtype=np.float32)
            return vals, keys[:, 0], keys[:, 1], keys[:, 2]

        X, X_u, X_i, X_a = unpack(uia)
        YU, YU_u, YU_a, YU_o = unpack(uao)
        YI, YI_i, YI_a, YI_o = unpack(iao)

        rid, cid, _ = train_set.uir_tuple
        rating_lookup = CsrLookup.build(rating_matrix)

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
        n_el_eff, n_bpr_eff = self.n_element_samples, self.n_bpr_samples
        if self.mesh is not None:
            # replicate tables/streams over the mesh; the sampled index
            # streams are sharded inside the jit (see _mter_fit)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_sharding = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            msz = self.mesh.size
            n_el_eff = max(msz, n_el_eff - n_el_eff % msz)
            n_bpr_eff = max(msz, n_bpr_eff - n_bpr_eff % msz)
            params, sgrads = replicate_all(self.mesh, params, sgrads)

        params, sgrads = _mter_fit(
            (params, sgrads),
            jax.random.PRNGKey(self.rng.randint(2**31)),
            jnp.asarray(X), jnp.asarray(X_u), jnp.asarray(X_i), jnp.asarray(X_a),
            jnp.asarray(YU), jnp.asarray(YU_u), jnp.asarray(YU_a), jnp.asarray(YU_o),
            jnp.asarray(YI), jnp.asarray(YI_i), jnp.asarray(YI_a), jnp.asarray(YI_o),
            jnp.asarray(rid, dtype=jnp.int32),
            jnp.asarray(cid, dtype=jnp.int32),
            rating_lookup,
            jnp.float32(self.lr),
            jnp.float32(self.lambda_reg),
            jnp.float32(self.lambda_bpr),
            jnp.int32(self.max_iter),
            n_el=n_el_eff,
            n_bpr=n_bpr_eff,
            batch_sharding=batch_sharding,
        )

        for name in ("G1", "G2", "G3", "U", "I", "A", "O"):
            setattr(self, name, np.asarray(params[name], dtype=np.float64))
        return self

    def score(self, u_idx, i_idx=None):
        if self.is_unknown_user(u_idx):
            raise ScoreException("Can't make score prediction for user %d" % u_idx)
        if i_idx is not None and self.is_unknown_item(i_idx):
            raise ScoreException("Can't make score prediction for item %d" % i_idx)

        # overall-rating slice of the Tucker product
        ua = np.einsum("p,pqr,r->q", self.U[u_idx], self.G1, self.A[self.num_aspects])
        if i_idx is None:
            return self.I @ ua
        return self.I[i_idx] @ ua

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        ua = np.einsum(
            "bp,pqr,r->bq",
            self.U[np.where(known, users, 0)],
            self.G1,
            self.A[self.num_aspects],
        )
        scores = ua @ self.I.T
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
