"""C2PF — Collaborative Context Poisson Factorization
(Salah & Lauw, SIGIR 2017).  Variants: ``c2pf``, ``tc2pf`` (tied),
``rc2pf`` (reduced).

Capability parity with reference ``cornac/models/c2pf/recom_c2pf.py:25`` +
``c2pf/cpp/cpp_c2pf.cpp`` (Eigen C++ CAVI over sparse matrices) +
``c2pf/cython/c2pf.pyx`` (two-phase schedule: full PF warm-up with the
item-influence weights κ effectively disabled via a 1e15 prior, then
0.2·max_iter refinement with the real κ prior).

TPU redesign: every CAVI sub-update is an edge-based
gather → normalize → scatter-add over the rating edges (u,i,x) and the
context edges (i,j) of ``train_set.item_graph`` — dense Gamma-parameter
tables, no sparse-matrix coeffRef loops — and each full sweep is compiled
into a single device program (`lax.fori_loop` over iterations).  The
reference iterates CSC columns and reads ``κ[i, j]`` while scanning edges
``(j→i)`` (an implicit transpose that only matches for symmetric context);
here κ lives on the context edge (i, j) directly — identical for the
symmetric graphs GraphModality builds, documented deviation otherwise.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..utils import get_rng
from .recommender import ANNMixin, MEASURE_DOT, Recommender

EPS = 2.0**-52
AA = 0.3  # shared Gamma shape hyper (cpp_c2pf.cpp:591-607)


def _exp_digamma(s, r):
    return jnp.exp(
        jax.scipy.special.digamma(jnp.maximum(s, EPS))
        - jnp.log(jnp.maximum(r, EPS))
    )


@partial(jax.jit, static_argnames=("variant", "n_iters"))
def _c2pf_cavi(
    state, ru, ri, rx, ci, cj, cmask, util_sum, a_t, b_t, variant, n_iters
):
    """One phase of CAVI sweeps. state: dict of Gamma tables + κ edges.

    ``cmask`` is 1.0 for real context edges, 0.0 for mesh-padding rows
    (edge-parallel training shards both edge sets over the data axis and
    pads them to the device count); every table contribution of a context
    edge is multiplied by it, so padded edges are exactly inert and the
    single-device program (all-ones mask) is unchanged bit-for-bit."""
    n = state["G_s"].shape[0]
    d = state["L2_s"].shape[0]

    def lb2_of(L2b, l3b):
        return jnp.zeros((d, L2b.shape[1])).at[ci].add(L2b[cj] * l3b[:, None])

    def sweep(_, state):
        G_s, G_r = state["G_s"], state["G_r"]
        L_s, L_r = state["L_s"], state["L_r"]
        L2_s, L2_r = state["L2_s"], state["L2_r"]
        l3_s, l3_r = state["l3_s"], state["l3_r"]
        T3_r = state["T3_r"]

        Lt = _exp_digamma(G_s, G_r)
        Lb = _exp_digamma(L_s, L_r)
        if variant == "tc2pf":  # tied: context factors ARE the item factors
            L2_s, L2_r = L_s, L_r
            L2b = Lb
        else:
            L2b = _exp_digamma(L2_s, L2_r)
        l3b = _exp_digamma(l3_s, l3_r) * cmask
        Lb2 = lb2_of(L2b, l3b)

        use_beta = variant != "rc2pf"
        mix = (Lb + Lb2) if use_beta else Lb2

        def ratio():
            dk = jnp.sum(Lt[ru] * mix[ri], axis=1) + EPS
            return rx / dk

        # --- κ (item influence) updates -------------------------------
        r_e = ratio()
        Lb_u = jnp.zeros((d, Lt.shape[1])).at[ri].add(r_e[:, None] * Lt[ru])
        l3_s = a_t + jnp.sum(L2b[cj] * l3b[:, None] * Lb_u[ci], axis=1)
        SkU = jnp.sum(G_s / jnp.maximum(G_r, EPS), axis=0)  # (k,)
        X2m = L2_s / jnp.maximum(L2_r, EPS)
        Sj = X2m @ SkU  # (d2,)
        if variant == "c2pf":
            l3_r = a_t * (5.0 + a_t * util_sum[ci]) / jnp.maximum(
                T3_r[ci], EPS
            ) + Sj[cj]
        else:  # tc2pf / rc2pf: update_gamma_r_context_3_n_2, k_s = b_t
            l3_r = b_t / jnp.maximum(T3_r[ci], EPS) + Sj[cj]
        l3b = _exp_digamma(l3_s, l3_r) * cmask
        Lb2 = lb2_of(L2b, l3b)
        km = cmask * l3_s / jnp.maximum(l3_r, EPS)
        if variant == "c2pf":
            T3_r = b_t + a_t * jnp.zeros((d,)).at[ci].add(km)
        mix = (Lb + Lb2) if use_beta else Lb2

        # --- user updates ---------------------------------------------
        r_e = ratio()
        G_s = AA + Lt * (
            jnp.zeros_like(G_s).at[ru].add(r_e[:, None] * mix[ri])
        )
        ctx_mass = jnp.sum(X2m[cj] * km[:, None], axis=0)  # (k,)
        if use_beta:
            g_rate = AA + jnp.sum(L_s / jnp.maximum(L_r, EPS), axis=0) + ctx_mass
        else:
            g_rate = AA + ctx_mass
        G_r = jnp.broadcast_to(g_rate[None, :], G_r.shape)
        Lt = _exp_digamma(G_s, G_r)

        # --- item (β) updates -----------------------------------------
        Tm_sum = jnp.sum(G_s / jnp.maximum(G_r, EPS), axis=0)
        if use_beta:
            r_e = ratio()
            L_s_new = AA + Lb * (
                jnp.zeros_like(L_s).at[ri].add(r_e[:, None] * Lt[ru])
            )
            if variant == "tc2pf":
                # tied: context contribution folds into the same table
                Lb_u = jnp.zeros((d, Lt.shape[1])).at[ri].add(
                    r_e[:, None] * Lt[ru]
                )
                L_s_new = L_s_new + jnp.zeros_like(L_s).at[cj].add(
                    L2b[cj] * l3b[:, None] * Lb_u[ci]
                )
                Sj_d = jnp.zeros((d,)).at[cj].add(km)
                L_r = jnp.broadcast_to(
                    AA + Tm_sum[None, :] * (1.0 + Sj_d[:, None]), L_s.shape
                )
            else:
                L_r = jnp.broadcast_to(AA + Tm_sum[None, :], L_s.shape)
            L_s = L_s_new
            Lb = _exp_digamma(L_s, L_r)
            mix = Lb + Lb2

        # --- context (ξ) updates --------------------------------------
        if variant != "tc2pf":
            r_e = ratio()
            Lb_u = jnp.zeros((d, Lt.shape[1])).at[ri].add(
                r_e[:, None] * Lt[ru]
            )
            L2_s = AA + jnp.zeros_like(L2_s).at[cj].add(
                L2b[cj] * l3b[:, None] * Lb_u[ci]
            )
            Sj_d2 = jnp.zeros((d,)).at[cj].add(km)
            L2_r = jnp.broadcast_to(
                AA + Sj_d2[:, None] * Tm_sum[None, :], L2_s.shape
            )
        else:
            L2_s, L2_r = L_s, L_r

        return {
            "G_s": G_s, "G_r": G_r, "L_s": L_s, "L_r": L_r,
            "L2_s": L2_s, "L2_r": L2_r, "l3_s": l3_s, "l3_r": l3_r,
            "T3_r": T3_r,
        }

    return jax.lax.fori_loop(0, n_iters, sweep, state)


class C2PF(Recommender, ANNMixin):
    """Context-aware Poisson factorization over an item graph."""

    def __init__(
        self,
        k=100,
        max_iter=100,
        variant="c2pf",
        name=None,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        if variant not in ("c2pf", "tc2pf", "rc2pf"):
            raise ValueError("variant must be one of c2pf, tc2pf, rc2pf")
        Recommender.__init__(
            self,
            name=variant.upper() if name is None else name,
            trainable=trainable,
            verbose=verbose,
        )
        self.k = k
        self.max_iter = max_iter
        self.variant = variant
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params
        self.Theta = self.init_params.get("Theta", None)
        self.Beta = self.init_params.get("Beta", None)
        self.Xi = self.init_params.get("Xi", None)
        self.Gs = self.init_params.get("G_s", None)
        self.Gr = self.init_params.get("G_r", None)
        self.Ls = self.init_params.get("L_s", None)
        self.Lr = self.init_params.get("L_r", None)
        self.L2s = self.init_params.get("L2_s", None)
        self.L2r = self.init_params.get("L2_r", None)
        self.L3s = self.init_params.get("L3_s", None)
        self.L3r = self.init_params.get("L3_r", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self
        if train_set.item_graph is None:
            raise ValueError("C2PF requires an item_graph modality")

        rng = get_rng(self.seed)
        n, d, k = self.num_users, self.num_items, self.k

        u, i, x = train_set.uir_tuple
        ru = jnp.asarray(u, jnp.int32)
        ri = jnp.asarray(i, jnp.int32)
        rx = jnp.asarray(x, jnp.float32)

        train_items = set(np.asarray(train_set.uir_tuple[1]).tolist())
        gi, gj, gv = train_set.item_graph.get_train_triplet(
            train_items, train_items
        )
        if len(gi) == 0:  # degenerate: no context edges — self loops
            gi = gj = np.arange(d)
            gv = np.ones(d)
        ci = jnp.asarray(gi, jnp.int32)
        cj = jnp.asarray(gj, jnp.int32)
        util_sum = np.zeros(d, np.float32)
        np.add.at(util_sum, np.asarray(gj, np.int64), np.asarray(gv, np.float32))
        util_sum = jnp.asarray(util_sum)

        def tbl(existing, rows, scale=0.3):
            if existing is not None:
                return jnp.asarray(np.asarray(existing, np.float32))
            return jnp.asarray(
                rng.gamma(100, scale=scale / 100, size=(rows, k)).astype(
                    np.float32
                )
            )

        def edge_tbl(existing):
            if existing is not None:
                e = np.asarray(existing)
                return jnp.asarray(
                    (e[:, 2] if e.ndim == 2 else e).astype(np.float32)
                )
            return jnp.asarray(
                rng.gamma(100, scale=0.5 / 100, size=len(gi)).astype(np.float32)
            )

        state = {
            "G_s": tbl(self.Gs, n), "G_r": tbl(self.Gr, n),
            "L_s": tbl(self.Ls, d), "L_r": tbl(self.Lr, d),
            "L2_s": tbl(self.L2s, d), "L2_r": tbl(self.L2r, d),
            "l3_s": edge_tbl(self.L3s), "l3_r": edge_tbl(self.L3r),
            "T3_r": jnp.ones((d,), jnp.float32),
        }
        n_cedges = int(state["l3_s"].shape[0])
        cmask = jnp.ones((n_cedges,), jnp.float32)

        if self.mesh is not None:
            # edge parallelism (same treatment as HPF's CAVI): BOTH edge
            # sets shard over the data axis, Gamma tables replicate, and
            # GSPMD psums the scatter-add accumulations. Rating pads have
            # rx == 0 (ratio 0 -> inert); context pads carry cmask == 0,
            # which zeroes every table contribution exactly.
            from ..parallel import replicate_all, shard_batch

            msz = self.mesh.size
            pad_r = (-len(u)) % msz
            if pad_r:
                z = lambda a: jnp.concatenate(
                    [a, jnp.zeros(pad_r, a.dtype)]
                )
                ru, ri, rx = z(ru), z(ri), z(rx)
            pad_c = (-n_cedges) % msz
            if pad_c:
                ci = jnp.concatenate([ci, jnp.zeros(pad_c, ci.dtype)])
                cj = jnp.concatenate([cj, jnp.zeros(pad_c, cj.dtype)])
                cmask = jnp.concatenate(
                    [cmask, jnp.zeros(pad_c, cmask.dtype)]
                )
                state["l3_s"] = jnp.concatenate(
                    [state["l3_s"], jnp.ones(pad_c, jnp.float32)]
                )
                state["l3_r"] = jnp.concatenate(
                    [state["l3_r"], jnp.ones(pad_c, jnp.float32)]
                )
            for key_ in ("G_s", "G_r", "L_s", "L_r", "L2_s", "L2_r", "T3_r"):
                state[key_] = replicate_all(self.mesh, state[key_])
            state["l3_s"] = shard_batch(self.mesh, state["l3_s"])
            state["l3_r"] = shard_batch(self.mesh, state["l3_r"])
            ru, ri, rx = (shard_batch(self.mesh, e) for e in (ru, ri, rx))
            ci, cj, cmask = (
                shard_batch(self.mesh, e) for e in (ci, cj, cmask)
            )
            util_sum = replicate_all(self.mesh, util_sum)

        # phase 1: κ suppressed by an enormous prior (cython c2pf.pyx:129)
        state = _c2pf_cavi(
            state, ru, ri, rx, ci, cj, cmask, util_sum,
            jnp.float32(1e15), jnp.float32(1e15), self.variant, self.max_iter,
        )
        # phase 2: real κ prior for 0.2·max_iter refinement sweeps
        bt = 5.0 if self.variant == "c2pf" else 4.0
        state = _c2pf_cavi(
            state, ru, ri, rx, ci, cj, cmask, util_sum,
            jnp.float32(2.0), jnp.float32(bt), self.variant,
            max(1, int(0.2 * self.max_iter)),
        )

        self.Gs = np.asarray(state["G_s"])
        self.Gr = np.asarray(state["G_r"])
        self.Ls = np.asarray(state["L_s"])
        self.Lr = np.asarray(state["L_r"])
        self.L2s = np.asarray(state["L2_s"])
        self.L2r = np.asarray(state["L2_r"])
        km = np.asarray(state["l3_s"] / jnp.maximum(state["l3_r"], EPS))[
            :n_cedges
        ]
        self.L3s = np.asarray(state["l3_s"])[:n_cedges]
        self.L3r = np.asarray(state["l3_r"])[:n_cedges]

        self.Theta = self.Gs / np.maximum(self.Gr, EPS)
        self.Beta = self.Ls / np.maximum(self.Lr, EPS)
        X2m = self.L2s / np.maximum(self.L2r, EPS)
        Xi = np.zeros((d, k), np.float32)
        np.add.at(Xi, np.asarray(gi, np.int64), km[:, None] * X2m[np.asarray(gj)])
        self.Xi = Xi
        return self

    def _item_table(self):
        if self.variant == "rc2pf":
            return self.Xi
        return self.Beta + self.Xi

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        tbl = self._item_table()
        if item_idx is None:
            return (tbl @ self.Theta[user_idx]).astype(np.float64)
        if self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        return float(tbl[item_idx] @ self.Theta[user_idx])

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = (
            self.Theta[np.where(known, users, 0)] @ self._item_table().T
        ).astype(np.float64)
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
        if self.variant == "rc2pf":
            return np.concatenate((self.Theta, self.Theta), axis=1)
        return self.Theta

    def get_item_vectors(self):
        if self.variant == "rc2pf":
            return np.concatenate((self.Beta, self.Xi), axis=1)
        return self.Beta
