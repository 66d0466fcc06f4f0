"""ComparER — Explainable Recommendation with Comparative Constraints on
Product Aspects (Le & Lauw, WSDM 2021).

Two variants, both subclassing their base models:

* ``ComparERObj`` (objective aspect quality) — reference
  ``cornac/models/comparer/recom_comparer_obj.pyx:45``: EFM plus pairwise
  aspect-quality constraints over chronologically purchased item pairs
  (earlier→later), folded into the multiplicative updates as extra
  numerator/denominator mass; model types Finer/Dominant/Around gate which
  pairs contribute.
* ``ComparERSub`` (subjective aspect quality) — reference
  ``cornac/models/comparer/recom_comparer_sub.pyx:47``: MTER plus a sampled
  aspect-BPR stream over per-user chrono pairs on the Tucker score.

TPU redesign: pair enumeration (Counter/skyline logic) stays host-side —
it is one-time data prep — while the constraint gradients join the existing
compiled EFM sweep / MTER iteration as one more gather→scatter-add stream
(``efm._efm_fit(use_pairs=True)`` / ``mter._mter_fit(n_pair>0)``).
"""

from collections import Counter
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.csr_lookup import CsrLookup
from ..utils.init_utils import uniform
from .efm import EFM, _efm_fit
from .mter import MTER, _mter_fit
from .recommender import Recommender

MODEL_TYPES = {"Dominant": 0, "Around": 1, "Finer": 2}
# internal gate codes used by _efm_fit (0=Finer always, 1=Dominant, 2=Around)
_GATE_CODE = {"Finer": 0, "Dominant": 1, "Around": 2}


def _chrono_pairs(model, data_set, min_user_freq, enum_window):
    """(earlier, later) -> count over each user's chronological purchases.

    Reference recom_comparer_obj.pyx:481-491."""
    pairs = Counter()
    per_user = {}
    for u_idx, (item_ids, *_) in data_set.chrono_user_data.items():
        if len(item_ids) < min_user_freq:
            continue
        window = (
            len(item_ids) if enum_window is None
            else min(enum_window, len(item_ids))
        )
        subs = [
            item_ids[i : i + window]
            for i in range(len(item_ids) - window + 1)
        ]
        for sub in subs:
            for ei, li in combinations(sub, 2):
                if ei >= model.num_items or li >= model.num_items:
                    continue
                pairs[(u_idx, ei, li)] += 1
    return pairs


class ComparERObj(EFM):
    """EFM with comparative constraints on objective aspect quality."""

    def __init__(
        self,
        name="ComparERObj",
        model_type="Finer",
        num_explicit_factors=128,
        num_latent_factors=128,
        num_most_cared_aspects=100,
        rating_scale=5.0,
        alpha=0.9,
        lambda_x=1,
        lambda_y=1,
        lambda_u=0.01,
        lambda_h=0.01,
        lambda_v=0.01,
        lambda_d=0.01,
        use_item_aspect_popularity=True,
        min_user_freq=2,
        min_pair_freq=1,
        max_pair_freq=1e9,
        min_common_freq=1,
        enum_window=None,
        use_item_pair_popularity=True,
        max_iter=1000,
        num_threads=0,
        early_stopping=None,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        if model_type not in MODEL_TYPES:
            raise ValueError(
                "Invalid model type: {}\nOnly support: {}".format(
                    model_type, list(MODEL_TYPES.keys())
                )
            )
        EFM.__init__(
            self,
            name=name,
            num_explicit_factors=num_explicit_factors,
            num_latent_factors=num_latent_factors,
            num_most_cared_aspects=num_most_cared_aspects,
            rating_scale=rating_scale,
            alpha=alpha,
            lambda_x=lambda_x,
            lambda_y=lambda_y,
            lambda_u=lambda_u,
            lambda_h=lambda_h,
            lambda_v=lambda_v,
            use_item_aspect_popularity=use_item_aspect_popularity,
            max_iter=max_iter,
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
            mesh=mesh,
        )
        self.model_type = model_type
        self.lambda_d = lambda_d
        self.min_user_freq = min_user_freq
        self.min_pair_freq = min_pair_freq
        self.max_pair_freq = max_pair_freq
        self.min_common_freq = min_common_freq
        self.enum_window = enum_window
        self.use_item_pair_popularity = use_item_pair_popularity
        self.num_threads = num_threads  # API parity; XLA manages threading
        self.early_stopping = early_stopping

    def _build_pairs(self, data_set, Y):
        """Skyline aspect pairs (recom_comparer_obj.pyx:479-533)."""
        chrono = Counter()
        for (u, ei, li), c in _chrono_pairs(
            self, data_set, self.min_user_freq, self.enum_window
        ).items():
            chrono[(ei, li)] += c

        pair_counts = Counter()
        common = Counter()
        Yl = Y.tolil()
        for (ei, li), count in chrono.most_common():
            for k in Y[li].indices:
                if Yl[li, k] > Yl[ei, k]:
                    pair_counts[(ei, li, k)] += count
                if Yl[ei, k] > 0 and Yl[li, k] > 0:
                    common[(ei, li)] += 1

        e_idx, l_idx, a_idx, freq = [], [], [], []
        for (ei, li, k), count in pair_counts.most_common():
            if common[(ei, li)] < self.min_common_freq:
                continue
            if count < self.min_pair_freq or count > self.max_pair_freq:
                continue
            e_idx.append(ei)
            l_idx.append(li)
            a_idx.append(k)
            freq.append(count)
        return (
            np.asarray(e_idx, np.int32),
            np.asarray(l_idx, np.int32),
            np.asarray(a_idx, np.int32),
            np.asarray(freq, np.float32),
        )

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.sentiment is None:
            raise ValueError("this model needs the sentiment modality attached to the eval method")
        if not self.trainable:
            return self

        from ..utils import get_rng

        rng = get_rng(self.seed)
        n_aspects = self.num_aspects
        n_factors = self.num_explicit_factors + self.num_latent_factors
        high = np.sqrt(self.rating_scale / n_factors)
        for attr, shape in (
            ("U1", (self.num_users, self.num_explicit_factors)),
            ("U2", (self.num_items, self.num_explicit_factors)),
            ("V", (n_aspects, self.num_explicit_factors)),
            ("H1", (self.num_users, self.num_latent_factors)),
            ("H2", (self.num_items, self.num_latent_factors)),
        ):
            if getattr(self, attr) is None:
                setattr(self, attr, uniform(shape, high=high, random_state=rng))

        A, X, Y = self._build_matrices(train_set)
        p_early, p_late, p_asp, p_freq = self._build_pairs(train_set, Y)
        if not self.use_item_pair_popularity:
            p_freq = np.ones_like(p_freq)
        p_w = self.lambda_d * (1.0 + np.log(np.maximum(p_freq, 1.0)))
        if len(p_early) == 0:  # no usable pairs: plain EFM
            p_early = p_late = np.zeros(1, np.int32)
            p_asp = np.zeros(1, np.int32)
            p_w = np.zeros(1, np.float32)

        A_coo, X_coo, Y_coo = A.tocoo(), X.tocoo(), Y.tocoo()

        def counts(idx, n):
            c = np.zeros(n, np.float32)
            np.add.at(c, idx, 1)
            return c

        def stream(coo):
            return (
                np.asarray(coo.row, np.int32),
                np.asarray(coo.col, np.int32),
                np.asarray(coo.data, np.float32),
            )

        A_s, X_s, Y_s = stream(A_coo), stream(X_coo), stream(Y_coo)
        pair_s = (
            np.asarray(p_early, np.int32), np.asarray(p_late, np.int32),
            np.asarray(p_asp, np.int32), np.asarray(p_w, np.float32),
        )
        A_m = X_m = Y_m = None
        dev = jnp.asarray
        rep = dev
        if self.mesh is not None:
            # edge parallelism like EFM's, plus the comparative-pair
            # stream: its padded rows carry p_w == 0, which zeroes their
            # gradient exactly (grad = p_w * z * gate)
            from ..parallel import replicate_all, shard_batch

            msz = self.mesh.size

            def pad_stream(tr, with_mask=True):
                pad = (-len(tr[0])) % msz
                z = lambda a: np.concatenate([a, np.zeros(pad, a.dtype)])
                out = [
                    shard_batch(self.mesh, jnp.asarray(z(t))) for t in tr
                ]
                if with_mask:
                    m = np.concatenate(
                        [
                            np.ones(len(tr[0]), np.float32),
                            np.zeros(pad, np.float32),
                        ]
                    )
                    out.append(shard_batch(self.mesh, jnp.asarray(m)))
                return tuple(out)

            *A_s, A_m = pad_stream(A_s)
            *X_s, X_m = pad_stream(X_s)
            *Y_s, Y_m = pad_stream(Y_s)
            pair_s = pad_stream(pair_s, with_mask=False)
            rep = lambda t: replicate_all(self.mesh, jnp.asarray(t))

        U1, U2, V, H1, H2 = _efm_fit(
            rep(np.asarray(self.U1, np.float32)),
            rep(np.asarray(self.U2, np.float32)),
            rep(np.asarray(self.V, np.float32)),
            rep(np.asarray(self.H1, np.float32)),
            rep(np.asarray(self.H2, np.float32)),
            *(dev(t) for t in A_s),
            *(dev(t) for t in X_s),
            *(dev(t) for t in Y_s),
            rep(counts(A_coo.row, self.num_users)),
            rep(counts(A_coo.col, self.num_items)),
            rep(counts(X_coo.row, self.num_users)),
            rep(counts(X_coo.col, n_aspects)),
            rep(counts(Y_coo.row, self.num_items)),
            rep(counts(Y_coo.col, n_aspects)),
            jnp.float32(self.lambda_x),
            jnp.float32(self.lambda_y),
            jnp.float32(self.lambda_u),
            jnp.float32(self.lambda_h),
            jnp.float32(self.lambda_v),
            jnp.int32(self.max_iter),
            p_early=dev(pair_s[0]),
            p_late=dev(pair_s[1]),
            p_asp=dev(pair_s[2]),
            p_w=dev(pair_s[3]),
            use_pairs=True,
            model_type=_GATE_CODE[self.model_type],
            A_m=A_m, X_m=X_m, Y_m=Y_m,
        )
        self.U1, self.U2 = np.asarray(U1, np.float64), np.asarray(U2, np.float64)
        self.V = np.asarray(V, np.float64)
        self.H1, self.H2 = np.asarray(H1, np.float64), np.asarray(H2, np.float64)
        return self

    def get_params(self):
        return {
            "U1": self.U1, "U2": self.U2, "V": self.V,
            "H1": self.H1, "H2": self.H2,
        }

    def monitor_value(self, train_set=None, val_set=None):
        val_set = val_set if val_set is not None else getattr(self, "val_set", None)
        if val_set is None:
            return None
        u, i, r = val_set.uir_tuple
        ok = (u < self.num_users) & (i < self.num_items)
        pred = (
            np.sum(self.U1[u[ok]] * self.U2[i[ok]], axis=1)
            + np.sum(self.H1[u[ok]] * self.H2[i[ok]], axis=1)
        )
        return -float(np.sum((pred - r[ok]) ** 2))


class ComparERSub(MTER):
    """MTER with comparative constraints on subjective aspect quality."""

    def __init__(
        self,
        name="ComparERSub",
        rating_scale=5.0,
        n_user_factors=8,
        n_item_factors=8,
        n_aspect_factors=8,
        n_opinion_factors=8,
        n_pair_samples=1000,
        n_bpr_samples=1000,
        n_element_samples=50,
        n_top_aspects=100,
        alpha=0.5,
        min_user_freq=2,
        min_pair_freq=1,
        min_common_freq=1,
        use_item_aspect_popularity=True,
        enum_window=None,
        lambda_reg=0.1,
        lambda_bpr=10,
        lambda_d=0.01,
        max_iter=200000,
        lr=0.1,
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
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
            mesh=mesh,
        )
        self.n_pair_samples = n_pair_samples
        self.n_top_aspects = n_top_aspects
        self.alpha = alpha
        self.min_user_freq = min_user_freq
        self.min_pair_freq = min_pair_freq
        self.min_common_freq = min_common_freq
        # Behaviorally inert here exactly as in the reference: the flag only
        # scales the item-quality values (total vs averaged sentiment,
        # recom_comparer_sub.pyx:197-199), and those values are always > 1,
        # so the Y>0 pair filter (":315") reduces to aspect presence — which
        # is what _build_sub_pairs uses.
        self.use_item_aspect_popularity = use_item_aspect_popularity
        self.enum_window = enum_window
        self.lambda_d = lambda_d
        self.n_threads = n_threads  # API parity

    def _build_sub_pairs(self, data_set, user_item_aspect):
        """Per-user skyline aspect pairs (recom_comparer_sub.pyx:293-351),
        using per-user subjective aspect scores."""
        chrono = _chrono_pairs(self, data_set, self.min_user_freq, self.enum_window)

        # item-level aspect presence for the common-aspect filter
        item_aspects = {}
        for (u, i, a), v in user_item_aspect.items():
            if a == self.num_aspects:
                continue
            item_aspects.setdefault(i, set()).add(a)

        pair_counts = Counter()
        common = Counter()
        counted = set()
        for (u, ei, li), count in chrono.most_common():
            for a in range(self.num_aspects):
                if user_item_aspect.get((u, li, a), 0) > user_item_aspect.get(
                    (u, ei, a), 0
                ):
                    pair_counts[(u, ei, li, a)] += count
            if (ei, li) not in counted:
                counted.add((ei, li))
                common[(ei, li)] = len(
                    item_aspects.get(ei, set()) & item_aspects.get(li, set())
                )

        p_u, p_e, p_l, p_a, freq = [], [], [], [], []
        for (u, ei, li, a), count in pair_counts.most_common():
            if common[(ei, li)] < self.min_common_freq:
                continue
            if count < self.min_pair_freq:
                continue
            p_u.append(u)
            p_e.append(ei)
            p_l.append(li)
            p_a.append(a)
            freq.append(count)
        return (
            np.asarray(p_u, np.int32),
            np.asarray(p_e, np.int32),
            np.asarray(p_l, np.int32),
            np.asarray(p_a, np.int32),
        )

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.sentiment is None:
            raise ValueError("this model needs the sentiment modality attached to the eval method")
        self._init(train_set)
        if not self.trainable:
            return self

        (rating_matrix, uia, uao, iao) = self._build_data(train_set)
        p_u, p_e, p_l, p_a = self._build_sub_pairs(train_set, uia)
        n_pair = self.n_pair_samples if len(p_u) else 0
        if len(p_u) == 0:
            p_u = p_e = p_l = p_a = np.zeros(1, np.int32)

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
        eff_el, eff_bpr = self.n_element_samples, self.n_bpr_samples
        eff_pair = n_pair
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_sharding = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            msz = self.mesh.size
            eff_el = max(msz, eff_el - eff_el % msz)
            eff_bpr = max(msz, eff_bpr - eff_bpr % msz)
            if eff_pair:
                eff_pair = max(msz, eff_pair - eff_pair % msz)
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
            n_el=eff_el,
            n_bpr=eff_bpr,
            p_u=jnp.asarray(p_u),
            p_early=jnp.asarray(p_e),
            p_late=jnp.asarray(p_l),
            p_asp=jnp.asarray(p_a),
            ld_d=jnp.float32(self.lambda_d),
            n_pair=eff_pair,
            batch_sharding=batch_sharding,
        )

        for name in ("G1", "G2", "G3", "U", "I", "A", "O"):
            setattr(self, name, np.asarray(params[name], dtype=np.float64))
        return self
