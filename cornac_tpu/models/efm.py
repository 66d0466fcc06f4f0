"""EFM — Explicit Factor Model (Zhang et al., SIGIR 2014).

Capability parity with reference ``cornac/models/efm/recom_efm.pyx:46``
(544-line Cython/OpenMP multiplicative-update engine over the rating matrix
A, user-aspect attention X, and item-aspect quality Y). TPU redesign: the
three accumulation sweeps become per-observation gather/scatter-adds and the
sqrt-multiplicative updates are elementwise table math — the whole
``max_iter`` loop is one compiled device program. Ranking uses the paper's
composite score over the user's most-cared aspects (reference ``rank()``
override), which here drives the batched ``score_batch`` path.
"""

from collections import Counter, OrderedDict

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..exception import ScoreException
from ..utils import get_rng
from ..utils.init_utils import uniform
from .recommender import Recommender


@partial(
    jax.jit, donate_argnums=(0, 1, 2, 3, 4),
    static_argnames=("use_pairs", "model_type"),
)
def _efm_fit(
    U1, U2, V, H1, H2,
    A_u, A_i, A_v,
    X_u, X_a, X_v,
    Y_i, Y_a, Y_v,
    A_user_counts, A_item_counts,
    X_user_counts, X_aspect_counts,
    Y_item_counts, Y_aspect_counts,
    lambda_x, lambda_y, lambda_u, lambda_h, lambda_v,
    n_iters,
    # optional comparative-constraint stream (ComparERObj); use_pairs=False => off
    p_early=None, p_late=None, p_asp=None, p_w=None,
    use_pairs=False, model_type=0,
    # mesh edge-parallel padding masks (1 real edge / 0 pad); None = all real
    A_m=None, X_m=None, Y_m=None,
):
    eps = 1e-9

    def body(_, carry):
        U1, U2, V, H1, H2 = carry

        # comparative aspect constraints (ComparERObj,
        # recom_comparer_obj.pyx:325-345): later item j should beat earlier
        # item i on aspect k.  model_type: 0=Finer (always), 1=Dominant
        # (only when currently violated), 2=Around (only when satisfied).
        pair_num_U2 = jnp.zeros_like(U2)
        pair_den_U2 = jnp.zeros_like(U2)
        pair_num_V = jnp.zeros_like(V)
        pair_den_V = jnp.zeros_like(V)
        if use_pairs:
            s_i = jnp.sum(U2[p_early] * V[p_asp], axis=1)
            s_j = jnp.sum(U2[p_late] * V[p_asp], axis=1)
            if model_type == 1:
                gate = (s_i < s_j).astype(jnp.float32)
            elif model_type == 2:
                gate = (s_i > s_j).astype(jnp.float32)
            else:
                gate = 1.0
            z = 1.0 / (1.0 + jnp.exp(s_j - s_i))
            grad = p_w * z * gate
            pair_den_U2 = pair_den_U2.at[p_early].add(grad[:, None] * V[p_asp])
            pair_num_U2 = pair_num_U2.at[p_late].add(grad[:, None] * V[p_asp])
            pair_den_V = pair_den_V.at[p_asp].add(grad[:, None] * U2[p_early])
            pair_num_V = pair_num_V.at[p_asp].add(grad[:, None] * U2[p_late])

        # ratings stream: A ~ U1 U2^T + H1 H2^T.  Masking the prediction
        # zeroes BOTH the numerator (A_v pads are 0) and denominator
        # contributions of mesh-padding edges — exactly inert.
        pred_A = jnp.sum(U1[A_u] * U2[A_i], axis=1) + jnp.sum(
            H1[A_u] * H2[A_i], axis=1
        )
        if A_m is not None:
            pred_A = pred_A * A_m
        U1_num = jnp.zeros_like(U1).at[A_u].add(A_v[:, None] * U2[A_i])
        U1_den = jnp.zeros_like(U1).at[A_u].add(pred_A[:, None] * U2[A_i])
        U2_num = jnp.zeros_like(U2).at[A_i].add(A_v[:, None] * U1[A_u])
        U2_den = jnp.zeros_like(U2).at[A_i].add(pred_A[:, None] * U1[A_u])
        H1_num = jnp.zeros_like(H1).at[A_u].add(A_v[:, None] * H2[A_i])
        H1_den = jnp.zeros_like(H1).at[A_u].add(pred_A[:, None] * H2[A_i])
        H2_num = jnp.zeros_like(H2).at[A_i].add(A_v[:, None] * H1[A_u])
        H2_den = jnp.zeros_like(H2).at[A_i].add(pred_A[:, None] * H1[A_u])

        # attention stream: X ~ U1 V^T
        pred_X = jnp.sum(U1[X_u] * V[X_a], axis=1)
        if X_m is not None:
            pred_X = pred_X * X_m
        V_num = jnp.zeros_like(V).at[X_a].add(lambda_x * X_v[:, None] * U1[X_u])
        V_den = jnp.zeros_like(V).at[X_a].add(lambda_x * pred_X[:, None] * U1[X_u])
        U1_num = U1_num.at[X_u].add(lambda_x * X_v[:, None] * V[X_a])
        U1_den = U1_den.at[X_u].add(lambda_x * pred_X[:, None] * V[X_a])

        # quality stream: Y ~ U2 V^T
        pred_Y = jnp.sum(U2[Y_i] * V[Y_a], axis=1)
        if Y_m is not None:
            pred_Y = pred_Y * Y_m
        V_num = V_num.at[Y_a].add(lambda_y * Y_v[:, None] * U2[Y_i])
        V_den = V_den.at[Y_a].add(lambda_y * pred_Y[:, None] * U2[Y_i])
        U2_num = U2_num.at[Y_i].add(lambda_y * Y_v[:, None] * V[Y_a])
        U2_den = U2_den.at[Y_i].add(lambda_y * pred_Y[:, None] * V[Y_a])

        V = V * jnp.sqrt(
            (V_num + pair_num_V)
            / (V_den + pair_den_V
               + (X_aspect_counts + Y_aspect_counts)[:, None] * lambda_v * V + eps)
        )
        U1 = U1 * jnp.sqrt(
            U1_num
            / (U1_den + (A_user_counts + X_user_counts)[:, None] * lambda_u * U1 + eps)
        )
        U2 = U2 * jnp.sqrt(
            (U2_num + pair_num_U2)
            / (U2_den + pair_den_U2
               + (A_item_counts + Y_item_counts)[:, None] * lambda_u * U2 + eps)
        )
        H1 = H1 * jnp.sqrt(
            H1_num / (H1_den + A_user_counts[:, None] * lambda_h * H1 + eps)
        )
        H2 = H2 * jnp.sqrt(
            H2_num / (H2_den + A_item_counts[:, None] * lambda_h * H2 + eps)
        )
        return U1, U2, V, H1, H2

    return jax.lax.fori_loop(0, n_iters, body, (U1, U2, V, H1, H2))


class EFM(Recommender):
    """Explicit factor model with aspect-level explanations."""

    def __init__(
        self,
        name="EFM",
        num_explicit_factors=40,
        num_latent_factors=60,
        num_most_cared_aspects=15,
        rating_scale=5.0,
        alpha=0.85,
        lambda_x=1,
        lambda_y=1,
        lambda_u=0.01,
        lambda_h=0.01,
        lambda_v=0.01,
        use_item_aspect_popularity=True,
        max_iter=100,
        num_threads=0,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.num_threads = num_threads  # no-op: no host threading on TPU
        self.num_explicit_factors = num_explicit_factors
        self.num_latent_factors = num_latent_factors
        self.num_most_cared_aspects = num_most_cared_aspects
        self.rating_scale = rating_scale
        self.alpha = alpha
        self.lambda_x = lambda_x
        self.lambda_y = lambda_y
        self.lambda_u = lambda_u
        self.lambda_h = lambda_h
        self.lambda_v = lambda_v
        self.use_item_aspect_popularity = use_item_aspect_popularity
        self.max_iter = max_iter
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params
        self.U1 = self.init_params.get("U1", None)
        self.U2 = self.init_params.get("U2", None)
        self.V = self.init_params.get("V", None)
        self.H1 = self.init_params.get("H1", None)
        self.H2 = self.init_params.get("H2", None)

    @property
    def num_aspects(self):
        return self.train_set.sentiment.num_aspects

    def _compute_attention_score(self, count):
        return 1 + (self.rating_scale - 1) * (2 / (1 + np.exp(-count)) - 1)

    def _compute_quality_score(self, sentiment):
        return 1 + (self.rating_scale - 1) / (1 + np.exp(-sentiment))

    def _build_matrices(self, data_set):
        """A (ratings), X (user-aspect attention), Y (item-aspect quality)."""
        sentiment = data_set.sentiment
        u, i, r = data_set.uir_tuple
        keep = (u < self.num_users) & (i < self.num_items)
        A = sp.csr_matrix(
            (r[keep], (u[keep], i[keep])), shape=(self.num_users, self.num_items)
        )

        att, att_u, att_a = [], [], []
        for uid, tup_ids_by_item in sentiment.user_sentiment.items():
            if uid >= self.num_users:
                continue
            aspects = [
                tup[0]
                for tup_id in tup_ids_by_item.values()
                for tup in sentiment.sentiment[tup_id]
            ]
            for aid, count in Counter(aspects).items():
                att.append(self._compute_attention_score(count))
                att_u.append(uid)
                att_a.append(aid)
        X = sp.csr_matrix(
            (att, (att_u, att_a)), shape=(self.num_users, self.num_aspects)
        )

        qual, qual_i, qual_a = [], [], []
        for iid, tup_ids_by_user in sentiment.item_sentiment.items():
            if iid >= self.num_items:
                continue
            aspect_count = Counter(
                tup[0]
                for tup_id in tup_ids_by_user.values()
                for tup in sentiment.sentiment[tup_id]
            )
            total_by_aspect = OrderedDict()
            for tup_id in tup_ids_by_user.values():
                for aid, _, polarity in sentiment.sentiment[tup_id]:
                    total_by_aspect[aid] = total_by_aspect.get(aid, 0) + polarity
            for aid, total in total_by_aspect.items():
                qual_i.append(iid)
                qual_a.append(aid)
                if self.use_item_aspect_popularity:
                    qual.append(self._compute_quality_score(total))
                else:
                    qual.append(
                        self._compute_quality_score(total / aspect_count[aid])
                    )
        Y = sp.csr_matrix(
            (qual, (qual_i, qual_a)), shape=(self.num_items, self.num_aspects)
        )
        return A, X, Y

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.sentiment is None:
            raise ValueError("this model needs the sentiment modality attached to the eval method")
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        n_aspects = self.num_aspects
        n_factors = self.num_explicit_factors + self.num_latent_factors
        high = np.sqrt(self.rating_scale / n_factors)
        if self.U1 is None:
            self.U1 = uniform((self.num_users, self.num_explicit_factors), high=high, random_state=rng)
        if self.U2 is None:
            self.U2 = uniform((self.num_items, self.num_explicit_factors), high=high, random_state=rng)
        if self.V is None:
            self.V = uniform((n_aspects, self.num_explicit_factors), high=high, random_state=rng)
        if self.H1 is None:
            self.H1 = uniform((self.num_users, self.num_latent_factors), high=high, random_state=rng)
        if self.H2 is None:
            self.H2 = uniform((self.num_items, self.num_latent_factors), high=high, random_state=rng)

        A, X, Y = self._build_matrices(train_set)
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
        A_m = X_m = Y_m = None
        dev = jnp.asarray
        rep = dev
        if self.mesh is not None:
            # edge parallelism (same treatment as HPF/C2PF's CAVI): all
            # three observation streams shard over the data axis, the
            # multiplicative-update tables replicate; per-stream masks
            # make the padding rows exactly inert (see _efm_fit)
            from ..parallel import replicate_all, shard_batch

            msz = self.mesh.size

            def pad_stream(tr):
                r, c, v = tr
                pad = (-len(r)) % msz
                m = np.concatenate(
                    [np.ones(len(r), np.float32), np.zeros(pad, np.float32)]
                )
                z = lambda a: np.concatenate([a, np.zeros(pad, a.dtype)])
                return tuple(
                    shard_batch(self.mesh, jnp.asarray(t))
                    for t in (z(r), z(c), z(v), m)
                )

            *A_s, A_m = pad_stream(A_s)
            *X_s, X_m = pad_stream(X_s)
            *Y_s, Y_m = pad_stream(Y_s)
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
            A_m=A_m, X_m=X_m, Y_m=Y_m,
        )
        self.U1, self.U2 = np.asarray(U1, np.float64), np.asarray(U2, np.float64)
        self.V = np.asarray(V, np.float64)
        self.H1, self.H2 = np.asarray(H1, np.float64), np.asarray(H2, np.float64)
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return self.U2 @ self.U1[user_idx] + self.H2 @ self.H1[user_idx]
        return self.U2[item_idx] @ self.U1[user_idx] + self.H2[item_idx] @ self.H1[
            user_idx
        ]

    def _composite_scores(self, users):
        """Paper eq. 6: alpha * most-cared aspect match + (1-alpha) * rating."""
        X_ = self.U1[users] @ self.V.T  # (B, n_aspects)
        kmca = min(self.num_most_cared_aspects, X_.shape[1])
        top_idx = np.argsort(-X_, axis=1)[:, :kmca]  # (B, kmca)
        most_cared_X = np.take_along_axis(X_, top_idx, axis=1)
        Y_by_aspect = (self.U2 @ self.V.T).T  # (n_aspects, n_items)
        explicit = np.einsum(
            "bk,bki->bi", most_cared_X, Y_by_aspect[top_idx]
        ) / (kmca * self.rating_scale)
        base = self.U1[users] @ self.U2.T + self.H1[users] @ self.H2.T
        return self.alpha * explicit + (1 - self.alpha) * base

    def rank(self, user_idx, item_indices=None, k=-1, **kwargs):
        known_item_scores = self._composite_scores(np.asarray([user_idx]))[0]

        if len(known_item_scores) == self.total_items:
            all_item_scores = known_item_scores
        else:
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
        # ranking path uses the composite score, matching the reference's
        # rank() override (recom_efm.pyx rank)
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

    def score_pairs(self, user_indices, item_indices):
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        known = (
            (users >= 0)
            & (users < self.num_users)
            & (items >= 0)
            & (items < self.num_items)
        )
        u_safe, i_safe = np.where(known, users, 0), np.where(known, items, 0)
        preds = np.sum(self.U1[u_safe] * self.U2[i_safe], axis=1) + np.sum(
            self.H1[u_safe] * self.H2[i_safe], axis=1
        )
        return np.where(known, preds, self.default_score())
