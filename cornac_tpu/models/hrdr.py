"""HRDR — Hybrid neural recommendation with joint deep Representation
learning of ratings and reviews (Liu et al., Neurocomputing 2021).

Capability parity with reference ``cornac/models/hrdr/recom_hrdr.py:23`` +
``hrdr/hrdr.py:46-160`` (keras/TF2): per-review text CNN towers whose
attention is *driven by* a rating-row MLP (Dense→Dense→Dense→BatchNorm),
prediction head on pu = [rating_h, ou, user_emb] ⊙ qi = [rating_h, oi,
item_emb].

TPU redesign: same static-tensor scaffold as ``narre.py`` — review packs
as device ``(N, R, L)`` tensors, text CNN as window einsum, whole epochs
compiled.  BatchNorm uses batch statistics during training; at caching /
inference time it normalizes with statistics computed over the FULL entity
set (deterministic population stats rather than an EMA of training
batches — documented deviation, same limit behavior).  The rating-MLP
output width is ``n_filters * len(kernel_sizes)`` so multi-kernel configs
compose (the reference multiplies a ``n_filters``-wide tensor against the
``n_filters*K``-wide CNN output and only supports K=1)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exception import ScoreException
from ..utils import get_rng
from .recommender import ANNMixin, MEASURE_DOT, Recommender
from .review_utils import (
    apply_dense,
    build_review_tensors,
    init_dense_np,
    init_text_cnn,
    masked_attention,
    text_cnn,
)

BN_EPS = 1e-3  # keras BatchNormalization default epsilon


def _bn_train(x, scale, offset):
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    return (x - mean) / jnp.sqrt(var + BN_EPS) * scale + offset


def _bn_eval(x, stats, scale, offset):
    mean, var = stats
    return (x - mean) / jnp.sqrt(var + BN_EPS) * scale + offset


class HRDR(Recommender, ANNMixin):
    """Rating-guided review attention rating regressor."""

    def __init__(
        self,
        name="HRDR",
        embedding_size=100,
        id_embedding_size=32,
        n_factors=32,
        attention_size=16,
        kernel_sizes=None,
        n_filters=64,
        n_user_mlp_factors=128,
        n_item_mlp_factors=128,
        dropout_rate=0.5,
        max_text_length=50,
        max_num_review=32,
        batch_size=64,
        max_iter=10,
        optimizer="adam",
        learning_rate=0.001,
        model_selection="last",
        user_based=True,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.embedding_size = embedding_size
        self.id_embedding_size = id_embedding_size
        self.n_factors = n_factors
        self.attention_size = attention_size
        self.kernel_sizes = [3] if kernel_sizes is None else list(kernel_sizes)
        self.n_filters = n_filters
        self.n_user_mlp_factors = n_user_mlp_factors
        self.n_item_mlp_factors = n_item_mlp_factors
        self.dropout_rate = dropout_rate
        self.max_text_length = max_text_length
        self.max_num_review = max_num_review
        self.batch_size = batch_size
        self.max_iter = max_iter
        self.optimizer = optimizer
        self.learning_rate = learning_rate
        self.model_selection = model_selection
        self.user_based = user_based
        self.seed = seed
        self.mesh = mesh
        self.init_params = {} if init_params is None else init_params
        self.losses = {"train_losses": [], "val_losses": []}
        if model_selection not in ("last", "best"):
            raise ValueError("model_selection is either 'last' or 'best'")
        if optimizer not in ("adam", "rmsprop"):
            raise ValueError("optimizer is either 'rmsprop' or 'adam'")

    def _init_all(self, rng, n_vocab):
        E, D = self.embedding_size, self.id_embedding_size
        FK = self.n_filters * len(self.kernel_sizes)
        word = rng.uniform(-0.5, 0.5, size=(n_vocab, E)).astype(np.float32)
        word[:4] = 0.0
        uni = lambda *s: jnp.asarray(
            rng.uniform(-0.05, 0.05, size=s).astype(np.float32)
        )
        umlp, imlp = self.n_user_mlp_factors, self.n_item_mlp_factors
        return {
            "word_u": jnp.asarray(word),
            "word_i": jnp.asarray(word.copy()),
            "user_emb": uni(self.num_users, D),
            "item_emb": uni(self.num_items, D),
            "bu": jnp.full((self.num_users,), 0.1, jnp.float32),
            "bi": jnp.full((self.num_items,), 0.1, jnp.float32),
            "mu": jnp.float32(self.global_mean),
            "cnn_u": init_text_cnn(rng, E, self.kernel_sizes, self.n_filters),
            "cnn_i": init_text_cnn(rng, E, self.kernel_sizes, self.n_filters),
            "u_mlp1": init_dense_np(rng, self.num_items, umlp),
            "u_mlp2": init_dense_np(rng, umlp, umlp // 2),
            "u_mlp3": init_dense_np(rng, umlp // 2, FK),
            "u_bn_scale": jnp.ones((FK,), jnp.float32),
            "u_bn_offset": jnp.zeros((FK,), jnp.float32),
            "i_mlp1": init_dense_np(rng, self.num_users, imlp),
            "i_mlp2": init_dense_np(rng, imlp, imlp // 2),
            "i_mlp3": init_dense_np(rng, imlp // 2, FK),
            "i_bn_scale": jnp.ones((FK,), jnp.float32),
            "i_bn_offset": jnp.zeros((FK,), jnp.float32),
            "att_u1": init_dense_np(rng, FK, self.attention_size),
            "att_u2": init_dense_np(rng, self.attention_size, 1),
            "att_i1": init_dense_np(rng, FK, self.attention_size),
            "att_i2": init_dense_np(rng, self.attention_size, 1),
            "ou": init_dense_np(rng, FK, self.n_factors),
            "oi": init_dense_np(rng, FK, self.n_factors),
            "W1": init_dense_np(rng, FK + self.n_factors + D, 1, bias=False),
        }

    def _rating_mlp(self, params, rows, side, bn_stats):
        h = jax.nn.relu(apply_dense(params[side + "_mlp1"], rows))
        h = jax.nn.relu(apply_dense(params[side + "_mlp2"], h))
        h = jax.nn.relu(apply_dense(params[side + "_mlp3"], h))
        scale = params[side + "_bn_scale"]
        offset = params[side + "_bn_offset"]
        if bn_stats is None:
            return _bn_train(h, scale, offset)
        return _bn_eval(h, bn_stats, scale, offset)

    def _rating_mlp_prebn(self, params, rows, side):
        h = jax.nn.relu(apply_dense(params[side + "_mlp1"], rows))
        h = jax.nn.relu(apply_dense(params[side + "_mlp2"], h))
        return jax.nn.relu(apply_dense(params[side + "_mlp3"], h))

    def _tower(self, params, idx, tensors, side, key, bn_stats):
        """side: 'u' or 'i'. Returns (rating_h, o) for the batch."""
        rev = tensors[side + "_rev"][idx]
        cnt = tensors[side + "_cnt"][idx]
        rows = tensors[side + "_rows"][idx]
        word = params["word_u" if side == "u" else "word_i"]
        cnn = params["cnn_u" if side == "u" else "cnn_i"]
        h = text_cnn(cnn, word[rev], self.kernel_sizes)  # (B, R, FK)
        rating_h = self._rating_mlp(params, rows, side, bn_stats)  # (B, FK)
        a_in = h * rating_h[:, None, :]
        a1 = params["att_" + side + "1"]
        a2 = params["att_" + side + "2"]
        a = apply_dense(a2, jax.nn.relu(apply_dense(a1, a_in)))
        att = masked_attention(a, cnt, self.max_num_review)
        o = jnp.sum(att * h, axis=1)
        if key is not None and self.dropout_rate > 0:
            keep = 1.0 - self.dropout_rate
            o = o * jax.random.bernoulli(key, keep, o.shape) / keep
        o = apply_dense(params["ou" if side == "u" else "oi"], o)
        return rating_h, o

    def _predict(self, params, u, i, tensors, key, bn_stats_u=None,
                 bn_stats_i=None):
        ku = ki = None
        if key is not None:
            ku, ki = jax.random.split(key)
        ur_h, ou = self._tower(params, u, tensors, "u", ku, bn_stats_u)
        ir_h, oi = self._tower(params, i, tensors, "i", ki, bn_stats_i)
        pu = jnp.concatenate([ur_h, ou, params["user_emb"][u]], axis=-1)
        qi = jnp.concatenate([ir_h, oi, params["item_emb"][i]], axis=-1)
        h0 = pu * qi
        return (
            apply_dense(params["W1"], h0)[:, 0]
            + params["bu"][u] + params["bi"][i] + params["mu"]
        ), pu, qi

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.review_text is None:
            raise ValueError("HRDR requires a review_text (ReviewModality)")
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        self._vocab = train_set.review_text.vocab
        params = self._init_all(rng, self._vocab.size)

        R, L = self.max_num_review, self.max_text_length
        u_rev, _, u_cnt = build_review_tensors(train_set, R, L, by="user")
        i_rev, _, i_cnt = build_review_tensors(train_set, R, L, by="item")
        Rmat = train_set.matrix
        tensors = {
            "u_rev": jnp.asarray(u_rev), "u_cnt": jnp.asarray(u_cnt),
            "u_rows": jnp.asarray(Rmat.toarray(), jnp.float32),
            "i_rev": jnp.asarray(i_rev), "i_cnt": jnp.asarray(i_cnt),
            "i_rows": jnp.asarray(Rmat.T.toarray(), jnp.float32),
        }

        uid, iid, rating = train_set.uir_tuple
        n = len(uid)
        bsz = min(self.batch_size, n)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_total = n + ((-n) % bsz)
        n_batches = n_total // bsz
        uid_d = jnp.asarray(uid, jnp.int32)
        iid_d = jnp.asarray(iid, jnp.int32)
        r_d = jnp.asarray(rating, jnp.float32)

        make_opt = optax.adam if self.optimizer == "adam" else optax.rmsprop
        opt = make_opt(self.learning_rate)
        opt_state = opt.init(params)

        # data-parallel over the mesh: params/optimizer/review tensors
        # replicated, each step's interaction minibatch sharded across
        # devices; GSPMD psums the gradients
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(self.mesh, P(tuple(self.mesh.axis_names)))
            params, opt_state, tensors, uid_d, iid_d, r_d = replicate_all(
                self.mesh, params, opt_state, tensors, uid_d, iid_d, r_d
            )

        def loss_fn(params, idx, key):
            u, i, r = uid_d[idx], iid_d[idx], r_d[idx]
            pred, _, _ = self._predict(params, u, i, tensors, key)
            return jnp.mean((pred - r) ** 2)

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs):
            def epoch(e, carry):
                params, opt_state, _ = carry
                ekey = jax.random.fold_in(key, e)
                perm = jax.random.permutation(ekey, n_total) % n

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    idx = jax.lax.dynamic_slice(perm, (b * bsz,), (bsz,))
                    if batch_shard is not None:
                        idx = jax.lax.with_sharding_constraint(idx, batch_shard)
                    loss, grads = jax.value_and_grad(loss_fn)(
                        params, idx, jax.random.fold_in(ekey, b)
                    )
                    updates, opt_state = opt.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, loss_sum + loss

                return jax.lax.fori_loop(
                    0, n_batches, step, (params, opt_state, jnp.float32(0.0))
                )

            return jax.lax.fori_loop(
                0, n_epochs, epoch, (params, opt_state, jnp.float32(0.0))
            )

        key = jax.random.PRNGKey(rng.randint(2**31))
        track_best = val_set is not None and self.model_selection == "best"
        if track_best or self.verbose:
            best_loss, best_params = np.inf, None
            for e in range(self.max_iter):
                params, opt_state, loss = run_epochs(
                    params, opt_state, jax.random.fold_in(key, e), 1
                )
                self.losses["train_losses"].append(float(loss) / n_batches)
                if track_best:
                    vmse = self._val_mse(params, tensors, val_set)
                    self.losses["val_losses"].append(vmse)
                    if vmse < best_loss:
                        best_loss = vmse
                        best_params = jax.tree_util.tree_map(jnp.copy, params)
                        self.best_epoch = e + 1
                if self.verbose:
                    print(
                        "Epoch %d/%d, loss: %.4f"
                        % (e + 1, self.max_iter, float(loss) / n_batches)
                    )
            if track_best and best_params is not None:
                params = best_params
        else:
            params, opt_state, _ = run_epochs(params, opt_state, key, self.max_iter)

        self.params = params
        self._cache_factors(tensors)
        return self

    def _population_bn_stats(self, params, tensors, side):
        h = self._rating_mlp_prebn(params, tensors[side + "_rows"], side)
        return jnp.mean(h, axis=0), jnp.var(h, axis=0)

    def _val_mse(self, params, tensors, val_set):
        su = self._population_bn_stats(params, tensors, "u")
        si = self._population_bn_stats(params, tensors, "i")
        vu = jnp.asarray(val_set.uir_tuple[0], jnp.int32)
        vi = jnp.asarray(val_set.uir_tuple[1], jnp.int32)
        vr = np.asarray(val_set.uir_tuple[2], np.float32)
        pred, _, _ = self._predict(params, vu, vi, tensors, None, su, si)
        return float(np.mean((np.asarray(pred) - vr) ** 2))

    def _cache_factors(self, tensors):
        params = self.params
        su = self._population_bn_stats(params, tensors, "u")
        si = self._population_bn_stats(params, tensors, "i")
        dim = (
            self.n_filters * len(self.kernel_sizes)
            + self.n_factors + self.id_embedding_size
        )
        P = np.zeros((self.num_users, dim), np.float32)
        Q = np.zeros((self.num_items, dim), np.float32)
        step = 256
        for s in range(0, self.num_users, step):
            u = jnp.arange(s, min(s + step, self.num_users))
            rh, o = self._tower(params, u, tensors, "u", None, su)
            P[s : s + step] = np.asarray(
                jnp.concatenate([rh, o, params["user_emb"][u]], axis=-1)
            )
        for s in range(0, self.num_items, step):
            i = jnp.arange(s, min(s + step, self.num_items))
            rh, o = self._tower(params, i, tensors, "i", None, si)
            Q[s : s + step] = np.asarray(
                jnp.concatenate([rh, o, params["item_emb"][i]], axis=-1)
            )
        self.P, self.Q = P, Q
        self.W1 = np.asarray(params["W1"]["w"])[:, 0]
        self.bu = np.asarray(params["bu"])
        self.bi = np.asarray(params["bi"])
        self.mu = float(params["mu"])

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        h0 = self.P[user_idx] * self.Q
        scores = h0 @ self.W1 + self.bu[user_idx] + self.bi + self.mu
        return scores if item_idx is None else float(scores[item_idx])

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        scores = (
            (self.P[safe] * self.W1[None, :]) @ self.Q.T
            + self.bu[safe][:, None] + self.bi[None, :] + self.mu
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
        return np.concatenate(
            [self.P, self.bu[:, None], np.ones((self.num_users, 1))], axis=1
        )

    def get_item_vectors(self):
        return np.concatenate(
            [
                self.Q * self.W1[None, :],
                np.ones((self.num_items, 1)),
                self.bi[:, None] + self.mu,
            ],
            axis=1,
        )
