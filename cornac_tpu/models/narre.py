"""NARRE — Neural Attentional Rating Regression with Review-level
Explanations (Chen et al., WWW 2018).

Capability parity with reference ``cornac/models/narre/recom_narre.py:21`` +
``narre/narre.py:28-254`` (keras/TF2: per-review text CNN, review-level
attention with partner-id embeddings, latent-factor rating head, MSE).

TPU redesign: review documents are packed once into device-resident
``(N, R, L)`` tensors (see ``review_utils.py``) so a train step is gathers
+ batched einsum text-CNN + masked-softmax attention — static shapes
throughout, whole epochs compiled as one program.  After training the
user/item attention towers collapse into cached factor tables
(P = user_emb + X, Q = item_emb + Y), so serving is a single MXU matmul
(reference recomputes this in ``get_weights``, narre.py:188).
"""

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


class NARRE(Recommender, ANNMixin):
    """Review-attention rating regressor."""

    def __init__(
        self,
        name="NARRE",
        embedding_size=100,
        id_embedding_size=32,
        n_factors=32,
        attention_size=16,
        kernel_sizes=None,
        n_filters=64,
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

    # -------------------------------------------------------------- params
    def _init_all(self, rng, n_vocab):
        E, D, F = self.embedding_size, self.id_embedding_size, self.n_filters
        FK = F * len(self.kernel_sizes)
        word = rng.uniform(-0.5, 0.5, size=(n_vocab, E)).astype(np.float32)
        word[:4] = 0.0  # special tokens (reference narre.py:169)
        pre = self.init_params.get("pretrained_word_embeddings")
        if pre is not None:
            vocab = self._vocab
            for tok, idx in vocab.tok2idx.items():
                vec = pre.get(tok)
                if vec is not None:
                    word[idx] = vec
        uni = lambda *s: jnp.asarray(
            rng.uniform(-0.05, 0.05, size=s).astype(np.float32)
        )
        return {
            "word_u": jnp.asarray(word),
            "word_i": jnp.asarray(word.copy()),
            "iid_emb": uni(self.num_items, D),
            "uid_emb": uni(self.num_users, D),
            "user_emb": uni(self.num_users, D),
            "item_emb": uni(self.num_items, D),
            "bu": jnp.full((self.num_users,), 0.1, jnp.float32),
            "bi": jnp.full((self.num_items,), 0.1, jnp.float32),
            "mu": jnp.float32(self.global_mean),
            "cnn_u": init_text_cnn(rng, E, self.kernel_sizes, F),
            "cnn_i": init_text_cnn(rng, E, self.kernel_sizes, F),
            "att_u1": init_dense_np(rng, FK + D, self.attention_size),
            "att_u2": init_dense_np(rng, self.attention_size, 1),
            "att_i1": init_dense_np(rng, FK + D, self.attention_size),
            "att_i2": init_dense_np(rng, self.attention_size, 1),
            "Xu": init_dense_np(rng, FK, self.n_factors),
            "Yi": init_dense_np(rng, FK, self.n_factors),
            "W1": init_dense_np(rng, self.n_factors, 1, bias=False),
        }

    # ------------------------------------------------------------ towers
    def _user_tower(self, params, u, tensors, key):
        rev, ids, cnt = tensors["u_rev"], tensors["u_ids"], tensors["u_cnt"]
        emb = params["word_u"][rev[u]]  # (B, R, L, E)
        h = text_cnn(params["cnn_u"], emb, self.kernel_sizes)  # (B, R, FK)
        a_in = jnp.concatenate([h, params["iid_emb"][ids[u]]], axis=-1)
        a = apply_dense(params["att_u2"], jax.nn.relu(apply_dense(params["att_u1"], a_in)))
        att = masked_attention(a, cnt[u], self.max_num_review)
        Oi = jnp.sum(att * h, axis=1)
        if key is not None and self.dropout_rate > 0:
            keep = 1.0 - self.dropout_rate
            Oi = Oi * jax.random.bernoulli(key, keep, Oi.shape) / keep
        return apply_dense(params["Xu"], Oi)

    def _item_tower(self, params, i, tensors, key):
        rev, ids, cnt = tensors["i_rev"], tensors["i_ids"], tensors["i_cnt"]
        emb = params["word_i"][rev[i]]
        h = text_cnn(params["cnn_i"], emb, self.kernel_sizes)
        a_in = jnp.concatenate([h, params["uid_emb"][ids[i]]], axis=-1)
        a = apply_dense(params["att_i2"], jax.nn.relu(apply_dense(params["att_i1"], a_in)))
        att = masked_attention(a, cnt[i], self.max_num_review)
        Oi = jnp.sum(att * h, axis=1)
        if key is not None and self.dropout_rate > 0:
            keep = 1.0 - self.dropout_rate
            Oi = Oi * jax.random.bernoulli(key, keep, Oi.shape) / keep
        return apply_dense(params["Yi"], Oi)

    def _predict(self, params, u, i, tensors, key):
        ku = ki = None
        if key is not None:
            ku, ki = jax.random.split(key)
        Xu = self._user_tower(params, u, tensors, ku)
        Yi = self._item_tower(params, i, tensors, ki)
        h0 = (params["user_emb"][u] + Xu) * (params["item_emb"][i] + Yi)
        return (
            apply_dense(params["W1"], h0)[:, 0]
            + params["bu"][u] + params["bi"][i] + params["mu"]
        )

    # ---------------------------------------------------------------- fit
    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.review_text is None:
            raise ValueError("NARRE requires a review_text (ReviewModality)")
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        self._vocab = train_set.review_text.vocab
        params = self._init_all(rng, self._vocab.size)

        R, L = self.max_num_review, self.max_text_length
        u_rev, u_ids, u_cnt = build_review_tensors(train_set, R, L, by="user")
        i_rev, i_ids, i_cnt = build_review_tensors(train_set, R, L, by="item")
        tensors = {
            "u_rev": jnp.asarray(u_rev), "u_ids": jnp.asarray(u_ids),
            "u_cnt": jnp.asarray(u_cnt),
            "i_rev": jnp.asarray(i_rev), "i_ids": jnp.asarray(i_ids),
            "i_cnt": jnp.asarray(i_cnt),
        }

        uid, iid, rating = train_set.uir_tuple
        n = len(uid)
        bsz = min(self.batch_size, n)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_pad = (-n) % bsz
        n_total = n + n_pad
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
            pred = self._predict(params, u, i, tensors, key)
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
            params, opt_state, _ = run_epochs(
                params, opt_state, key, self.max_iter
            )

        self.params = params
        self._cache_factors(tensors)
        return self

    def _val_mse(self, params, tensors, val_set):
        vu = jnp.asarray(val_set.uir_tuple[0], jnp.int32)
        vi = jnp.asarray(val_set.uir_tuple[1], jnp.int32)
        vr = np.asarray(val_set.uir_tuple[2], np.float32)
        pred = np.asarray(self._predict(params, vu, vi, tensors, None))
        return float(np.mean((pred - vr) ** 2))

    def _cache_factors(self, tensors):
        """Collapse the towers into factor tables (reference get_weights)."""
        params = self.params
        X = np.zeros((self.num_users, self.n_factors), np.float32)
        Y = np.zeros((self.num_items, self.n_factors), np.float32)
        step = 256
        for s in range(0, self.num_users, step):
            u = jnp.arange(s, min(s + step, self.num_users))
            X[s : s + step] = np.asarray(
                self._user_tower(params, u, tensors, None)
            )
        for s in range(0, self.num_items, step):
            i = jnp.arange(s, min(s + step, self.num_items))
            Y[s : s + step] = np.asarray(
                self._item_tower(params, i, tensors, None)
            )
        self.X, self.Y = X, Y
        self.P = np.asarray(params["user_emb"]) + X
        self.Q = np.asarray(params["item_emb"]) + Y
        self.W1 = np.asarray(params["W1"]["w"])[:, 0]
        self.bu = np.asarray(params["bu"])
        self.bi = np.asarray(params["bi"])
        self.mu = float(params["mu"])

    # ------------------------------------------------------------- scoring
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
