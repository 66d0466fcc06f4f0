"""RecVAE (Shenbin et al., WSDM 2020).

Capability parity with reference ``cornac/models/recvae/recom_recvae.py:23``
+ ``recvae/recvae.py`` (torch): residual swish/LayerNorm encoder, linear
decoder, composite prior (standard + frozen-old-posterior + uniform
mixture), alternating encoder/decoder optimization with prior updates.
Pure-JAX pytree implementation; each enc/dec phase is a jitted epoch.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import dense, init_dense
from ..exception import ScoreException
from ..utils import get_rng
from .recommender import Recommender

LOG2PI = float(np.log(2 * np.pi))


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _layernorm(x, eps=1e-1):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


def _log_norm_pdf(x, mu, logvar):
    return -0.5 * (logvar + LOG2PI + (x - mu) ** 2 / jnp.exp(logvar))


def _init_encoder(rng, input_dim, hidden, latent):
    return {
        "fc": [init_dense(rng, input_dim, hidden)]
        + [init_dense(rng, hidden, hidden) for _ in range(4)],
        "mu": init_dense(rng, hidden, latent),
        "logvar": init_dense(rng, hidden, latent),
    }


def _encode_ref(enc, x, dropout_rate, key):
    """Faithful residual wiring (recvae.py:66-76): h_k = LN(swish(fc_k(
    h_{k-1}) + h_1 + ... + h_{k-1}))."""
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    if dropout_rate > 0:
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)

    h1 = _layernorm(_swish(dense(enc["fc"][0], x)))
    acc = h1
    prev = h1
    for layer in enc["fc"][1:]:
        prev = _layernorm(_swish(dense(layer, prev) + acc))
        acc = acc + prev
    return dense(enc["mu"], prev), dense(enc["logvar"], prev)


class RecVAE(Recommender):
    """VAE with composite prior and alternating optimization."""

    def __init__(
        self,
        name="RecVae",
        hidden_dim=600,
        latent_dim=200,
        batch_size=100,
        beta=None,
        gamma=0.005,
        lr=5e-4,
        n_epochs=100,
        n_enc_epochs=3,
        n_dec_epochs=1,
        not_alternating=False,
        trainable=True,
        verbose=False,
        seed=None,
        use_gpu=True,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.hidden_dim = hidden_dim
        self.latent_dim = latent_dim
        self.batch_size = batch_size
        self.beta = beta
        self.gamma = gamma
        self.lr = lr
        self.n_epochs = n_epochs
        self.n_enc_epochs = n_enc_epochs
        self.n_dec_epochs = n_dec_epochs
        self.not_alternating = not_alternating
        self.seed = seed
        self.use_gpu = use_gpu  # API parity

    def _loss(self, enc, dec, enc_old, x, key, dropout_rate):
        mu, logvar = _encode_ref(enc, x, dropout_rate, jax.random.fold_in(key, 0))
        std = jnp.exp(0.5 * logvar)
        eps = 0.01 * jax.random.normal(jax.random.fold_in(key, 1), mu.shape)
        z = mu + eps * std
        x_pred = dense(dec, z)

        if self.gamma:
            kl_weight = self.gamma * x.sum(axis=-1)
        else:
            kl_weight = self.beta

        mll = jnp.mean(jnp.sum(jax.nn.log_softmax(x_pred, axis=-1) * x, axis=-1))

        # composite prior: N(0,1), old posterior, N(0, e^10)
        post_mu, post_logvar = _encode_ref(
            enc_old, x, 0.0, jax.random.fold_in(key, 2)
        )
        stnd = _log_norm_pdf(z, 0.0, jnp.zeros_like(z))
        post = _log_norm_pdf(z, post_mu, post_logvar)
        unif = _log_norm_pdf(z, 0.0, jnp.full_like(z, 10.0))
        w = [3 / 20, 3 / 4, 1 / 10]
        prior = jax.scipy.special.logsumexp(
            jnp.stack(
                [stnd + np.log(w[0]), post + np.log(w[1]), unif + np.log(w[2])],
                axis=-1,
            ),
            axis=-1,
        )
        kld = jnp.mean(
            jnp.sum(_log_norm_pdf(z, mu, logvar) - prior, axis=-1) * kl_weight
        )
        return -(mll - kld)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        input_dim = train_set.num_items
        self.enc = _init_encoder(rng, input_dim, self.hidden_dim, self.latent_dim)
        self.dec = init_dense(rng, self.latent_dim, input_dim)
        enc_old = jax.tree_util.tree_map(lambda x: x, self.enc)

        X = (train_set.matrix > 0).astype(np.float32).toarray()
        n_users = X.shape[0]
        bsz = min(self.batch_size, n_users)
        n_pad = (-n_users) % bsz
        if n_pad:
            X = np.concatenate([X, np.zeros((n_pad, input_dim), np.float32)])
        n_batches = X.shape[0] // bsz
        X_d = jnp.asarray(X)

        opt_enc = optax.adam(self.lr)
        opt_dec = optax.adam(self.lr)
        enc_state = opt_enc.init(self.enc)
        dec_state = opt_dec.init(self.dec)

        if self.mesh is not None:
            # data parallelism: user rows sharded over the data axis,
            # parameters/optimizer states replicated; GSPMD inserts the
            # gradient psum — same math, same result as single-device
            from ..parallel import replicate_all, shard_batch

            X_d = shard_batch(self.mesh, X_d)
            self.enc, self.dec, enc_state, dec_state, enc_old = replicate_all(
                self.mesh, self.enc, self.dec, enc_state, dec_state, enc_old
            )

        @partial(jax.jit, static_argnames=("dropout_rate",))
        def enc_epoch(enc, enc_state, dec, enc_old, key, dropout_rate):
            def step(b, carry):
                enc, enc_state = carry
                x = jax.lax.dynamic_slice(X_d, (b * bsz, 0), (bsz, input_dim))
                grads = jax.grad(
                    lambda e: self._loss(
                        e, dec, enc_old, x, jax.random.fold_in(key, b), dropout_rate
                    )
                )(enc)
                updates, enc_state = opt_enc.update(grads, enc_state, enc)
                return optax.apply_updates(enc, updates), enc_state

            return jax.lax.fori_loop(0, n_batches, step, (enc, enc_state))

        @jax.jit
        def dec_epoch(dec, dec_state, enc, enc_old, key):
            def step(b, carry):
                dec, dec_state = carry
                x = jax.lax.dynamic_slice(X_d, (b * bsz, 0), (bsz, input_dim))
                grads = jax.grad(
                    lambda d: self._loss(
                        enc, d, enc_old, x, jax.random.fold_in(key, b), 0.0
                    )
                )(dec)
                updates, dec_state = opt_dec.update(grads, dec_state, dec)
                return optax.apply_updates(dec, updates), dec_state

            return jax.lax.fori_loop(0, n_batches, step, (dec, dec_state))

        key = jax.random.PRNGKey(rng.randint(2**31))
        for epoch in range(self.n_epochs):
            ekey = jax.random.fold_in(key, epoch)
            if self.not_alternating:
                self.enc, enc_state = enc_epoch(
                    self.enc, enc_state, self.dec, enc_old, ekey, 0.5
                )
                self.dec, dec_state = dec_epoch(
                    self.dec, dec_state, self.enc, enc_old, ekey
                )
            else:
                for i in range(self.n_enc_epochs):
                    self.enc, enc_state = enc_epoch(
                        self.enc,
                        enc_state,
                        self.dec,
                        enc_old,
                        jax.random.fold_in(ekey, i),
                        0.5,
                    )
                enc_old = jax.tree_util.tree_map(lambda x: x, self.enc)  # update prior
                for i in range(self.n_dec_epochs):
                    self.dec, dec_state = dec_epoch(
                        self.dec,
                        dec_state,
                        self.enc,
                        enc_old,
                        jax.random.fold_in(ekey, 100 + i),
                    )
            if self.verbose:
                print("Epoch %d/%d done" % (epoch + 1, self.n_epochs))

        self.r_mat = train_set.matrix
        return self

    def _decode_rows(self, rows):
        key = jax.random.PRNGKey(0)
        mu, _ = _encode_ref(self.enc, jnp.asarray(rows), 0.0, key)
        return np.asarray(dense(self.dec, mu))

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        row = (self.r_mat[user_idx] > 0).astype(np.float32).toarray()
        scores = self._decode_rows(row)[0]
        return scores if item_idx is None else scores[item_idx]

    def score_pairs(self, user_indices, item_indices):
        return self._score_pairs_from_rows(user_indices, item_indices)

    def _known_scores_device(self, safe_users, known):
        rows = (self.r_mat[safe_users] > 0).astype(np.float32).toarray()
        mu, _ = _encode_ref(self.enc, jnp.asarray(rows), 0.0, jax.random.PRNGKey(0))
        return dense(self.dec, mu)

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        rows = (self.r_mat[np.where(known, users, 0)] > 0).astype(np.float32).toarray()
        scores = self._decode_rows(rows).astype(np.float64)
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
