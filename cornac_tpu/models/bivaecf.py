"""BiVAECF — Bilateral Variational Autoencoder (Truong et al., WSDM 2021).

Capability parity with reference ``cornac/models/bivaecf/recom_bivaecf.py:24``
+ ``bivaecf/bivae.py`` (torch): dual user/item VAEs trained alternately
(item sweep then user sweep per epoch), bern/gaus/pois likelihoods, optional
Constrained Adaptive Priors from feature modalities. Pure-JAX pytrees with
optax Adam; each side's sweep is a jitted loop over entity batches.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import ACTIVATIONS, dense, init_dense, init_mlp
from ..exception import ScoreException
from ..utils import get_rng
from .recommender import ANNMixin, MEASURE_DOT, Recommender

EPS = 1e-10
LIKELIHOODS = ("bern", "gaus", "pois")


def _init_side(rng, sizes, k):
    return {
        "enc": init_mlp(rng, sizes),
        "mu": init_dense(rng, sizes[-1], k),
        "std": init_dense(rng, sizes[-1], k),
    }


def _encode_side(side, x, act):
    h = x
    for layer in side["enc"]:
        h = act(dense(layer, h))
    return dense(side["mu"], h), jax.nn.sigmoid(dense(side["std"], h))


def _side_loss(side, x, other_table, key, act, likelihood, kl_beta, mu_prior):
    mu, std = _encode_side(side, x, act)
    z = mu + jax.random.normal(key, mu.shape) * std
    x_ = jax.nn.sigmoid(z @ other_table.T)

    if likelihood == "bern":
        ll = x * jnp.log(x_ + EPS) + (1 - x) * jnp.log(1 - x_ + EPS)
    elif likelihood == "gaus":
        ll = -((x - x_) ** 2)
    else:  # pois
        ll = x * jnp.log(x_ + EPS) - x_
    ll = jnp.sum(ll, axis=1)

    kld = -0.5 * jnp.sum(
        1 + 2.0 * jnp.log(std) - (mu - mu_prior) ** 2 - std**2, axis=1
    )
    return jnp.mean(kl_beta * kld - ll)


class BiVAECF(Recommender, ANNMixin):
    """Dual VAEs over user rows and item columns with shared latent dim."""

    def __init__(
        self,
        name="BiVAECF",
        k=10,
        encoder_structure=None,
        act_fn="tanh",
        likelihood="pois",
        n_epochs=100,
        batch_size=100,
        learning_rate=0.001,
        beta_kl=1.0,
        cap_priors=None,
        trainable=True,
        verbose=False,
        seed=None,
        use_gpu=True,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.k = k
        self.encoder_structure = (
            [20] if encoder_structure is None else list(encoder_structure)
        )
        self.act_fn = act_fn
        self.likelihood = likelihood
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.beta_kl = beta_kl
        self.cap_priors = (
            {"user": False, "item": False} if cap_priors is None else cap_priors
        )
        self.seed = seed
        self.use_gpu = use_gpu  # API parity

        if self.likelihood not in LIKELIHOODS:
            raise ValueError("Supported likelihoods: {}".format(LIKELIHOODS))
        if self.act_fn not in ACTIVATIONS:
            raise ValueError("Supported act_fn: {}".format(list(ACTIVATIONS)))

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        n_users, n_items = train_set.num_users, train_set.num_items
        act = ACTIVATIONS[self.act_fn]

        user_side = _init_side(rng, [n_items] + self.encoder_structure, self.k)
        item_side = _init_side(rng, [n_users] + self.encoder_structure, self.k)

        cap_user = self.cap_priors.get("user", False)
        cap_item = self.cap_priors.get("item", False)
        user_feats = item_feats = None
        if cap_user:
            user_feats = np.asarray(
                train_set.user_feature.features[:n_users], dtype=np.float32
            )
            user_side["prior"] = init_dense(rng, user_feats.shape[1], self.k)
        if cap_item:
            item_feats = np.asarray(
                train_set.item_feature.features[:n_items], dtype=np.float32
            )
            item_side["prior"] = init_dense(rng, item_feats.shape[1], self.k)

        theta = jnp.asarray(
            rng.normal(0, 0.01, (n_users, self.k)).astype(np.float32)
        )
        beta = jnp.asarray(rng.normal(0, 0.01, (n_items, self.k)).astype(np.float32))

        X = (train_set.matrix > 0).astype(np.float32).toarray()
        XT = np.ascontiguousarray(X.T)

        def pad(A, bsz):
            n_pad = (-A.shape[0]) % bsz
            if n_pad:
                A = np.concatenate([A, np.zeros((n_pad, A.shape[1]), np.float32)])
            return jnp.asarray(A), A.shape[0] // bsz

        bsz_u = min(self.batch_size, n_users)
        bsz_i = min(self.batch_size, n_items)
        X_d, nb_u = pad(X, bsz_u)
        XT_d, nb_i = pad(XT, bsz_i)

        def pad_feats(F, n_rows):
            # keep feature rows aligned with the batch-padded data rows so
            # dynamic_slice never clamps the last batch onto stale rows
            if F.shape[0] < n_rows:
                F = np.concatenate(
                    [F, np.zeros((n_rows - F.shape[0], F.shape[1]), np.float32)]
                )
            return jnp.asarray(F)

        uf_d = pad_feats(user_feats, X_d.shape[0]) if cap_user else None
        if_d = pad_feats(item_feats, XT_d.shape[0]) if cap_item else None

        opt_u = optax.adam(self.learning_rate)
        opt_i = optax.adam(self.learning_rate)
        state_u = opt_u.init(user_side)
        state_i = opt_i.init(item_side)

        if self.mesh is not None:
            # data parallelism on BOTH sweeps: user rows (X) and item rows
            # (X^T) sharded over the data axis, encoder/optimizer pytrees
            # and the opposing latent table replicated; GSPMD inserts the
            # per-batch gradient psum — identical math to single-device
            from ..parallel import replicate_all, shard_batch
            from ..parallel.mesh import DATA_AXIS, pad_rows_to_multiple

            # device_put needs the row count divisible by the data axis;
            # the extra zero rows sit beyond nb*bsz and are never sliced
            dsz = self.mesh.shape[DATA_AXIS]
            shard_padded = lambda a: shard_batch(
                self.mesh, pad_rows_to_multiple(np.asarray(a), dsz)
            )
            X_d = shard_padded(X_d)
            XT_d = shard_padded(XT_d)
            user_side, item_side, state_u, state_i, theta, beta = replicate_all(
                self.mesh, user_side, item_side, state_u, state_i, theta, beta
            )
            if uf_d is not None:
                uf_d = shard_padded(uf_d)
            if if_d is not None:
                if_d = shard_padded(if_d)

        likelihood, kl_beta = self.likelihood, self.beta_kl

        def make_sweep(data_d, n_batches, bsz, opt, feats_d, cap, n_real):
            @jax.jit
            def sweep(side, state, other_table, key):
                def step(b, carry):
                    side, state, table, mu_table = carry
                    x = jax.lax.dynamic_slice(
                        data_d, (b * bsz, 0), (bsz, data_d.shape[1])
                    )
                    if cap:
                        f = jax.lax.dynamic_slice(
                            feats_d, (b * bsz, 0), (bsz, feats_d.shape[1])
                        )
                        mu_prior = dense(side["prior"], f)
                    else:
                        mu_prior = 0.0
                    loss_fn = lambda s: _side_loss(
                        s,
                        x,
                        other_table,
                        jax.random.fold_in(key, b),
                        act,
                        likelihood,
                        kl_beta,
                        mu_prior,
                    )
                    grads = jax.grad(loss_fn)(side)
                    updates, state = opt.update(grads, state, side)
                    side = optax.apply_updates(side, updates)
                    # refresh this side's latent table with the new encoder
                    mu, std = _encode_side(side, x, act)
                    z = mu + jax.random.normal(
                        jax.random.fold_in(key, b + 10000), mu.shape
                    ) * std
                    table = jax.lax.dynamic_update_slice(table, z, (b * bsz, 0))
                    mu_table = jax.lax.dynamic_update_slice(
                        mu_table, mu, (b * bsz, 0)
                    )
                    return side, state, table, mu_table

                table0 = jnp.zeros((n_batches * bsz, side["mu"]["b"].shape[0]))
                mu0 = jnp.zeros_like(table0)
                side, state, table, mu_table = jax.lax.fori_loop(
                    0, n_batches, step, (side, state, table0, mu0)
                )
                return side, state, table[:n_real], mu_table[:n_real]

            return sweep

        item_sweep = make_sweep(XT_d, nb_i, bsz_i, opt_i, if_d, cap_item, n_items)
        user_sweep = make_sweep(X_d, nb_u, bsz_u, opt_u, uf_d, cap_user, n_users)

        key = jax.random.PRNGKey(rng.randint(2**31))
        mu_theta, mu_beta = jnp.zeros_like(theta), jnp.zeros_like(beta)
        for epoch in range(self.n_epochs):
            ekey = jax.random.fold_in(key, epoch)
            item_side, state_i, beta, mu_beta = item_sweep(
                item_side, state_i, theta, jax.random.fold_in(ekey, 0)
            )
            user_side, state_u, theta, mu_theta = user_sweep(
                user_side, state_u, beta, jax.random.fold_in(ekey, 1)
            )
            if self.verbose:
                print("Epoch %d/%d done" % (epoch + 1, self.n_epochs))

        self.user_side, self.item_side = user_side, item_side
        self.mu_theta = np.asarray(mu_theta, dtype=np.float64)
        self.mu_beta = np.asarray(mu_beta, dtype=np.float64)
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        from scipy.special import expit

        if item_idx is None:
            return expit(self.mu_beta @ self.mu_theta[user_idx])
        # pointwise predictions are scaled from the decoder's [0, 1] range
        # to the rating range (reference recom_bivaecf.py:225)
        pred = float(expit(self.mu_beta[item_idx] @ self.mu_theta[user_idx]))
        return self.min_rating + pred * (self.max_rating - self.min_rating)

    def score_pairs(self, user_indices, item_indices):
        # pointwise predictions are row values scaled to the rating range
        # (reference recom_bivaecf.py:225)
        span = self.max_rating - self.min_rating
        return self._score_pairs_from_rows(
            user_indices, item_indices,
            transform=lambda s: self.min_rating + s * span,
        )

    def _known_scores_device(self, safe_users, known):
        import jax

        from ..ops.dense_scores import device_dot

        return jax.nn.sigmoid(device_dot(self.mu_theta[safe_users], self.mu_beta))

    def score_batch(self, user_indices):
        from scipy.special import expit

        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = expit(self.mu_theta[np.where(known, users, 0)] @ self.mu_beta.T)
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
        return self.mu_theta

    def get_item_vectors(self):
        return self.mu_beta
