"""CVAECF — Conditional VAE for Collaborative Filtering
(Lee et al., "Augmenting VAEs with social context", 2017/2021 line).

Capability parity with reference ``cornac/models/cvaecf/recom_cvaecf.py:24``
+ ``cvaecf/cvaecf.py:37-226``: a dual-latent conditional VAE where the
preference latent z is inferred from the user's binarized interaction row y
(q(z|y)) and the auxiliary latent h is inferred from the user's social
adjacency row x = ``train_set.user_graph.matrix`` (q(h|x)), regularized
toward both a conditional prior p(h|x) and a preference-side posterior
q(h|y).  The decoder reconstructs y from [z, h].

TPU redesign: pure-JAX pytree networks + optax Adam, the whole multi-epoch
loop compiled once with user batches sliced on device (same scaffold as
``vaecf.py``).  Deviation noted: the reference passes its loss weights in
the order ``(alpha_1, alpha_2, beta)`` into a signature declared
``(beta, alpha_1, alpha_2)`` (recom_cvaecf silently rotates them; all
defaults are 1.0 so it is invisible by default) — we apply the documented
semantics: ``beta``·KL(z), ``alpha_1``·KL(q(h|x)||p(h|x)),
``alpha_2``·KL(q(h|x)||q(h|y)).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import ACTIVATIONS, dense, init_dense, init_mlp
from ..exception import ScoreException
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from .recommender import Recommender

EPS = 1e-10

LIKELIHOODS = ("mult", "bern", "gaus", "pois")


def _init_branch(rng, sizes, out_dim):
    """Encoder trunk (MLP over ``sizes``) + mu/logvar heads."""
    return {
        "trunk": init_mlp(rng, sizes),
        "mu": init_dense(rng, sizes[-1], out_dim),
        "logvar": init_dense(rng, sizes[-1], out_dim),
    }


def _branch(params, x, act):
    h = x
    for layer in params["trunk"]:
        h = act(dense(layer, h))
    return dense(params["mu"], h), dense(params["logvar"], h)


def _init_cvae(rng, z_dim, h_dim, sizes_y, sizes_x):
    dec_sizes = [z_dim + h_dim] + sizes_y[::-1]
    return {
        "qz": _init_branch(rng, sizes_y, z_dim),   # q(z|y)
        "qhx": _init_branch(rng, sizes_x, h_dim),  # q(h|x)
        "qhy": _init_branch(rng, sizes_y, h_dim),  # q(h|y)
        "phx": _init_branch(rng, sizes_x, h_dim),  # p(h|x) prior
        "decoder": init_mlp(rng, dec_sizes),
    }


def _decode(params, z, h, act, likelihood):
    out = jnp.concatenate([z, h], axis=1)
    layers = params["decoder"]
    for layer in layers[:-1]:
        out = act(dense(layer, out))
    out = dense(layers[-1], out)
    if likelihood == "mult":
        return jax.nn.softmax(out, axis=1)
    return jax.nn.sigmoid(out)


def _cvae_loss(params, y, x, key, act, likelihood, beta, alpha_1, alpha_2):
    mu_qz, logvar_qz = _branch(params["qz"], y, act)
    mu_qhx, logvar_qhx = _branch(params["qhx"], x, act)
    mu_qhy, logvar_qhy = _branch(params["qhy"], y, act)
    mu_ph, _logvar_ph = _branch(params["phx"], x, act)

    kz, kh = jax.random.split(key)
    z = mu_qz + jax.random.normal(kz, mu_qz.shape) * jnp.exp(0.5 * logvar_qz)
    h = mu_qhx + jax.random.normal(kh, mu_qhx.shape) * jnp.exp(0.5 * logvar_qhx)
    y_ = _decode(params, z, h, act, likelihood)

    if likelihood == "mult":
        ll = y * jnp.log(y_ + EPS)
    elif likelihood == "bern":
        ll = y * jnp.log(y_ + EPS) + (1 - y) * jnp.log(1 - y_ + EPS)
    elif likelihood == "gaus":
        ll = -((y - y_) ** 2)
    else:  # pois
        ll = y * jnp.log(y_ + EPS) - y_
    ll = jnp.sum(ll, axis=1)

    # KL(q(z|y) || N(0, I))
    kld_z = -0.5 * jnp.sum(1 + logvar_qz - mu_qz**2 - jnp.exp(logvar_qz), axis=1)

    # KL(q(h|x) || p(h|x)) with unit prior variance (reference cvaecf.py:165)
    kld_hx = -0.5 * jnp.sum(
        1 + logvar_qhx - (mu_qhx - mu_ph) ** 2 - jnp.exp(logvar_qhx), axis=1
    )

    # KL(q(h|x) || q(h|y)) (reference cvaecf.py:172)
    kld_hy = -0.5 * jnp.sum(
        1
        + logvar_qhx
        - logvar_qhy
        - ((mu_qhx - mu_qhy) ** 2 + jnp.exp(logvar_qhx)) / jnp.exp(logvar_qhy),
        axis=1,
    )

    return jnp.mean(beta * kld_z + alpha_1 * kld_hx + alpha_2 * kld_hy - ll)


class CVAECF(Recommender):
    """Conditional VAE over preference rows with a social-graph latent.

    Requires ``user_graph`` modality on the eval method; uses
    x = user_graph.matrix rows as the conditioning signal.
    """

    def __init__(
        self,
        name="CVAECF",
        z_dim=20,
        h_dim=20,
        autoencoder_structure=None,
        act_fn="tanh",
        likelihood="mult",
        n_epochs=100,
        batch_size=128,
        learning_rate=0.001,
        beta=1.0,
        alpha_1=1.0,
        alpha_2=1.0,
        trainable=True,
        verbose=False,
        seed=None,
        use_gpu=False,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.z_dim = z_dim
        self.h_dim = h_dim
        self.autoencoder_structure = (
            [20] if autoencoder_structure is None else autoencoder_structure
        )
        self.act_fn = act_fn
        self.likelihood = likelihood
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.beta = beta
        self.alpha_1 = alpha_1
        self.alpha_2 = alpha_2
        self.seed = seed
        self.mesh = mesh
        self.use_gpu = use_gpu

        if self.likelihood not in LIKELIHOODS:
            raise ValueError("Supported likelihoods: {}".format(LIKELIHOODS))
        if self.act_fn not in ACTIVATIONS:
            raise ValueError("Supported act_fn: {}".format(list(ACTIVATIONS)))

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        if train_set.user_graph is None:
            raise ValueError("CVAECF requires a user_graph modality")

        self.r_mat = train_set.matrix
        # social adjacency restricted to train users (recom_cvaecf.py:194)
        adj = train_set.user_graph.matrix
        n_users = self.r_mat.shape[0]
        self.u_adj_mat = adj[:n_users, :n_users]

        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        n_items = self.r_mat.shape[1]
        if not hasattr(self, "params"):
            self.params = _init_cvae(
                rng,
                self.z_dim,
                self.h_dim,
                [n_items] + self.autoencoder_structure,
                [n_users] + self.autoencoder_structure,
            )

        act = ACTIVATIONS[self.act_fn]
        likelihood = self.likelihood
        beta = jnp.float32(self.beta)
        alpha_1 = jnp.float32(self.alpha_1)
        alpha_2 = jnp.float32(self.alpha_2)

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(self.params)

        Y = (self.r_mat > 0).astype(np.float32).toarray()
        Xs = np.asarray(self.u_adj_mat.todense(), dtype=np.float32)
        bsz = min(self.batch_size, n_users)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_pad = (-n_users) % bsz
        if n_pad:
            Y = np.concatenate([Y, np.zeros((n_pad, n_items), np.float32)])
            Xs = np.concatenate([Xs, np.zeros((n_pad, n_users), np.float32)])
        n_batches = Y.shape[0] // bsz

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, Y_d, X_d, key, n_epochs, epoch_offset):
            def epoch(e, carry):
                params, opt_state, _ = carry
                # global epoch index: stream invariant to host chunking
                ekey = jax.random.fold_in(key, epoch_offset + e)

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    y = jax.lax.dynamic_slice(Y_d, (b * bsz, 0), (bsz, n_items))
                    x = jax.lax.dynamic_slice(X_d, (b * bsz, 0), (bsz, n_users))
                    if batch_shard is not None:
                        y = jax.lax.with_sharding_constraint(y, batch_shard)
                        x = jax.lax.with_sharding_constraint(x, batch_shard)
                    loss, grads = jax.value_and_grad(_cvae_loss)(
                        params, y, x, jax.random.fold_in(ekey, b),
                        act, likelihood, beta, alpha_1, alpha_2,
                    )
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, loss_sum + loss

                return jax.lax.fori_loop(
                    0, n_batches, step, (params, opt_state, jnp.float32(0.0))
                )

            return jax.lax.fori_loop(
                0, n_epochs, epoch, (params, opt_state, jnp.float32(0.0))
            )

        key = jax.random.PRNGKey(rng.randint(2**31))
        Y_d, X_d = jnp.asarray(Y), jnp.asarray(Xs)

        # data-parallel over the mesh: params/opt/rating/social matrices
        # replicated, each step's user batch sharded (GSPMD psums grads)
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names), None)
            )
            self.params, opt_state, Y_d, X_d = replicate_all(
                self.mesh, self.params, opt_state, Y_d, X_d
            )

        def run_chunk(state, start, e):
            params, opt_state, loss_sum = run_epochs(
                state[0], state[1], Y_d, X_d, key, e, start
            )
            return (params, opt_state), loss_sum

        self.params, opt_state = epoch_loop(
            self, self.n_epochs, run_chunk, (self.params, opt_state),
            on_report=lambda done, loss: print(
                "Epoch %d/%d, loss: %.4f"
                % (done, self.n_epochs, float(loss) / n_batches)
            ),
        )
        return self

    def _decode_users(self, y_rows, x_rows):
        act = ACTIVATIONS[self.act_fn]
        mu_z, _ = _branch(self.params["qz"], jnp.asarray(y_rows), act)
        mu_h, _ = _branch(self.params["qhx"], jnp.asarray(x_rows), act)
        return np.asarray(_decode(self.params, mu_z, mu_h, act, self.likelihood))

    def _user_rows(self, users):
        y = (self.r_mat[users] > 0).astype(np.float32).toarray()
        x = (self.u_adj_mat[users] > 0).astype(np.float32).toarray()
        return y, x

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        y, x = self._user_rows([user_idx])
        scores = self._decode_users(y, x)[0]
        return scores if item_idx is None else scores[item_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        y, x = self._user_rows(np.where(known, users, 0))
        scores = self._decode_users(y, x).astype(np.float64)
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
