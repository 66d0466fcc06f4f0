"""VAECF — Variational Autoencoder for Collaborative Filtering
(Liang et al., WWW 2018).

Capability parity with reference ``cornac/models/vaecf/recom_vaecf.py:22`` +
``vaecf/vaecf.py:37-160`` (torch VAE with mult/bern/gaus/pois likelihoods,
Adam). TPU redesign: pure-JAX VAE over pytrees with optax Adam; when the
binarized interaction matrix fits a device-memory budget the whole multi-
epoch loop runs as one compiled program (user batches sliced on device).
Above that budget only the CSR *coordinates* go to the device (int32
pairs, ~1% of the dense bytes at Netflix shape) and each user batch is
densified on device by a masked scatter — still one compiled program per
chunk. Only when even the coordinates blow their budget (or training is
mesh-sharded out of HBM) does the loop stream per-batch index windows.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import ACTIVATIONS, dense, init_dense, init_mlp, mlp
from ..exception import ScoreException
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from .recommender import ANNMixin, MEASURE_DOT, Recommender

EPS = 1e-10

# keep the dense interaction matrix on device when below this budget
_RESIDENT_BYTES = 512 * 1024 * 1024
# above the dense budget, keep the *CSR indices* on device when they fit
# this one (a Netflix-shape matrix is ~34 GB dense but <1 GB as int32
# index pairs) and densify each user batch on device with one scatter
_SPARSE_RESIDENT_BYTES = 4 * 1024 * 1024 * 1024

LIKELIHOODS = ("mult", "bern", "gaus", "pois")


def _init_vae(rng, z_dim, ae_structure):
    enc_sizes = ae_structure  # [data_dim, h1, ...]
    dec_sizes = [z_dim] + ae_structure[::-1]
    return {
        "encoder": init_mlp(rng, enc_sizes),
        "enc_mu": init_dense(rng, enc_sizes[-1], z_dim),
        "enc_logvar": init_dense(rng, enc_sizes[-1], z_dim),
        "decoder": init_mlp(rng, dec_sizes),
    }


def _encode(params, x, act):
    h = x
    for layer in params["encoder"]:
        h = act(dense(layer, h))
    return dense(params["enc_mu"], h), dense(params["enc_logvar"], h)


def _decode(params, z, act, likelihood):
    h = mlp(params["decoder"], z, act)
    if likelihood == "mult":
        return jax.nn.softmax(h, axis=1)
    return jax.nn.sigmoid(h)


def _vae_loss(params, x, key, act, likelihood, beta):
    mu, logvar = _encode(params, x, act)
    std = jnp.exp(0.5 * logvar)
    z = mu + jax.random.normal(key, mu.shape) * std
    x_ = _decode(params, z, act, likelihood)

    if likelihood == "mult":
        ll = x * jnp.log(x_ + EPS)
    elif likelihood == "bern":
        ll = x * jnp.log(x_ + EPS) + (1 - x) * jnp.log(1 - x_ + EPS)
    elif likelihood == "gaus":
        ll = -((x - x_) ** 2)
    else:  # pois
        ll = x * jnp.log(x_ + EPS) - x_
    ll = jnp.sum(ll, axis=1)

    kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    return jnp.mean(beta * kld - ll)


class VAECF(Recommender, ANNMixin):
    """VAE over binarized user rows.

    Parameters mirror the reference: ``k`` latent dim,
    ``autoencoder_structure`` hidden sizes, ``act_fn``, ``likelihood``
    (mult/bern/gaus/pois), ``n_epochs``, ``batch_size``, ``learning_rate``,
    ``beta`` KL weight, ``seed``.
    """

    def __init__(
        self,
        name="VAECF",
        k=10,
        autoencoder_structure=None,
        act_fn="tanh",
        likelihood="mult",
        n_epochs=100,
        batch_size=100,
        learning_rate=0.001,
        beta=1.0,
        trainable=True,
        verbose=False,
        seed=None,
        use_gpu=False,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.k = k
        self.autoencoder_structure = (
            [20] if autoencoder_structure is None else autoencoder_structure
        )
        self.act_fn = act_fn
        self.likelihood = likelihood
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.beta = beta
        self.seed = seed
        self.use_gpu = use_gpu  # API parity; the device is whatever jax uses

        if self.likelihood not in LIKELIHOODS:
            raise ValueError("Supported likelihoods: {}".format(LIKELIHOODS))
        if self.act_fn not in ACTIVATIONS:
            raise ValueError("Supported act_fn: {}".format(list(ACTIVATIONS)))

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        self.r_mat = train_set.matrix

        data_dim = self.r_mat.shape[1]
        if not hasattr(self, "params"):
            self.params = _init_vae(
                rng, self.k, [data_dim] + self.autoencoder_structure
            )

        act = ACTIVATIONS[self.act_fn]
        likelihood = self.likelihood
        beta = self.beta

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(self.params)

        n_users = self.r_mat.shape[0]
        bsz = min(self.batch_size, n_users)
        n_pad = (-n_users) % bsz
        n_batches = (n_users + n_pad) // bsz
        # whole-matrix-on-device only under the HBM budget; above it the
        # binarized rows stream from the host CSR batch by batch (the
        # dense user matrix is 34 GB at Netflix shape — far beyond HBM)
        resident = (n_users + n_pad) * data_dim * 4 <= _RESIDENT_BYTES
        if resident:
            # binarized dense matrix, trailing rows padded to batch multiple
            X = (self.r_mat > 0).astype(np.float32).toarray()
            if n_pad:
                X = np.concatenate([X, np.zeros((n_pad, data_dim), np.float32)])
        else:
            # out-of-HBM: ship only the positive-entry coordinates. Each
            # batch densifies on device (scatter of ones into a zeros
            # block) so the tunnel carries int32 indices, not f32 zeros —
            # ~99% less transfer than streaming dense rows at Netflix shape
            csr = self.r_mat.tocsr()
            keep = csr.data > 0
            cols = csr.indices[keep].astype(np.int32)
            rows_g = np.repeat(
                np.arange(n_users, dtype=np.int32), np.diff(csr.indptr)
            )[keep]
            batch_counts = np.bincount(
                rows_g // bsz, minlength=n_batches
            ).astype(np.int32)
            starts = np.concatenate(
                ([0], np.cumsum(batch_counts[:-1]))
            ).astype(np.int32)
            cap = max(int(batch_counts.max(initial=0)), 1)
            # sentinel tail: the fixed-size window at the last batch never
            # reads past the arrays, and sentinel columns scatter-drop
            cols = np.concatenate([cols, np.full(cap, data_dim, np.int32)])
            rows_g = np.concatenate([rows_g, np.zeros(cap, np.int32)])
            index_resident = (
                self.mesh is None
                and 8 * cols.size <= _SPARSE_RESIDENT_BYTES
            )

            def densify(cols_d, rows_d, start, count, b):
                # fixed-cap window into the flat coordinate arrays; window
                # positions past `count` belong to the next batch, so mask
                # them to the out-of-range sentinel and let mode="drop"
                # discard them
                cw = jax.lax.dynamic_slice(cols_d, (start,), (cap,))
                rw = jax.lax.dynamic_slice(rows_d, (start,), (cap,))
                cw = jnp.where(jnp.arange(cap) < count, cw, data_dim)
                rw = rw - b * bsz
                return (
                    jnp.zeros((bsz, data_dim), jnp.float32)
                    .at[rw, cw]
                    .set(1.0, mode="drop")
                )

        def make_epoch_runner(fetch):
            """One jitted multi-epoch loop; ``fetch(b, *data)`` materializes
            batch b's dense block (slice of the resident matrix, or an
            on-device densify of the batch's coordinates). Data rides as
            jit ARGUMENTS — the tunnel's compile endpoint rejects large
            baked constants — and the key folding is shared by every mode,
            so the random stream is chunking/mode-invariant."""

            @partial(jax.jit, donate_argnums=(0, 1))
            def run(params, opt_state, key, n_epochs, epoch_offset, *data):
                def epoch(e, carry):
                    params, opt_state, _ = carry
                    # global epoch index: stream invariant to host chunking
                    ekey = jax.random.fold_in(key, epoch_offset + e)

                    def step(b, carry):
                        params, opt_state, loss_sum = carry
                        loss, grads = jax.value_and_grad(_vae_loss)(
                            params,
                            fetch(b, *data),
                            jax.random.fold_in(ekey, b),
                            act,
                            likelihood,
                            beta,
                        )
                        updates, opt_state = optimizer.update(
                            grads, opt_state, params
                        )
                        params = optax.apply_updates(params, updates)
                        return params, opt_state, loss_sum + loss

                    return jax.lax.fori_loop(
                        0, n_batches, step, (params, opt_state, jnp.float32(0.0))
                    )

                return jax.lax.fori_loop(
                    0, n_epochs, epoch, (params, opt_state, jnp.float32(0.0))
                )

            return run

        run_epochs = make_epoch_runner(
            lambda b, X_d: jax.lax.dynamic_slice(
                X_d, (b * bsz, 0), (bsz, X_d.shape[1])
            )
        )

        if not resident:
            run_epochs_sparse = make_epoch_runner(
                lambda b, cols_d, rows_d, starts_d, counts_d: densify(
                    cols_d, rows_d, starts_d[b], counts_d[b], b
                )
            )

            if index_resident:
                # one upload of the coordinate arrays; every epoch after
                # that runs as a single device program with zero transfer
                cols_d = jnp.asarray(cols)
                rows_d = jnp.asarray(rows_g)
                starts_d = jnp.asarray(starts)
                counts_d = jnp.asarray(batch_counts)
            else:
                # per-step index window (8*cap bytes vs bsz*n_items*4 dense)
                densify_win = jax.jit(
                    lambda cw, rw, b: jnp.zeros((bsz, data_dim), jnp.float32)
                    .at[rw - b * bsz, cw]
                    .set(1.0, mode="drop")
                )

        if resident:
            X_d = jnp.asarray(X)
        if self.mesh is not None:
            # data parallelism: user rows sharded over the data axis,
            # parameters replicated; GSPMD turns the per-batch gradient
            # reduction into a psum over the mesh (same math, same result)
            from ..parallel import replicate_all, shard_batch

            if resident:
                X_d = shard_batch(self.mesh, X_d)
            self.params, opt_state = replicate_all(self.mesh, self.params, opt_state)
        key = jax.random.PRNGKey(rng.randint(2**31))

        windows = []  # lazily built per-batch (cols, rows) index windows

        @partial(jax.jit, donate_argnums=(0, 1))
        def stream_step(params, opt_state, x, skey):
            loss, grads = jax.value_and_grad(_vae_loss)(
                params, x, skey, act, likelihood, beta
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def run_chunk(state, start, e):
            params, opt_state = state
            if resident:
                params, opt_state, loss_sum = run_epochs(
                    params, opt_state, key, e, start, X_d
                )
                return (params, opt_state), loss_sum
            if index_resident:
                # coordinates already on device: run the chunk's epochs as
                # one compiled program, same key folding as the dense one
                params, opt_state, loss_sum = run_epochs_sparse(
                    params, opt_state, key, e, start,
                    cols_d, rows_d, starts_d, counts_d,
                )
                return (params, opt_state), loss_sum
            # index streaming: transfer each batch's coordinate window and
            # densify on device; epoch/batch keys match the resident
            # program so chunking/resume is stream-invariant. Windows are
            # identical across epochs, so mask them once per fit.
            if not windows:
                for b in range(n_batches):
                    s, cnt = int(starts[b]), int(batch_counts[b])
                    cw = cols[s : s + cap].copy()
                    cw[cnt:] = data_dim  # next batch's spill: scatter-drop
                    windows.append((cw, rows_g[s : s + cap]))
            loss_sum = 0.0
            for ei in range(e):
                ekey = jax.random.fold_in(key, start + ei)
                epoch_sum = 0.0
                for b, (cw, rw) in enumerate(windows):
                    x = densify_win(jnp.asarray(cw), jnp.asarray(rw), b)
                    if self.mesh is not None:
                        from ..parallel import shard_batch

                        x = shard_batch(self.mesh, x)
                    params, opt_state, loss = stream_step(
                        params, opt_state, x, jax.random.fold_in(ekey, b)
                    )
                    epoch_sum = epoch_sum + loss
                # like the resident program, report the LAST epoch's sum
                loss_sum = epoch_sum
            return (params, opt_state), loss_sum

        def report(done, loss_sum):
            print(
                "Epoch %d/%d, loss: %.4f"
                % (done, self.n_epochs, float(loss_sum) / n_batches)
            )

        place = None
        if self.mesh is not None:
            from ..parallel import replicate_all

            place = lambda s: replicate_all(
                self.mesh, *jax.tree_util.tree_map(jnp.asarray, s)
            )

        self.params, opt_state = epoch_loop(
            self, self.n_epochs, run_chunk, (self.params, opt_state),
            on_report=report, place=place,
        )

        return self

    def _decode_users(self, x_rows):
        act = ACTIVATIONS[self.act_fn]
        mu, _ = _encode(self.params, jnp.asarray(x_rows), act)
        return np.asarray(_decode(self.params, mu, act, self.likelihood))

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        x_u = (self.r_mat[user_idx] > 0).astype(np.float32).toarray()
        scores = self._decode_users(x_u)[0]
        return scores if item_idx is None else scores[item_idx]

    def score_pairs(self, user_indices, item_indices):
        # pointwise score == row gather (no per-pair transform): batch it
        return self._score_pairs_from_rows(user_indices, item_indices)

    def _known_scores_device(self, safe_users, known):
        act = ACTIVATIONS[self.act_fn]
        rows = (self.r_mat[safe_users] > 0).astype(np.float32).toarray()
        mu, _ = _encode(self.params, jnp.asarray(rows), act)
        return _decode(self.params, mu, act, self.likelihood)

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        rows = (self.r_mat[np.where(known, users, 0)] > 0).astype(np.float32).toarray()
        scores = self._decode_users(rows).astype(np.float64)
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
        act = ACTIVATIONS[self.act_fn]
        X = (self.r_mat > 0).astype(np.float32).toarray()
        mu, _ = _encode(self.params, jnp.asarray(X), act)
        return np.asarray(mu)

    def get_item_vectors(self):
        # decoder's final layer weight columns act as item embeddings
        return np.asarray(self.params["decoder"][-1]["w"]).T
