"""CVAE — Collaborative Variational Autoencoder (Li & She, KDD 2017), and
CDR — Collaborative Deep Ranking (Ying et al., PAKDD 2016).

Capability parity with reference ``cornac/models/cvae/recom_cvae.py:25`` and
``cornac/models/cdr/recom_cdr.py:26`` (both TF1). TPU redesign:

- CVAE: item-content VAE whose latent mean regularizes item factors;
  alternates device ALS for (U, V) with jitted Adam steps on the VAE (gen
  loss rmse/cross-entropy + KL + lambda_v/lambda_r coupling to V).
- CDR: CDL's SDAE coupling with a pairwise ranking loss
  l2(1 - (u.v_i - u.v_j)) over sampled (i, j) pairs instead of pointwise
  confidence-weighted regression.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import ACTIVATIONS, dense, init_dense, init_mlp
from ..exception import ScoreException
from ..ops.membership import build_membership
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.init_utils import xavier_uniform
from .recommender import ANNMixin, MEASURE_DOT, Recommender


@jax.jit
def _cvae_als_u(V, pad_idx, pad_val, pad_mask, a, b, lambda_u):
    G = V.T @ V
    Vs = V[pad_idx] * pad_mask[:, :, None]
    A = b * G[None] + (a - b) * jnp.einsum("blk,blm->bkm", Vs, Vs)
    A = A + lambda_u * jnp.eye(V.shape[1])[None]
    rhs = a * jnp.einsum("blk,bl->bk", Vs, pad_val * pad_mask)
    return jnp.linalg.solve(A, rhs[..., None]).squeeze(-1)


@jax.jit
def _cvae_als_v(U, z, pad_idx, pad_val, pad_mask, a, b, lambda_v):
    G = U.T @ U
    Us = U[pad_idx] * pad_mask[:, :, None]
    A = b * G[None] + (a - b) * jnp.einsum("blk,blm->bkm", Us, Us)
    A = A + lambda_v * jnp.eye(U.shape[1])[None]
    rhs = a * jnp.einsum("blk,bl->bk", Us, pad_val * pad_mask) + lambda_v * z
    return jnp.linalg.solve(A, rhs[..., None]).squeeze(-1)


def _padded(mat, pad_len):
    n = mat.shape[0]
    idx = np.zeros((n, pad_len), np.int32)
    val = np.zeros((n, pad_len), np.float32)
    mask = np.zeros((n, pad_len), np.float32)
    for r in range(n):
        s, e = mat.indptr[r], mat.indptr[r + 1]
        L = e - s
        idx[r, :L] = mat.indices[s:e]
        val[r, :L] = mat.data[s:e]
        mask[r, :L] = 1.0
    return jnp.asarray(idx), jnp.asarray(val), jnp.asarray(mask)


class CVAE(Recommender, ANNMixin):
    """Item-content VAE coupled with confidence-weighted MF."""

    def __init__(
        self,
        name="CVAE",
        z_dim=50,
        n_epochs=100,
        lambda_u=1e-4,
        lambda_v=0.001,
        lambda_r=10,
        lambda_w=1e-4,
        lr=0.001,
        a=1,
        b=0.01,
        input_dim=8000,
        vae_layers=(200, 100),
        act_fn="sigmoid",
        loss_type="cross-entropy",
        batch_size=128,
        init_params=None,
        trainable=True,
        seed=None,
        verbose=True,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.z_dim = z_dim
        self.n_epochs = n_epochs
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.lambda_r = lambda_r
        self.lambda_w = lambda_w
        self.lr = lr
        self.a = a
        self.b = b
        self.input_dim = input_dim
        self.vae_layers = list(vae_layers)
        self.act_fn = act_fn
        self.loss_type = loss_type
        self.batch_size = batch_size
        self.mesh = mesh
        self.seed = seed

        if loss_type not in ("rmse", "cross-entropy"):
            raise ValueError("Invalid loss type {}".format(loss_type))

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.V = self.init_params.get("V", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.item_text is None:
            raise ValueError("this model needs the item_text modality attached to the eval method")
        rng = get_rng(self.seed)
        if self.U is None:
            self.U = xavier_uniform((self.num_users, self.z_dim), rng).astype(
                np.float32
            )
        if self.V is None:
            self.V = xavier_uniform((self.num_items, self.z_dim), rng).astype(
                np.float32
            )
        if not self.trainable:
            return self

        text = train_set.item_text.batch_bow(np.arange(self.num_items)).astype(
            np.float32
        )
        text = text / np.maximum(text.max(), 1e-12)
        vocab = text.shape[1]
        act = ACTIVATIONS[self.act_fn]

        vae = {
            "enc": init_mlp(rng, [vocab] + self.vae_layers),
            "mu": init_dense(rng, self.vae_layers[-1], self.z_dim),
            "logvar": init_dense(rng, self.vae_layers[-1], self.z_dim),
            "dec": init_mlp(rng, [self.z_dim] + self.vae_layers[::-1] + [vocab]),
        }
        optimizer = optax.adam(self.lr)
        opt_state = optimizer.init(vae)

        def encode(vae, x):
            h = x
            for layer in vae["enc"]:
                h = act(dense(layer, h))
            return dense(vae["mu"], h), dense(vae["logvar"], h)

        def decode(vae, z):
            h = z
            for i, layer in enumerate(vae["dec"]):
                h = dense(layer, h)
                if i < len(vae["dec"]) - 1:
                    h = act(h)
            return h

        loss_type, lam_v, lam_r, lam_w = (
            self.loss_type,
            self.lambda_v,
            self.lambda_r,
            self.lambda_w,
        )

        @jax.jit
        def vae_step(vae, opt_state, x, v_target, key):
            def loss_fn(vae):
                mu, logvar = encode(vae, x)
                std = jnp.exp(0.5 * logvar)
                z = mu + std * jax.random.normal(key, mu.shape)
                logits = decode(vae, z)
                if loss_type == "rmse":
                    gen = 0.5 * jnp.sum((jax.nn.sigmoid(logits) - x) ** 2)
                else:
                    gen = jnp.sum(
                        jnp.maximum(logits, 0)
                        - logits * x
                        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                    )
                latent = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
                couple = (
                    lam_v / lam_r * 0.5 * jnp.sum((v_target - mu) ** 2)
                )
                reg = lam_w * sum(
                    jnp.sum(layer["w"] ** 2)
                    for part in ("enc", "dec")
                    for layer in vae[part]
                )
                return gen + latent + couple + reg

            loss, grads = jax.value_and_grad(loss_fn)(vae)
            updates, opt_state = optimizer.update(grads, opt_state, vae)
            return optax.apply_updates(vae, updates), opt_state, loss

        csr = train_set.matrix
        csc = csr.T.tocsr()
        u_pad = _padded(csr, max(1, int(np.diff(csr.indptr).max(initial=1))))
        i_pad = _padded(csc, max(1, int(np.diff(csc.indptr).max(initial=1))))
        a_, b_ = jnp.float32(self.a), jnp.float32(self.b)
        text_d = jnp.asarray(text)

        # mesh: the per-entity ALS solves shard over the data axis (rows
        # are independent kxk solves; zero-mask padding rows solve to 0
        # and are sliced off), the VAE phase runs data-parallel over item
        # batches with params/opt replicated
        shard_als = lambda t: t
        shard_b = lambda t: t
        dsz = 1
        if self.mesh is not None:
            from ..parallel import replicate_all, shard_batch
            from ..parallel.mesh import DATA_AXIS, pad_rows_to_multiple

            dsz = self.mesh.shape[DATA_AXIS]
            shard_als = lambda t: shard_batch(
                self.mesh, pad_rows_to_multiple(np.asarray(t), dsz)
            )
            shard_b = lambda t: shard_batch(self.mesh, t)
            u_pad = tuple(shard_als(t) for t in u_pad)
            i_pad = tuple(shard_als(t) for t in i_pad)
            vae, opt_state, text_d = replicate_all(
                self.mesh, vae, opt_state, text_d
            )

        key = jax.random.PRNGKey(rng.randint(2**31))
        bsz = min(self.batch_size, self.num_items)
        if self.mesh is not None:
            bsz = max(dsz, bsz - bsz % dsz)
        for epoch in range(self.n_epochs):
            z_mu, _ = encode(vae, text_d)
            if self.mesh is not None:
                z_mu = shard_als(z_mu)
            self.U = np.asarray(
                _cvae_als_u(
                    jnp.asarray(self.V), *u_pad, a_, b_, jnp.float32(self.lambda_u)
                )
            )[: self.num_users]
            self.V = np.asarray(
                _cvae_als_v(
                    jnp.asarray(self.U),
                    z_mu,
                    *i_pad,
                    a_,
                    b_,
                    jnp.float32(self.lambda_v),
                )
            )[: self.num_items]
            order = rng.permutation(self.num_items)
            for s in range(0, self.num_items, bsz):
                ids = order[s : s + bsz]
                if len(ids) < bsz:  # stable jit shapes: tile ids to bsz
                    ids = np.resize(ids, bsz)
                vae, opt_state, _ = vae_step(
                    vae,
                    opt_state,
                    shard_b(jnp.asarray(text[ids])),
                    shard_b(jnp.asarray(self.V[ids], dtype=jnp.float32)),
                    jax.random.fold_in(key, epoch * 10000 + s),
                )
            if self.verbose:
                print("Epoch %d/%d done" % (epoch + 1, self.n_epochs))

        self.vae = vae
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return self.V @ self.U[user_idx]
        return self.V[item_idx] @ self.U[user_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = (self.U[np.where(known, users, 0)] @ self.V.T).astype(np.float64)
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
        return self.U

    def get_item_vectors(self):
        return self.V


class CDR(Recommender, ANNMixin):
    """SDAE + pairwise ranking (CDL's ranking sibling)."""

    def __init__(
        self,
        name="CDR",
        k=50,
        autoencoder_structure=None,
        act_fn="relu",
        lambda_u=0.01,
        lambda_v=0.1,
        lambda_w=0.0001,
        lambda_n=5,
        corruption_rate=0.3,
        learning_rate=0.001,
        vocab_size=8000,
        dropout_rate=0.1,
        batch_size=128,
        max_iter=100,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.autoencoder_structure = (
            [200] if autoencoder_structure is None else list(autoencoder_structure)
        )
        self.act_fn = act_fn
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.lambda_w = lambda_w
        self.lambda_n = lambda_n
        self.corruption_rate = corruption_rate
        self.learning_rate = learning_rate
        self.vocab_size = vocab_size
        self.dropout_rate = dropout_rate
        self.batch_size = batch_size
        self.max_iter = max_iter
        self.seed = seed
        self.mesh = mesh
        self.rng = get_rng(seed)

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.V = self.init_params.get("V", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.item_text is None:
            raise ValueError("this model needs the item_text modality attached to the eval method")
        rng = self.rng
        if self.U is None:
            self.U = xavier_uniform((self.num_users, self.k), rng).astype(np.float32)
        if self.V is None:
            self.V = xavier_uniform((self.num_items, self.k), rng).astype(np.float32)
        if not self.trainable:
            return self

        text = train_set.item_text.batch_bow(np.arange(self.num_items)).astype(
            np.float32
        )
        text = (text - text.min()) / max(text.max() - text.min(), 1e-12)
        vocab = text.shape[1]
        act = ACTIVATIONS[self.act_fn]

        enc_sizes = [vocab] + self.autoencoder_structure + [self.k]
        dec_sizes = [self.k] + self.autoencoder_structure[::-1] + [vocab]
        params = {
            "U": jnp.asarray(self.U),
            "V": jnp.asarray(self.V),
            "enc": init_mlp(rng, enc_sizes),
            "dec": init_mlp(rng, dec_sizes),
        }

        def encode(p, x):
            h = x
            for layer in p["enc"]:
                h = act(dense(layer, h))
            return h

        def decode(p, z):
            h = z
            for i, layer in enumerate(p["dec"]):
                h = dense(layer, h)
                if i < len(p["dec"]) - 1:
                    h = act(h)
            return h

        rid, cid, _ = train_set.uir_tuple
        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        membership = build_membership(train_set.csr_matrix)
        n = len(rid)
        bsz = min(self.batch_size, n)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_batches = (n + bsz - 1) // bsz
        num_items = train_set.num_items
        lam_u, lam_v, lam_w, lam_n = (
            self.lambda_u,
            self.lambda_v,
            self.lambda_w,
            self.lambda_n,
        )
        text_d = jnp.asarray(text)
        corruption_rate = self.corruption_rate

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(params)

        # data-parallel over the mesh: params/opt/text replicated, each
        # step's triplet minibatch sharded; GSPMD psums the gradients
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            params, opt_state, text_d, rid_d, cid_d, membership = (
                replicate_all(
                    self.mesh, params, opt_state, text_d, rid_d, cid_d,
                    membership,
                )
            )

        def loss_fn(p, u, i, j, m, key):
            mask = jax.random.bernoulli(
                key, 1.0 - corruption_rate, (i.shape[0], text_d.shape[1])
            )
            xi = text_d[i] * mask
            z = encode(p, xi)
            recon = decode(p, z)
            pu, vi, vj = p["U"][u], p["V"][i], p["V"][j]
            score_diff = jnp.sum(pu * (vi - vj), axis=1)
            rank_loss = 0.5 * jnp.sum(((1.0 - score_diff) ** 2) * m)
            loss = (
                rank_loss
                + 0.5 * lam_u * jnp.sum(pu**2)
                + 0.5 * lam_v * jnp.sum((vi - z) ** 2)
                + 0.5 * lam_n * jnp.sum((recon - text_d[i]) ** 2)
                + 0.5
                * lam_w
                * sum(
                    jnp.sum(layer["w"] ** 2)
                    for part in ("enc", "dec")
                    for layer in p[part]
                )
            )
            return loss

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs, epoch_offset):
            def epoch(e, carry):
                params, opt_state, _ = carry
                # global epoch index: stream invariant to host chunking
                ekey = jax.random.fold_in(key, epoch_offset + e)
                k_pos, k_neg = jax.random.split(ekey)
                pos_idx = jax.random.randint(k_pos, (n_batches * bsz,), 0, n)
                negs = jax.random.randint(k_neg, (n_batches * bsz,), 0, num_items)
                users = rid_d[pos_idx]
                pos = cid_d[pos_idx]
                valid = ~membership.query(users, negs)

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    sl = lambda a: jax.lax.dynamic_slice(a, (b * bsz,), (bsz,))
                    u, i, j = sl(users), sl(pos), sl(negs)
                    m = sl(valid).astype(jnp.float32)
                    if batch_shard is not None:
                        u, i, j, m = (
                            jax.lax.with_sharding_constraint(x, batch_shard)
                            for x in (u, i, j, m)
                        )
                    loss, grads = jax.value_and_grad(loss_fn)(
                        params, u, i, j, m, jax.random.fold_in(ekey, b)
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

        def run_chunk(state, start, e):
            params, opt_state, loss_sum = run_epochs(state[0], state[1], key, e, start)
            return (params, opt_state), loss_sum

        params, opt_state = epoch_loop(
            self, self.max_iter, run_chunk, (params, opt_state),
            on_report=lambda done, loss: print(
                "Iter %d/%d, loss: %.2f"
                % (done, self.max_iter, float(loss) / n_batches)
            ),
        )

        self.U = np.asarray(params["U"], dtype=np.float64)
        self.V = np.asarray(params["V"], dtype=np.float64)
        return self

    score = CVAE.score
    score_batch = CVAE.score_batch
    get_vector_measure = CVAE.get_vector_measure
    get_user_vectors = CVAE.get_user_vectors
    get_item_vectors = CVAE.get_item_vectors
