"""CDL — Collaborative Deep Learning (Wang, Wang & Yeung, KDD 2015).

Capability parity with reference ``cornac/models/cdl/recom_cdl.py:26`` +
``cdl/cdl.py`` (TF1 graph: stacked denoising autoencoder over item
bag-of-words coupled with confidence-weighted MF; two optimizers alternate
on (U, V) and SDAE weights). Pure-JAX pytrees + optax, jitted per-batch
steps over item columns.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import ACTIVATIONS, dense, init_mlp
from ..exception import ScoreException
from ..utils import get_rng
from ..utils.init_utils import xavier_uniform
from .recommender import ANNMixin, MEASURE_DOT, Recommender


class CDL(Recommender, ANNMixin):
    """SDAE-regularized weighted MF over item text."""

    def __init__(
        self,
        name="CDL",
        k=50,
        autoencoder_structure=None,
        act_fn="relu",
        lambda_u=0.1,
        lambda_v=10,
        lambda_w=0.1,
        lambda_n=1000,
        a=1,
        b=0.01,
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
        self.mesh = mesh
        self.k = k
        self.autoencoder_structure = (
            [200] if autoencoder_structure is None else list(autoencoder_structure)
        )
        self.act_fn = act_fn
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.lambda_w = lambda_w
        self.lambda_n = lambda_n
        self.a = a
        self.b = b
        self.corruption_rate = corruption_rate
        self.learning_rate = learning_rate
        self.vocab_size = vocab_size
        self.dropout_rate = dropout_rate
        self.batch_size = batch_size
        self.max_iter = max_iter
        self.seed = seed
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
        self.vocab_size = vocab

        enc_sizes = [vocab] + self.autoencoder_structure + [self.k]
        dec_sizes = [self.k] + self.autoencoder_structure[::-1] + [vocab]
        sdae = {
            "enc": init_mlp(rng, enc_sizes),
            "dec": init_mlp(rng, dec_sizes),
        }
        act = ACTIVATIONS[self.act_fn]

        def encode(sdae, x):
            h = x
            for layer in sdae["enc"]:
                h = act(dense(layer, h))
            return h

        def decode(sdae, z):
            h = z
            for i, layer in enumerate(sdae["dec"]):
                h = dense(layer, h)
                if i < len(sdae["dec"]) - 1:
                    h = act(h)
            return h

        R_csc = train_set.csc_matrix
        R_dense = np.asarray(R_csc.todense(), dtype=np.float32)  # (n_users, n_items)
        C_dense = np.where(R_dense != 0, self.a, self.b).astype(np.float32)

        params = {
            "U": jnp.asarray(self.U),
            "V": jnp.asarray(self.V),
            "sdae": sdae,
        }
        opt_cf = optax.adam(self.learning_rate)
        opt_ae = optax.adam(self.learning_rate)
        state_cf = opt_cf.init({"U": params["U"], "V": params["V"]})
        state_ae = opt_ae.init(params["sdae"])

        lam_u, lam_v, lam_w, lam_n = (
            self.lambda_u,
            self.lambda_v,
            self.lambda_w,
            self.lambda_n,
        )

        def loss_fn(params, item_ids, x_corrupt, x_clean, R_cols, C_cols):
            U, V = params["U"], params["V"]
            Vb = V[item_ids]
            z = encode(params["sdae"], x_corrupt)
            recon = decode(params["sdae"], z)
            pred = U @ Vb.T  # (n_users, B)
            cf = 0.5 * jnp.sum(C_cols * (R_cols - pred) ** 2)
            loss = (
                cf
                + 0.5 * lam_u * jnp.sum(U**2)
                + 0.5 * lam_v * jnp.sum((Vb - z) ** 2)
                + 0.5 * lam_n * jnp.sum((recon - x_clean) ** 2)
                + 0.5
                * lam_w
                * sum(
                    jnp.sum(layer["w"] ** 2)
                    for part in params["sdae"].values()
                    for layer in part
                )
            )
            return loss

        # whole epochs run on device: the r4 TF head-to-head showed the
        # old per-batch host slicing (text[batch_ids], R_dense[:, ids] ->
        # transfer per step) dominated the fit; now the text/rating/
        # confidence tensors live on device once and the batch loop is a
        # fori_loop with device-side gathers and device-side corruption
        # draws (bernoulli keyed on the global epoch index)
        text_d = jnp.asarray(text)
        R_d = jnp.asarray(R_dense)
        C_d = jnp.asarray(C_dense)

        # data parallelism over the item batch: params/opt replicated,
        # each step's item block (and the (n_users, B) rating columns on
        # their batch axis) sharded over the mesh; GSPMD psums the grads
        vec_s = mat_s = col_s = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            axes = tuple(self.mesh.axis_names)
            vec_s = NamedSharding(self.mesh, P(axes))
            mat_s = NamedSharding(self.mesh, P(axes, None))
            col_s = NamedSharding(self.mesh, P(None, axes))
            params, state_cf, state_ae, text_d, R_d, C_d = replicate_all(
                self.mesh, params, state_cf, state_ae, text_d, R_d, C_d
            )

        bsz = min(self.batch_size, self.num_items)
        if self.mesh is not None:
            # batch width must divide across the mesh
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_items = self.num_items
        n_total = n_items + ((-n_items) % bsz)
        n_batches = n_total // bsz
        keep_p = 1.0 - self.corruption_rate

        @jax.jit
        def run_epoch(params, state_cf, state_ae, key):
            perm = jax.random.permutation(key, n_total) % n_items

            def body(b, carry):
                params, state_cf, state_ae, loss_sum = carry
                ids = jax.lax.dynamic_slice(perm, (b * bsz,), (bsz,))
                if vec_s is not None:
                    ids = jax.lax.with_sharding_constraint(ids, vec_s)
                x_clean = text_d[ids]
                mask_b = jax.random.bernoulli(
                    jax.random.fold_in(key, b), keep_p, x_clean.shape
                ).astype(x_clean.dtype)
                x_corrupt = x_clean * mask_b
                R_cols = R_d[:, ids].astype(jnp.float32)
                C_cols = C_d[:, ids].astype(jnp.float32)
                if vec_s is not None:
                    x_clean, x_corrupt = (
                        jax.lax.with_sharding_constraint(x, mat_s)
                        for x in (x_clean, x_corrupt)
                    )
                    R_cols, C_cols = (
                        jax.lax.with_sharding_constraint(x, col_s)
                        for x in (R_cols, C_cols)
                    )

                # phase 1: update U, V
                def cf_loss(uv):
                    p = {"U": uv["U"], "V": uv["V"], "sdae": params["sdae"]}
                    return loss_fn(p, ids, x_corrupt, x_clean, R_cols, C_cols)

                uv = {"U": params["U"], "V": params["V"]}
                g = jax.grad(cf_loss)(uv)
                updates, new_cf = opt_cf.update(g, state_cf, uv)
                uv = optax.apply_updates(uv, updates)
                params_1 = {"U": uv["U"], "V": uv["V"], "sdae": params["sdae"]}

                # phase 2: update SDAE
                def ae_loss(sd):
                    p = {"U": params_1["U"], "V": params_1["V"], "sdae": sd}
                    return loss_fn(p, ids, x_corrupt, x_clean, R_cols, C_cols)

                loss, g = jax.value_and_grad(ae_loss)(params_1["sdae"])
                updates, new_ae = opt_ae.update(g, state_ae, params_1["sdae"])
                params_2 = {
                    "U": params_1["U"],
                    "V": params_1["V"],
                    "sdae": optax.apply_updates(params_1["sdae"], updates),
                }
                return params_2, new_cf, new_ae, loss_sum + loss

            return jax.lax.fori_loop(
                0, n_batches, body,
                (params, state_cf, state_ae, jnp.float32(0.0)),
            )

        key = jax.random.PRNGKey(rng.randint(2**31))
        for it in range(self.max_iter):
            params, state_cf, state_ae, loss_sum = run_epoch(
                params, state_cf, state_ae, jax.random.fold_in(key, it)
            )
            if self.verbose:
                print(
                    "Iter %d/%d, loss: %.2f"
                    % (it + 1, self.max_iter, float(loss_sum) / n_total)
                )

        self.U = np.asarray(params["U"], dtype=np.float64)
        self.V = np.asarray(params["V"], dtype=np.float64)
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
        scores = self.U[np.where(known, users, 0)] @ self.V.T
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
