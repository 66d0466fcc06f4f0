"""VBPR — Visual BPR (He & McAuley, AAAI 2016), plus AMR (adversarial).

Capability parity with reference ``cornac/models/vbpr/recom_vbpr.py:27`` and
``cornac/models/amr/recom_amr.py:27`` (both torch). TPU design: parameters
as a pytree (item bias, latent factors, visual projection E, visual bias
projection), BPR loss over sampled triplets with optax Adam, the full fit as
one compiled multi-epoch program. AMR adds FGSM-style adversarial noise on
the item visual features during training (epsilon-scaled gradient sign).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exception import CornacException, ScoreException
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.init_utils import xavier_uniform, zeros
from .recommender import ANNMixin, MEASURE_DOT, Recommender


class VBPR(Recommender, ANNMixin):
    """BPR over latent + projected-visual item representations."""

    def __init__(
        self,
        name="VBPR",
        k=10,
        k2=10,
        n_epochs=50,
        batch_size=100,
        learning_rate=0.005,
        lambda_w=0.01,
        lambda_b=0.01,
        lambda_e=0.0,
        use_gpu=False,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.k = k
        self.k2 = k2
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.lambda_w = lambda_w
        self.lambda_b = lambda_b
        self.lambda_e = lambda_e
        self.use_gpu = use_gpu  # API parity
        self.seed = seed

        self.init_params = {} if init_params is None else init_params
        self.beta_item = self.init_params.get("Bi", None)
        self.gamma_user = self.init_params.get("Gu", None)
        self.gamma_item = self.init_params.get("Gi", None)
        self.theta_user = self.init_params.get("Tu", None)
        self.emb_matrix = self.init_params.get("E", None)
        self.beta_prime = self.init_params.get("Bp", None)

    def _init(self, n_users, n_items, features):
        rng = get_rng(self.seed)
        if self.beta_item is None:
            self.beta_item = zeros(n_items)
        if self.gamma_user is None:
            self.gamma_user = xavier_uniform((n_users, self.k), rng)
        if self.gamma_item is None:
            self.gamma_item = xavier_uniform((n_items, self.k), rng)
        if self.theta_user is None:
            self.theta_user = xavier_uniform((n_users, self.k2), rng)
        if self.emb_matrix is None:
            self.emb_matrix = xavier_uniform((features.shape[1], self.k2), rng)
        if self.beta_prime is None:
            self.beta_prime = xavier_uniform((features.shape[1], 1), rng)

    # hook for AMR's adversarial feature perturbation
    _adversarial = False
    _adv_lambda = 0.0
    _adv_epsilon = 0.0

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        if train_set.item_image is None:
            raise CornacException("this model needs the item_image modality attached to the eval method")

        features = np.asarray(
            train_set.item_image.features[: self.total_items], dtype=np.float32
        )
        self._init(self.total_users, self.total_items, features)

        if not self.trainable:
            self._finalize(features)
            return self

        rng = get_rng(self.seed)
        params = {
            "Bi": jnp.asarray(self.beta_item, dtype=jnp.float32),
            "Gu": jnp.asarray(self.gamma_user, dtype=jnp.float32),
            "Gi": jnp.asarray(self.gamma_item, dtype=jnp.float32),
            "Tu": jnp.asarray(self.theta_user, dtype=jnp.float32),
            "E": jnp.asarray(self.emb_matrix, dtype=jnp.float32),
            "Bp": jnp.asarray(self.beta_prime, dtype=jnp.float32),
        }
        F = jnp.asarray(features)

        rid, cid, _ = train_set.uir_tuple
        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        n = len(rid)
        bsz = min(self.batch_size, n)
        n_batches = (n + bsz - 1) // bsz
        num_items = train_set.num_items
        lw, lb, le = self.lambda_w, self.lambda_b, self.lambda_e
        adversarial = self._adversarial
        adv_lambda, adv_eps = self._adv_lambda, self._adv_epsilon

        def pair_score(params, u, items, feat):
            theta_item = feat @ params["E"]
            visual_bias = (feat @ params["Bp"]).ravel()
            return (
                params["Bi"][items]
                + visual_bias
                + jnp.sum(params["Gu"][u] * params["Gi"][items], axis=1)
                + jnp.sum(params["Tu"][u] * theta_item, axis=1)
            )

        def bpr_core(params, u, i, j, Fi, Fj):
            x = pair_score(params, u, i, Fi) - pair_score(params, u, j, Fj)
            return jnp.mean(jax.nn.softplus(-x))

        def loss_fn(params, u, i, j):
            Fi, Fj = F[i], F[j]
            loss = bpr_core(params, u, i, j, Fi, Fj)
            if adversarial:
                # FGSM perturbation on visual features (AMR, TKDE 2020)
                gFi, gFj = jax.grad(bpr_core, argnums=(4, 5))(
                    params, u, i, j, Fi, Fj
                )
                loss = loss + adv_lambda * bpr_core(
                    params,
                    u,
                    i,
                    j,
                    Fi + adv_eps * jnp.sign(gFi),
                    Fj + adv_eps * jnp.sign(gFj),
                )
            reg = (
                lw
                * (
                    jnp.sum(params["Gu"][u] ** 2)
                    + jnp.sum(params["Gi"][i] ** 2)
                    + jnp.sum(params["Gi"][j] ** 2)
                    + jnp.sum(params["Tu"][u] ** 2)
                )
                + lb * jnp.sum(params["Bi"][i] ** 2)
                + lb * jnp.sum(params["Bi"][j] ** 2)
                + le * (jnp.sum(params["E"] ** 2) + jnp.sum(params["Bp"] ** 2))
            )
            return loss + reg / u.shape[0]

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(params)

        # data parallelism: params/opt/features replicated, each
        # minibatch's sampled triplets sharded over every device (GSPMD
        # psums the grads) — identical math to single-device
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            params, opt_state, F, rid_d, cid_d = replicate_all(
                self.mesh, params, opt_state, F, rid_d, cid_d
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs, epoch_offset):
            def epoch(e, carry):
                params, opt_state, _ = carry
                # global epoch index: stream invariant to host chunking
                ekey = jax.random.fold_in(key, epoch_offset + e)
                k_pos, k_neg = jax.random.split(ekey)
                pos_idx = jax.random.randint(k_pos, (n_batches * bsz,), 0, n)
                negs = jax.random.randint(k_neg, (n_batches * bsz,), 0, num_items)

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    sl = lambda a: jax.lax.dynamic_slice(a, (b * bsz,), (bsz,))
                    idx = sl(pos_idx)
                    j = sl(negs)
                    if batch_shard is not None:
                        idx = jax.lax.with_sharding_constraint(idx, batch_shard)
                        j = jax.lax.with_sharding_constraint(j, batch_shard)
                    u, i = rid_d[idx], cid_d[idx]
                    loss, grads = jax.value_and_grad(loss_fn)(params, u, i, j)
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
            self, self.n_epochs, run_chunk, (params, opt_state),
            on_report=lambda done, loss: print(
                "Epoch %d/%d, loss: %.4f"
                % (done, self.n_epochs, float(loss) / n_batches)
            ),
        )

        self.beta_item = np.asarray(params["Bi"])
        self.gamma_user = np.asarray(params["Gu"])
        self.gamma_item = np.asarray(params["Gi"])
        self.theta_user = np.asarray(params["Tu"])
        self.emb_matrix = np.asarray(params["E"])
        self.beta_prime = np.asarray(params["Bp"])
        self._finalize(features)
        return self

    def _finalize(self, features):
        """Precompute projected visual representations for fast scoring."""
        self.theta_item = features @ self.emb_matrix
        self.visual_bias = (features @ self.beta_prime).ravel()

    def score(self, user_idx, item_idx=None):
        if item_idx is None:
            return (
                self.beta_item
                + self.visual_bias
                + self.gamma_item @ self.gamma_user[user_idx]
                + self.theta_item @ self.theta_user[user_idx]
            )
        return (
            self.beta_item[item_idx]
            + self.visual_bias[item_idx]
            + self.gamma_item[item_idx] @ self.gamma_user[user_idx]
            + self.theta_item[item_idx] @ self.theta_user[user_idx]
        )

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        base = self.beta_item + self.visual_bias
        scores = (
            base[None, :]
            + self.gamma_user[users] @ self.gamma_item.T
            + self.theta_user[users] @ self.theta_item.T
        )
        return scores.astype(np.float64)

    def score_pairs(self, user_indices, item_indices):
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        return (
            self.beta_item[items]
            + self.visual_bias[items]
            + np.sum(self.gamma_user[users] * self.gamma_item[items], axis=1)
            + np.sum(self.theta_user[users] * self.theta_item[items], axis=1)
        )

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return np.concatenate(
            (
                self.gamma_user,
                self.theta_user,
                np.ones([self.gamma_user.shape[0], 1]),
            ),
            axis=1,
        )

    def get_item_vectors(self):
        return np.concatenate(
            (
                self.gamma_item,
                self.theta_item,
                (self.beta_item + self.visual_bias).reshape((-1, 1)),
            ),
            axis=1,
        )


class AMR(VBPR):
    """Adversarial Multimedia Recommendation (Tang et al., TKDE 2020):
    VBPR hardened with FGSM perturbations of the visual features
    (reference ``cornac/models/amr/recom_amr.py:27``)."""

    _adversarial = True

    def __init__(
        self,
        name="AMR",
        k=10,
        k2=10,
        n_epochs=50,
        batch_size=100,
        learning_rate=0.005,
        lambda_w=0.01,
        lambda_b=0.01,
        lambda_e=0.0,
        lambda_adv=1.0,
        epsilon_adv=0.05,
        use_gpu=False,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name,
            k=k,
            k2=k2,
            n_epochs=n_epochs,
            batch_size=batch_size,
            learning_rate=learning_rate,
            lambda_w=lambda_w,
            lambda_b=lambda_b,
            lambda_e=lambda_e,
            use_gpu=use_gpu,
            trainable=trainable,
            verbose=verbose,
            init_params=init_params,
            seed=seed,
            mesh=mesh,
        )
        self.lambda_adv = lambda_adv
        self.epsilon_adv = epsilon_adv
        self._adv_lambda = lambda_adv
        self._adv_epsilon = epsilon_adv
