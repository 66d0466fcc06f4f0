"""CausalRec (Qiu et al., MM 2021) — causally-debiased visual recommendation.

Capability parity with reference
``cornac/models/causalrec/recom_causalrec.py:29`` (torch Adam over BPR-style
triplets with the multimodal causal graph: item branch m, visual branch n,
fused sigmoid scores, and counterfactual debiasing at inference). Supports
tanh = 0/1/2 visual transformations. Fused multi-epoch JAX training.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exception import CornacException, ScoreException
from ..ops.membership import build_membership
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.init_utils import xavier_uniform, zeros
from .recommender import Recommender


class CausalRec(Recommender):
    """Visual BPR with counterfactual removal of the visual bias."""

    def __init__(
        self,
        name="CausalRec",
        k=10,
        k2=10,
        n_epochs=50,
        batch_size=100,
        learning_rate=0.005,
        lambda_w=0.01,
        lambda_b=0.01,
        lambda_e=0.0,
        mean_feat=None,
        tanh=0,
        lambda_2=0.8,
        use_gpu=False,
        trainable=True,
        verbose=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.k2 = k2
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.lambda_w = lambda_w
        self.lambda_b = lambda_b
        self.lambda_e = lambda_e
        self.mean_feat_init = mean_feat
        self.tanh = tanh
        self.lambda_2 = lambda_2
        self.use_gpu = use_gpu  # API parity
        self.seed = seed
        self.mesh = mesh
        self.init_params = {} if init_params is None else init_params

    def _visual(self, params, feat, which):
        E = params[which]
        h = feat @ E
        if self.tanh == 0:
            return h
        h = jnp.tanh(h)
        if self.tanh == 1:
            return h
        return jnp.tanh(h @ params[which + "2"])

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.item_image is None:
            raise CornacException("this model needs the item_image modality attached to the eval method")

        rng = get_rng(self.seed)
        F = np.asarray(
            train_set.item_image.features[: self.total_items], dtype=np.float32
        )
        f_dim = F.shape[1]
        mean_feat = (
            np.asarray(self.mean_feat_init, dtype=np.float32)
            if self.mean_feat_init is not None
            else F.mean(axis=0)
        ).reshape(1, -1)

        gp = self.init_params.get
        params = {
            "Bi": jnp.asarray(gp("Bi", zeros(self.total_items)), dtype=jnp.float32),
            "Gu": jnp.asarray(
                gp("Gu", xavier_uniform((self.total_users, self.k), rng)),
                dtype=jnp.float32,
            ),
            "Gi": jnp.asarray(
                gp("Gi", xavier_uniform((self.total_items, self.k), rng)),
                dtype=jnp.float32,
            ),
            "Tu": jnp.asarray(
                gp("Tu", xavier_uniform((self.total_users, self.k2), rng)),
                dtype=jnp.float32,
            ),
            "E": jnp.asarray(
                gp("E", xavier_uniform((f_dim, self.k2), rng)), dtype=jnp.float32
            ),
            "E_ind": jnp.asarray(
                gp("E_ind", xavier_uniform((f_dim, self.k), rng)), dtype=jnp.float32
            ),
            "Bp": jnp.asarray(
                gp("Bp", xavier_uniform((f_dim, 1), rng)), dtype=jnp.float32
            ),
        }
        if self.tanh == 2:
            params["E2"] = jnp.asarray(
                gp("E2", xavier_uniform((self.k2, self.k2), rng)), dtype=jnp.float32
            )
            params["E_ind2"] = jnp.asarray(
                gp("E_ind2", xavier_uniform((self.k, self.k), rng)),
                dtype=jnp.float32,
            )

        if not self.trainable:
            self._store(params, F, mean_feat)
            return self

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
        F_d = jnp.asarray(F)
        lw, lb, le = self.lambda_w, self.lambda_b, self.lambda_e

        def branch_scores(p, u, items):
            feat = F_d[items]
            direct = self._visual(p, feat, "E")
            ind = self._visual(p, feat, "E_ind")
            gamma_u, gamma_i = p["Gu"][u], p["Gi"][items]
            m = (
                p["Bi"][items]
                + jnp.sum(gamma_u * gamma_i, axis=1)
                + jnp.sum(gamma_u * (gamma_i * ind), axis=1)
            )
            nb = jnp.sum(p["Tu"][u] * direct, axis=1) + (feat @ p["Bp"]).ravel()
            return m, nb

        def loss_fn(p, u, i, j, mvalid):
            i_m, i_n = branch_scores(p, u, i)
            j_m, j_n = branch_scores(p, u, j)
            i_score = (
                jax.nn.sigmoid(i_m + i_n) * jax.nn.sigmoid(i_m) * jax.nn.sigmoid(i_n)
            )
            j_score = (
                jax.nn.sigmoid(j_m + j_n) * jax.nn.sigmoid(j_m) * jax.nn.sigmoid(j_n)
            )
            ll = jnp.sum(jax.nn.log_sigmoid(i_score - j_score) * mvalid)
            ll_m = jnp.sum(jax.nn.log_sigmoid(i_m - j_m) * mvalid)
            ll_n = jnp.sum(jax.nn.log_sigmoid(i_n - j_n) * mvalid)

            l2_e = sum(
                0.5 * jnp.sum(p[name] ** 2)
                for name in (["E", "Bp", "E_ind"] + (["E2", "E_ind2"] if self.tanh == 2 else []))
            )
            reg = (
                0.5
                * lw
                * (
                    jnp.sum(p["Gu"][u] ** 2)
                    + jnp.sum(p["Gi"][i] ** 2)
                    + jnp.sum(p["Gi"][j] ** 2)
                    + jnp.sum(p["Tu"][u] ** 2)
                )
                + 0.5 * lb * jnp.sum(p["Bi"][i] ** 2)
                + 0.5 * lb / 10 * jnp.sum(p["Bi"][j] ** 2)
                + le * l2_e
            )
            return -ll + reg - ll_m - ll_n

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(params)

        # data-parallel over the mesh: params/opt/features/streams
        # replicated, per-step triplet minibatch sharded (GSPMD psums)
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            params, opt_state, rid_d, cid_d, membership, F_d = replicate_all(
                self.mesh, params, opt_state, rid_d, cid_d, membership, F_d
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
                    loss, grads = jax.value_and_grad(loss_fn)(params, u, i, j, m)
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

        self._store(params, F, mean_feat)
        return self

    def _store(self, params, F, mean_feat):
        np64 = lambda x: np.asarray(x, dtype=np.float64)
        self.beta_item = np64(params["Bi"])
        self.gamma_user = np64(params["Gu"])
        self.gamma_item = np64(params["Gi"])
        self.theta_user = np64(params["Tu"])
        self.theta_item = np64(self._visual(params, jnp.asarray(F), "E"))
        self.ind_theta_item = np64(self._visual(params, jnp.asarray(F), "E_ind"))
        self.visual_bias = np64(
            (jnp.asarray(F) @ params["Bp"]).ravel()
        )
        self.beta_item_mean = float(self.beta_item.mean())
        self.gamma_item_mean = self.gamma_item.mean(axis=0, keepdims=True)
        self.mean_feat = np64(
            self._visual(params, jnp.asarray(mean_feat), "E_ind")
        )

    def _debiased_scores(self, users):
        """expit(m+n) expit(m) expit(n) - lambda_2 expit(m*+n) expit(m*)
        expit(n), where m* replaces the item branch with its mean."""
        from scipy.special import expit

        gu, tu = self.gamma_user[users], self.theta_user[users]
        m = (
            self.beta_item[None, :]
            + gu @ self.gamma_item.T
            + gu @ (self.gamma_item * self.ind_theta_item).T
        )
        m_star = (
            self.beta_item_mean
            + gu @ self.gamma_item_mean.T
            + gu @ (self.gamma_item_mean * self.mean_feat).T
        )  # (B, 1)
        nb = self.visual_bias[None, :] + tu @ self.theta_item.T
        return expit(m + nb) * expit(m) * expit(nb) - self.lambda_2 * expit(
            m_star + nb
        ) * expit(m_star) * expit(nb)

    def score(self, user_idx, item_idx=None):
        if item_idx is not None:
            raise NotImplementedError("The sampled evaluation is not implemented!")
        return self._debiased_scores(np.asarray([user_idx]))[0]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        users = np.clip(users, 0, self.total_users - 1)
        return self._debiased_scores(users).astype(np.float64)
