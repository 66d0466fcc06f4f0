"""VMF — Visual Matrix Factorization (Park, Kim & Choi, 2017).

Capability parity with reference ``cornac/models/vmf/recom_vmf.py:25`` +
``vmf/vmf.py`` (torch RMSProp over pointwise sigmoid predictions with a
visual projection term). Fused multi-epoch JAX training.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exception import CornacException, ScoreException
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.common import scale
from .recommender import Recommender


class VMF(Recommender):
    """sigmoid(u.v + p.(E f_i)) regression on scaled ratings."""

    def __init__(
        self,
        name="VMF",
        k=10,
        d=10,
        n_epochs=100,
        batch_size=100,
        learning_rate=0.001,
        gamma=0.9,
        lambda_u=0.001,
        lambda_v=0.001,
        lambda_p=1.0,
        lambda_e=10.0,
        trainable=True,
        verbose=False,
        use_gpu=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.d = d
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.gamma = gamma
        self.lambda_u = lambda_u
        self.lambda_v = lambda_v
        self.lambda_p = lambda_p
        self.lambda_e = lambda_e
        self.use_gpu = use_gpu  # API parity
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.item_image is None:
            raise CornacException("this model needs the item_image modality attached to the eval method")

        rng = get_rng(self.seed)
        F = np.asarray(
            train_set.item_image.features[: self.num_items], dtype=np.float32
        )
        f_dim = F.shape[1]

        def init(name, shape):
            v = self.init_params.get(name)
            return (
                jnp.asarray(v, dtype=jnp.float32)
                if v is not None
                else jnp.asarray(rng.randn(*shape).astype(np.float32))
            )

        params = {
            "U": init("U", (self.num_users, self.k)),
            "V": init("V", (self.num_items, self.k)),
            "P": init("P", (self.num_users, self.d)),
            "E": init("E", (f_dim, self.d)),
        }
        if not self.trainable:
            self._store(params, F)
            return self

        rid, cid, rat = train_set.uir_tuple
        rat = scale(
            rat.astype(np.float32), 0.0, 1.0, self.min_rating, self.max_rating
        )
        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        rat_d = jnp.asarray(rat, dtype=jnp.float32)
        F_d = jnp.asarray(F)

        n = len(rid)
        bsz = min(self.batch_size, n)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_batches = (n + bsz - 1) // bsz
        lu, lv, lp, le = self.lambda_u, self.lambda_v, self.lambda_p, self.lambda_e

        optimizer = optax.rmsprop(self.learning_rate, decay=self.gamma)
        opt_state = optimizer.init(params)

        # data-parallel over the mesh: params/opt/features/streams
        # replicated, per-step minibatch sharded (GSPMD psums)
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            params, opt_state, rid_d, cid_d, rat_d, F_d = replicate_all(
                self.mesh, params, opt_state, rid_d, cid_d, rat_d, F_d
            )

        def loss_fn(p, u, i, r):
            U_u, V_i, P_u = p["U"][u], p["V"][i], p["P"][u]
            vis = F_d[i] @ p["E"]
            pred = jax.nn.sigmoid(
                jnp.sum(U_u * V_i, axis=1) + jnp.sum(P_u * vis, axis=1)
            )
            loss = 0.5 * jnp.sum((r - pred) ** 2)
            reg = (
                lu * 0.5 * jnp.sum(U_u**2)
                + lv * 0.5 * jnp.sum(V_i**2)
                + lp * 0.5 * jnp.sum(P_u**2)
                + le * 0.5 * jnp.sum(p["E"] ** 2)
            )
            return loss + reg

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs, epoch_offset):
            def epoch(e, carry):
                params, opt_state, _ = carry
                # global epoch index: stream invariant to host chunking
                perm = jax.random.permutation(
                    jax.random.fold_in(key, epoch_offset + e), n_batches * bsz
                ) % n

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    idx = jax.lax.dynamic_slice(perm, (b * bsz,), (bsz,))
                    if batch_shard is not None:
                        idx = jax.lax.with_sharding_constraint(idx, batch_shard)
                    u, i, r = rid_d[idx], cid_d[idx], rat_d[idx]
                    loss, grads = jax.value_and_grad(loss_fn)(params, u, i, r)
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

        self._store(params, F)
        return self

    def _store(self, params, F):
        self.U = np.asarray(params["U"], dtype=np.float64)
        self.V = np.asarray(params["V"], dtype=np.float64)
        self.P = np.asarray(params["P"], dtype=np.float64)
        self.E = np.asarray(params["E"], dtype=np.float64)
        self.Q = F.astype(np.float64) @ self.E  # projected visual factors

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return self.V @ self.U[user_idx] + self.Q @ self.P[user_idx]
        return self.V[item_idx] @ self.U[user_idx] + self.Q[item_idx] @ self.P[user_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        scores = self.U[safe] @ self.V.T + self.P[safe] @ self.Q.T
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
