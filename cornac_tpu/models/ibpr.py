"""IBPR / OnlineIBPR (Le et al., 2017) and COE (Le & Lauw, 2016).

Capability parity with reference ``cornac/models/ibpr/recom_ibpr.py:23``,
``cornac/models/online_ibpr/recom_online_ibpr.py:23`` and
``cornac/models/coe/recom_coe.py:23`` (all torch Adam over sampled
triplets). Shared pure-JAX trainer; losses:

- IBPR/OnlineIBPR: pairwise logistic on *angular* distances of normalized
  embeddings (indexable under cosine ANN); OnlineIBPR updates only the user
  table, matching the reference's optimizer over [U].
- COE: pairwise logistic on Euclidean distances (ordinal embedding).
  Deviation: the reference's ``COE.score`` returns the raw distance (so
  ``rank`` would put the *farthest* items first — a reference bug); we score
  with the negative distance as the paper intends.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exception import ScoreException
from ..ops.membership import build_membership
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from .recommender import ANNMixin, MEASURE_DOT, MEASURE_L2, Recommender


def _angular_dist(a, b):
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return jnp.arccos(jnp.clip(jnp.sum(an * bn, axis=1), -1 + 1e-7, 1 - 1e-7))


def _euclid_dist(a, b):
    return jnp.linalg.norm(a - b + 1e-12, axis=1)


class _TripletEmbedBase(Recommender, ANNMixin):
    """Shared Adam-over-sampled-triplets trainer."""

    _distance = "angular"
    _update_items = True

    def __init__(
        self,
        name,
        k=20,
        max_iter=100,
        learning_rate=0.05,
        lamda=0.001,
        batch_size=100,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.lamda = lamda
        self.batch_size = batch_size
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.V = self.init_params.get("V", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        rng = get_rng(self.seed)
        if self.U is None:
            self.U = rng.randn(self.num_users, self.k).astype(np.float32)
        if self.V is None:
            self.V = rng.randn(self.num_items, self.k).astype(np.float32)
        if not self.trainable:
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
        lamda = self.lamda
        dist_fn = _angular_dist if self._distance == "angular" else _euclid_dist
        update_items = self._update_items

        params = {"U": jnp.asarray(self.U), "V": jnp.asarray(self.V)}
        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(params)

        # data-parallel over the mesh: params/opt/streams replicated, the
        # per-step triplet minibatch sharded; GSPMD psums the gradients
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            params, opt_state, rid_d, cid_d, membership = replicate_all(
                self.mesh, params, opt_state, rid_d, cid_d, membership
            )

        def loss_fn(params, u, i, j, m):
            pu, vi, vj = params["U"][u], params["V"][i], params["V"][j]
            d_i = dist_fn(pu, vi)
            d_j = dist_fn(pu, vj)
            core = -jnp.sum(jax.nn.log_sigmoid(d_j - d_i) * m)
            reg = lamda * (jnp.sum(pu**2) + jnp.sum(vi**2) + jnp.sum(vj**2))
            return core + reg

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
                    if not update_items:
                        grads = {"U": grads["U"], "V": jnp.zeros_like(grads["V"])}
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
                "Epoch %d/%d, loss: %.4f"
                % (done, self.max_iter, float(loss) / n_batches)
            ),
        )

        self.U = np.asarray(params["U"], dtype=np.float64)
        self.V = np.asarray(params["V"], dtype=np.float64)
        return self

    def _scores_for(self, users):
        if self._distance == "angular":
            return self.U[users] @ self.V.T
        diff = self.U[users][:, None, :] - self.V[None, :, :]
        return -np.linalg.norm(diff, axis=2)

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        row = self._scores_for(np.asarray([user_idx]))[0]
        return row if item_idx is None else row[item_idx]

    def _known_scores_device(self, safe_users, known):
        from ..ops.dense_scores import device_dot, device_neg_l2

        if self._distance == "angular":
            return device_dot(self.U[safe_users], self.V)
        return device_neg_l2(self.U[safe_users], self.V)

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = self._scores_for(np.where(known, users, 0))
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
        return MEASURE_DOT if self._distance == "angular" else MEASURE_L2

    def get_user_vectors(self):
        return self.U

    def get_item_vectors(self):
        return self.V


class IBPR(_TripletEmbedBase):
    """Indexable BPR: angular pairwise ranking."""

    def __init__(
        self,
        name="IBPR",
        k=20,
        max_iter=100,
        learning_rate=0.05,
        lamda=0.001,
        batch_size=100,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name, k=k, max_iter=max_iter, learning_rate=learning_rate,
            lamda=lamda, batch_size=batch_size, trainable=trainable,
            verbose=verbose, init_params=init_params, seed=seed, mesh=mesh,
        )


class OnlineIBPR(_TripletEmbedBase):
    """Online IBPR: same angular objective, only the user table is updated
    (reference optimizes over [U] only, ``online_ibpr.py:48``)."""

    _update_items = False

    def __init__(
        self,
        name="OnlineIBPR",
        k=20,
        max_iter=100,
        learning_rate=0.001,
        lamda=0.005,
        batch_size=100,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name, k=k, max_iter=max_iter, learning_rate=learning_rate,
            lamda=lamda, batch_size=batch_size, trainable=trainable,
            verbose=verbose, init_params=init_params, seed=seed, mesh=mesh,
        )


class COE(_TripletEmbedBase):
    """Collaborative Ordinal Embedding: Euclidean pairwise ranking."""

    _distance = "euclidean"

    def __init__(
        self,
        name="COE",
        k=20,
        max_iter=100,
        learning_rate=0.05,
        lamda=0.001,
        batch_size=1000,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name, k=k, max_iter=max_iter, learning_rate=learning_rate,
            lamda=lamda, batch_size=batch_size, trainable=trainable,
            verbose=verbose, init_params=init_params, seed=seed, mesh=mesh,
        )
