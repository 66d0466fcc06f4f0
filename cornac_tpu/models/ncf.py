"""NCF family — GMF, MLP, NeuMF (He et al., WWW 2017).

Capability parity with reference ``cornac/models/ncf/`` (dual TF/torch
backends, ``recom_ncf_base.py:25``; GMF @ ``recom_gmf.py``, MLP @
``recom_mlp.py``, NeuMF @ ``recom_neumf.py`` with pretrained GMF+MLP
fusion, ``backend_pt.py:151``). TPU redesign: one pure-JAX forward per
architecture, pointwise BCE with ``num_neg`` sampled negatives per positive
drawn on device each epoch (invalid negatives masked via the membership
structure), optax optimizers, whole-fit-in-one-jit like the factor models.
Early stopping monitors validation NDCG@100 via the batched eval harness.
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
from ..utils.init_utils import normal, xavier_uniform
from .recommender import Recommender

OPTIMIZERS = {
    "sgd": optax.sgd,
    "adam": optax.adam,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
}

EPS = 1e-7


class NCFBase(Recommender):
    """Shared trainer for the NCF family."""

    def __init__(
        self,
        name="NCF",
        num_epochs=20,
        batch_size=256,
        num_neg=4,
        lr=0.001,
        learner="adam",
        reg=0.0,
        backend="tensorflow",
        early_stopping=None,
        trainable=True,
        verbose=True,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.num_epochs = num_epochs
        self.batch_size = batch_size
        self.num_neg = num_neg
        self.lr = lr
        self.learner = learner
        self.reg = reg
        # reference backend selector (recom_ncf_base.py:132-135); every
        # value runs the same TPU path but unknown ones still error
        if backend not in ("tensorflow", "pytorch", "tpu"):
            raise ValueError(f"{backend} is not supported")
        self.backend = backend
        self.early_stopping = early_stopping
        self.seed = seed

    # subclasses provide these two
    def _init_params(self, rng):
        raise NotImplementedError

    def _forward(self, params, users, items):
        """Sigmoid probability for (user, item) index batches."""
        raise NotImplementedError

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        if not hasattr(self, "params"):
            self.params = self._init_params(rng)

        rid, cid, _ = train_set.uir_tuple
        n = len(rid)
        membership = build_membership(train_set.csr_matrix)
        num_items = train_set.num_items

        optimizer = OPTIMIZERS[self.learner](self.lr)
        opt_state = optimizer.init(self.params)

        num_neg = self.num_neg
        n_total = n * (1 + num_neg)
        bsz = min(self.batch_size, n_total)
        n_pad = (-n_total) % bsz
        n_batches = (n_total + n_pad) // bsz
        forward = self._forward
        reg = self.reg

        def loss_fn(params, u, i, y, m):
            p = jnp.clip(forward(params, u, i), EPS, 1.0 - EPS)
            bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
            loss = jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0)
            if reg > 0:
                loss = loss + reg * sum(
                    jnp.sum(x**2) for x in jax.tree_util.tree_leaves(params)
                )
            return loss

        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)

        # data-parallel over the mesh (BASELINE: "dense towers stay
        # data-parallel"): params/opt replicated, every minibatch sharded
        # across all devices; gradient psums are inserted by GSPMD
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            from ..parallel import replicate_all

            self.params, opt_state, rid_d, cid_d = replicate_all(
                self.mesh, self.params, opt_state, rid_d, cid_d
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs):
            def epoch(e, carry):
                params, opt_state, _ = carry
                ekey = jax.random.fold_in(key, e)
                k_perm, k_neg = jax.random.split(ekey)
                # positives (shuffled) + num_neg sampled negatives each
                perm = jax.random.permutation(k_perm, n)
                pos_u, pos_i = rid_d[perm], cid_d[perm]
                neg_u = jnp.tile(pos_u, num_neg)
                neg_i = jax.random.randint(k_neg, (n * num_neg,), 0, num_items)
                neg_valid = ~membership.query(neg_u, neg_i)

                users = jnp.concatenate([pos_u, neg_u])
                items = jnp.concatenate([pos_i, neg_i])
                labels = jnp.concatenate(
                    [jnp.ones(n, jnp.float32), jnp.zeros(n * num_neg, jnp.float32)]
                )
                valid = jnp.concatenate(
                    [jnp.ones(n, bool), neg_valid]
                )
                if n_pad:
                    users = jnp.concatenate([users, jnp.zeros(n_pad, jnp.int32)])
                    items = jnp.concatenate([items, jnp.zeros(n_pad, jnp.int32)])
                    labels = jnp.concatenate([labels, jnp.zeros(n_pad, jnp.float32)])
                    valid = jnp.concatenate([valid, jnp.zeros(n_pad, bool)])

                # interleave pos/neg by reshuffling the combined arrays
                k_mix = jax.random.fold_in(ekey, 1)
                mix = jax.random.permutation(k_mix, users.shape[0])
                users, items = users[mix], items[mix]
                labels, valid = labels[mix], valid[mix]

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    sl = lambda a: jax.lax.dynamic_slice(
                        a, (b * bsz,), (bsz,)
                    )
                    u, i, y, m = sl(users), sl(items), sl(labels), sl(
                        valid.astype(jnp.float32)
                    )
                    if batch_shard is not None:
                        u, i, y, m = (
                            jax.lax.with_sharding_constraint(x, batch_shard)
                            for x in (u, i, y, m)
                        )
                    loss, grads = jax.value_and_grad(loss_fn)(params, u, i, y, m)
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
        # chunk epochs when reporting or early-stopping between them
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

        return self

    def monitor_value(self, train_set, val_set):
        """Validation NDCG@100 (reference ``recom_ncf_base.py:355-385``)."""
        if val_set is None:
            return None
        from ..eval_methods import ranking_eval
        from ..metrics import NDCG

        return ranking_eval(
            model=self,
            metrics=[NDCG(k=100)],
            train_set=train_set,
            test_set=val_set,
        )[0][0]

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        if item_idx is None:
            users = jnp.full((self.num_items,), user_idx, dtype=jnp.int32)
            items = jnp.arange(self.num_items, dtype=jnp.int32)
            return np.asarray(self._forward(self.params, users, items))
        out = self._forward(
            self.params,
            jnp.asarray([user_idx], dtype=jnp.int32),
            jnp.asarray([item_idx], dtype=jnp.int32),
        )
        return float(np.asarray(out)[0])

    def score_pairs(self, user_indices, item_indices):
        # the NCF forward is already pairwise: one device program
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        known = (
            (users >= 0) & (users < self.num_users)
            & (items >= 0) & (items < self.num_items)
        )
        out = np.asarray(
            self._forward(
                self.params,
                jnp.asarray(np.where(known, users, 0), dtype=jnp.int32),
                jnp.asarray(np.where(known, items, 0), dtype=jnp.int32),
            ),
            dtype=np.float64,
        )
        return np.where(known, out, self.default_score())

    def _known_scores_device(self, safe_users, known):
        u = jnp.repeat(jnp.asarray(safe_users, dtype=jnp.int32), self.num_items)
        i = jnp.tile(jnp.arange(self.num_items, dtype=jnp.int32), len(safe_users))
        return self._forward(self.params, u, i).reshape(
            len(safe_users), self.num_items
        )

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        u = jnp.repeat(jnp.asarray(safe, dtype=jnp.int32), self.num_items)
        i = jnp.tile(jnp.arange(self.num_items, dtype=jnp.int32), len(users))
        scores = np.asarray(
            self._forward(self.params, u, i), dtype=np.float64
        ).reshape(len(users), self.num_items)
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores


class GMF(NCFBase):
    """Generalized MF: sigmoid(w . (u_e * i_e))."""

    def __init__(
        self,
        name="GMF",
        num_factors=8,
        reg=0.0,
        num_epochs=20,
        batch_size=256,
        num_neg=4,
        lr=0.001,
        learner="adam",
        backend="tensorflow",
        early_stopping=None,
        trainable=True,
        verbose=True,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name,
            num_epochs=num_epochs,
            batch_size=batch_size,
            num_neg=num_neg,
            lr=lr,
            learner=learner,
            reg=reg,
            backend=backend,
            early_stopping=early_stopping,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
            mesh=mesh,
        )
        self.num_factors = num_factors

    def _init_params(self, rng):
        return {
            "user_emb": jnp.asarray(
                normal((self.num_users, self.num_factors), std=1e-2, random_state=rng)
            ),
            "item_emb": jnp.asarray(
                normal((self.num_items, self.num_factors), std=1e-2, random_state=rng)
            ),
            "logit": {
                "w": jnp.asarray(
                    normal((self.num_factors, 1), std=1e-2, random_state=rng)
                ),
                "b": jnp.zeros((1,), jnp.float32),
            },
        }

    @staticmethod
    def _h(params, users, items):
        return params["user_emb"][users] * params["item_emb"][items]

    def _forward(self, params, users, items):
        h = self._h(params, users, items)
        return jax.nn.sigmoid(dense(params["logit"], h)).reshape(-1)


class MLP(NCFBase):
    """MLP over concatenated user/item embeddings."""

    def __init__(
        self,
        name="MLP",
        layers=(64, 32, 16, 8),
        act_fn="relu",
        reg=0.0,
        num_epochs=20,
        batch_size=256,
        num_neg=4,
        lr=0.001,
        learner="adam",
        backend="tensorflow",
        early_stopping=None,
        trainable=True,
        verbose=True,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name,
            num_epochs=num_epochs,
            batch_size=batch_size,
            num_neg=num_neg,
            lr=lr,
            learner=learner,
            reg=reg,
            backend=backend,
            early_stopping=early_stopping,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
            mesh=mesh,
        )
        self.layers = list(layers)
        self.act_fn = act_fn

    def _init_params(self, rng):
        emb_dim = self.layers[0] // 2
        stack = init_mlp(rng, self.layers)
        # xavier init for hidden weights (reference backend_pt.py:92-95)
        for i in range(len(stack)):
            fan_in, fan_out = self.layers[i], self.layers[i + 1]
            stack[i]["w"] = jnp.asarray(xavier_uniform((fan_in, fan_out), rng))
        return {
            "user_emb": jnp.asarray(
                normal((self.num_users, emb_dim), std=1e-2, random_state=rng)
            ),
            "item_emb": jnp.asarray(
                normal((self.num_items, emb_dim), std=1e-2, random_state=rng)
            ),
            "mlp": stack,
            "logit": {
                "w": jnp.asarray(
                    normal((self.layers[-1], 1), std=1e-2, random_state=rng)
                ),
                "b": jnp.zeros((1,), jnp.float32),
            },
        }

    def _h(self, params, users, items):
        act = ACTIVATIONS[self.act_fn]
        h = jnp.concatenate(
            [params["user_emb"][users], params["item_emb"][items]], axis=-1
        )
        for layer in params["mlp"]:
            h = act(dense(layer, h))
        return h

    def _forward(self, params, users, items):
        h = self._h(params, users, items)
        return jax.nn.sigmoid(dense(params["logit"], h)).reshape(-1)


class NeuMF(NCFBase):
    """Fusion of GMF and MLP towers, optionally from pretrained parts."""

    def __init__(
        self,
        name="NeuMF",
        num_factors=8,
        layers=(64, 32, 16, 8),
        act_fn="relu",
        reg=0.0,
        num_epochs=20,
        batch_size=256,
        num_neg=4,
        lr=0.001,
        learner="adam",
        backend="tensorflow",
        early_stopping=None,
        trainable=True,
        verbose=True,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name,
            num_epochs=num_epochs,
            batch_size=batch_size,
            num_neg=num_neg,
            lr=lr,
            learner=learner,
            reg=reg,
            backend=backend,
            early_stopping=early_stopping,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
            mesh=mesh,
        )
        layers = [64, 32, 16, 8] if layers is None else list(layers)
        num_factors = layers[-1] if num_factors is None else num_factors
        assert layers[-1] == num_factors
        self.num_factors = num_factors
        self.layers = layers
        self.act_fn = act_fn
        self.pretrained = False

    def pretrain(self, gmf_model, mlp_model, alpha=0.5):
        """Use pretrained GMF + MLP towers (reference
        ``backend_pt.py:151-165``); call before fit()."""
        self.pretrained = True
        self.pretrained_gmf = gmf_model
        self.pretrained_mlp = mlp_model
        self.alpha = alpha
        return self

    def _init_params(self, rng):
        gmf = GMF.__new__(GMF)
        gmf.num_users, gmf.num_items = self.num_users, self.num_items
        gmf.num_factors = self.num_factors
        gmf_params = GMF._init_params(gmf, rng)

        mlp = MLP.__new__(MLP)
        mlp.num_users, mlp.num_items = self.num_users, self.num_items
        mlp.layers, mlp.act_fn = self.layers, self.act_fn
        mlp_params = MLP._init_params(mlp, rng)

        params = {
            "gmf": {k: gmf_params[k] for k in ("user_emb", "item_emb")},
            "mlp": {k: mlp_params[k] for k in ("user_emb", "item_emb", "mlp")},
            "logit": init_dense(rng, self.num_factors + self.layers[-1], 1),
        }

        if self.pretrained:
            g, m, alpha = self.pretrained_gmf.params, self.pretrained_mlp.params, self.alpha
            params["gmf"]["user_emb"] = g["user_emb"]
            params["gmf"]["item_emb"] = g["item_emb"]
            params["mlp"]["user_emb"] = m["user_emb"]
            params["mlp"]["item_emb"] = m["item_emb"]
            params["mlp"]["mlp"] = m["mlp"]
            params["logit"] = {
                "w": jnp.concatenate(
                    [alpha * g["logit"]["w"], (1 - alpha) * m["logit"]["w"]], axis=0
                ),
                "b": alpha * g["logit"]["b"] + (1 - alpha) * m["logit"]["b"],
            }
        return params

    def _forward(self, params, users, items):
        act = ACTIVATIONS[self.act_fn]
        h_gmf = params["gmf"]["user_emb"][users] * params["gmf"]["item_emb"][items]
        h = jnp.concatenate(
            [params["mlp"]["user_emb"][users], params["mlp"]["item_emb"][items]],
            axis=-1,
        )
        for layer in params["mlp"]["mlp"]:
            h = act(dense(layer, h))
        fused = jnp.concatenate([h_gmf, h], axis=-1)
        return jax.nn.sigmoid(dense(params["logit"], fused)).reshape(-1)
