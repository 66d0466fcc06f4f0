"""GCMC — Graph Convolutional Matrix Completion (van den Berg et al., 2017).

Capability parity with reference ``cornac/models/gcmc/recom_gcmc.py:22`` +
``gcmc/gcmc.py`` + ``gcmc/nn_modules.py`` (DGL heterograph with one edge
type per rating value, GCMCGraphConv encoder with stack/sum cross-rating
aggregation, BiDecoder basis-bilinear rating classifier, softmax-expected
rating prediction, valid-RMSE early stopping + LR decay).

TPU redesign: no DGL.  The rating graph lives as flat edge arrays
(u, i, label) and each per-rating convolution is a masked segment-sum —
``scatter_add(mask_r * cj[u] * W_r[u]) * ci`` — which XLA lowers to a
handful of gathers/scatters; the static loop over rating classes (≤ tens)
unrolls at trace time.  Node features are identity one-hots, so the conv
weight IS a per-rating embedding table and the matmul disappears.  The
full forward+loss+update step is one jitted program; validation RMSE,
early stopping, and LR-plateau decay run between compiled chunks.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import ACTIVATIONS
from ..exception import ScoreException
from ..utils import get_rng
from .recommender import Recommender


def _xavier(rng, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jnp.asarray(rng.uniform(-bound, bound, size=shape).astype(np.float32))


def _init_gcmc(rng, n_users, n_items, n_ratings, agg_units, out_units,
               agg_accum, share_param, num_basis):
    msg = agg_units // n_ratings if agg_accum == "stack" else agg_units
    params = {
        # per-rating message tables (identity features ⇒ conv weight rows)
        "Wu": _xavier(rng, (n_ratings, n_users, msg)),
        "Wi": _xavier(rng, (n_ratings, n_items, msg)),
        "ufc_w": _xavier(rng, (agg_units, out_units)),
        "ufc_b": jnp.zeros((out_units,), jnp.float32),
        "P": _xavier(rng, (num_basis, out_units, out_units)),
        "combine": _xavier(rng, (num_basis, n_ratings)),
    }
    if share_param and n_users == n_items:
        params["Wi"] = params["Wu"]
    else:
        params["ifc_w"] = _xavier(rng, (agg_units, out_units))
        params["ifc_b"] = jnp.zeros((out_units,), jnp.float32)
    return params


def _encode(params, graph, act, n_ratings, agg_accum, dropout, key):
    """One GCMC layer: per-rating bipartite message passing.

    graph: dict with edge_u, edge_i, edge_label (int), cj_u, ci_u, cj_i,
    ci_i (1/sqrt degree norms) — all device arrays with static shapes.
    """
    eu, ei, lab = graph["edge_u"], graph["edge_i"], graph["edge_label"]
    n_users = params["Wu"].shape[1]
    n_items = params["Wi"].shape[1]

    u_msgs, i_msgs = [], []
    for r in range(n_ratings):
        m = (lab == r).astype(jnp.float32)[:, None]
        # user -> item messages with W_r rows of source users
        src_u = params["Wu"][r][eu] * graph["cj_u"][eu][:, None] * m
        i_agg = jnp.zeros((n_items, src_u.shape[1]), jnp.float32).at[ei].add(src_u)
        i_msgs.append(i_agg * graph["ci_i"][:, None])
        # item -> user (rev edges)
        src_i = params["Wi"][r][ei] * graph["cj_i"][ei][:, None] * m
        u_agg = jnp.zeros((n_users, src_i.shape[1]), jnp.float32).at[eu].add(src_i)
        u_msgs.append(u_agg * graph["ci_u"][:, None])

    if agg_accum == "stack":
        ufeat = jnp.concatenate(u_msgs, axis=1)
        ifeat = jnp.concatenate(i_msgs, axis=1)
    else:  # sum
        ufeat = sum(u_msgs)
        ifeat = sum(i_msgs)

    ufeat, ifeat = act(ufeat), act(ifeat)
    if key is not None and dropout > 0.0:
        ku, ki = jax.random.split(key)
        keep = 1.0 - dropout
        ufeat = ufeat * jax.random.bernoulli(ku, keep, ufeat.shape) / keep
        ifeat = ifeat * jax.random.bernoulli(ki, keep, ifeat.shape) / keep
    ufeat = ufeat @ params["ufc_w"] + params["ufc_b"]
    if "ifc_w" in params:
        ifeat = ifeat @ params["ifc_w"] + params["ifc_b"]
    else:
        ifeat = ifeat @ params["ufc_w"] + params["ufc_b"]
    return ufeat, ifeat


def _decode_pairs(params, ufeat, ifeat, pu, pi):
    """Basis bilinear logits for pairs (pu, pi) — reference BiDecoder."""
    u = ufeat[pu]  # (B, D)
    v = ifeat[pi]
    basis = jnp.einsum("bd,kde,be->bk", u, params["P"], v)  # (B, num_basis)
    return basis @ params["combine"]  # (B, n_ratings)


class GCMC(Recommender):
    """Graph convolutional matrix completion with rating-typed edges."""

    def __init__(
        self,
        name="GCMC",
        max_iter=2000,
        learning_rate=0.01,
        optimizer="adam",
        activation_func="leaky_relu",
        gcn_agg_units=500,
        gcn_out_units=75,
        gcn_dropout=0.7,
        gcn_agg_accum="stack",
        share_param=False,
        gen_r_num_basis_func=2,
        train_grad_clip=1.0,
        train_valid_interval=1,
        train_early_stopping_patience=100,
        train_min_learning_rate=0.001,
        train_decay_patience=50,
        train_lr_decay_factor=0.5,
        trainable=True,
        verbose=False,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.optimizer = optimizer
        self.activation_func = activation_func
        self.gcn_agg_units = gcn_agg_units
        self.gcn_out_units = gcn_out_units
        self.gcn_dropout = gcn_dropout
        self.gcn_agg_accum = gcn_agg_accum
        self.share_param = share_param
        self.gen_r_num_basis_func = gen_r_num_basis_func
        self.train_grad_clip = train_grad_clip
        self.train_valid_interval = train_valid_interval
        self.train_early_stopping_patience = train_early_stopping_patience
        self.train_min_learning_rate = train_min_learning_rate
        self.train_decay_patience = train_decay_patience
        self.train_lr_decay_factor = train_lr_decay_factor
        self.seed = seed
        self.mesh = mesh
        if gcn_agg_accum not in ("stack", "sum"):
            raise ValueError("gcn_agg_accum must be 'stack' or 'sum'")

    # ---------------------------------------------------------------- graph
    def _build_graph(self, train_set):
        u, i, r = train_set.uir_tuple
        self.rating_values = np.unique(r)
        labels = np.searchsorted(self.rating_values, r).astype(np.int32)
        n_u, n_i = self.num_users, self.num_items
        deg_u = np.bincount(u, minlength=n_u).astype(np.float32)
        deg_i = np.bincount(i, minlength=n_i).astype(np.float32)
        inv_sqrt = lambda d: 1.0 / np.sqrt(np.where(d == 0, np.inf, d))
        return {
            "edge_u": jnp.asarray(u, jnp.int32),
            "edge_i": jnp.asarray(i, jnp.int32),
            "edge_label": jnp.asarray(labels),
            # symmetric norms: ci = cj = 1/sqrt(total degree) (gcmc.py:64-97)
            "ci_u": jnp.asarray(inv_sqrt(deg_u)),
            "cj_u": jnp.asarray(inv_sqrt(deg_u)),
            "ci_i": jnp.asarray(inv_sqrt(deg_i)),
            "cj_i": jnp.asarray(inv_sqrt(deg_i)),
        }

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        rng = get_rng(self.seed)
        if self.activation_func not in ACTIVATIONS:
            raise ValueError("Supported act_fn: {}".format(list(ACTIVATIONS)))
        act = ACTIVATIONS[self.activation_func]

        self.graph = self._build_graph(train_set)
        n_ratings = len(self.rating_values)
        agg_units = self.gcn_agg_units
        if self.gcn_agg_accum == "stack":
            agg_units -= agg_units % n_ratings  # keep divisibility
            agg_units = max(agg_units, n_ratings)
        if not hasattr(self, "params"):
            self.params = _init_gcmc(
                rng, self.num_users, self.num_items, n_ratings, agg_units,
                self.gcn_out_units, self.gcn_agg_accum, self.share_param,
                self.gen_r_num_basis_func,
            )
        if not self.trainable:
            return self

        opt_name = self.optimizer.lower()
        make_opt = {
            "adam": optax.adam, "sgd": optax.sgd,
            "rmsprop": optax.rmsprop, "adagrad": optax.adagrad,
        }.get(opt_name)
        if make_opt is None:
            raise ValueError("Unknown optimizer: {}".format(self.optimizer))

        graph = self.graph
        if self.mesh is not None:
            # edge parallelism: the rating edges shard over the data axis.
            # Padding edges carry label == n_ratings, which no per-rating
            # message gate matches (lab == r is False for every r), so the
            # encoder ignores them; the loss masks them out via edge_w.
            from ..parallel import replicate_all, shard_batch

            pad_e = (-int(graph["edge_u"].shape[0])) % self.mesh.size
            ew = jnp.concatenate(
                [
                    jnp.ones(graph["edge_u"].shape[0], jnp.float32),
                    jnp.zeros(pad_e, jnp.float32),
                ]
            )
            if pad_e:
                graph = dict(
                    graph,
                    edge_u=jnp.concatenate(
                        [graph["edge_u"], jnp.zeros(pad_e, jnp.int32)]
                    ),
                    edge_i=jnp.concatenate(
                        [graph["edge_i"], jnp.zeros(pad_e, jnp.int32)]
                    ),
                    edge_label=jnp.concatenate(
                        [
                            graph["edge_label"],
                            jnp.full(pad_e, n_ratings, jnp.int32),
                        ]
                    ),
                )
            graph["edge_u"] = shard_batch(self.mesh, graph["edge_u"])
            graph["edge_i"] = shard_batch(self.mesh, graph["edge_i"])
            graph["edge_label"] = shard_batch(self.mesh, graph["edge_label"])
            graph["edge_w"] = shard_batch(self.mesh, ew)
            for k_ in ("ci_u", "cj_u", "ci_i", "cj_i"):
                graph[k_] = replicate_all(self.mesh, graph[k_])
            self.params = replicate_all(self.mesh, self.params)
        pu, pi, lab = graph["edge_u"], graph["edge_i"], graph["edge_label"]
        edge_w = graph.get("edge_w")
        n_ratings_s = n_ratings
        agg_accum = self.gcn_agg_accum
        dropout = self.gcn_dropout
        clip = self.train_grad_clip
        values = jnp.asarray(self.rating_values, jnp.float32)

        def loss_fn(params, key):
            ufeat, ifeat = _encode(
                params, graph, act, n_ratings_s, agg_accum, dropout, key
            )
            safe_lab = jnp.minimum(lab, n_ratings_s - 1)
            logits = _decode_pairs(params, ufeat, ifeat, pu, pi)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, safe_lab
            )
            if edge_w is None:
                return jnp.mean(ce)
            return jnp.sum(ce * edge_w) / jnp.sum(edge_w)

        @jax.jit
        def valid_rmse(params, vu, vi, vr):
            ufeat, ifeat = _encode(
                params, graph, act, n_ratings_s, agg_accum, 0.0, None
            )
            logits = _decode_pairs(params, ufeat, ifeat, vu, vi)
            pred = jax.nn.softmax(logits, axis=1) @ values
            return jnp.sqrt(jnp.mean((pred - vr) ** 2))

        # clip + injectable-lr optimizer (LR-plateau decay swaps the
        # hyperparam in-place, keeping optimizer moments)
        lr = self.learning_rate
        opt = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.inject_hyperparams(make_opt)(learning_rate=lr),
        )
        opt_state = opt.init(self.params)

        @partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
        def run_chunk(params, opt_state, key, n_iters):
            def step(t, carry):
                params, opt_state, _ = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, jax.random.fold_in(key, t)
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss
            return jax.lax.fori_loop(
                0, n_iters, step, (params, opt_state, jnp.float32(0.0))
            )

        key = jax.random.PRNGKey(rng.randint(2**31))
        if val_set is None:
            done = 0
            chunk = self.max_iter if not self.verbose else max(1, self.max_iter // 10)
            while done < self.max_iter:
                n = min(chunk, self.max_iter - done)
                self.params, opt_state, loss = run_chunk(
                    self.params, opt_state, jax.random.fold_in(key, done),
                    jnp.int32(n),
                )
                done += n
                if self.verbose:
                    print("Iter %d/%d, loss: %.4f" % (done, self.max_iter, loss))
        else:
            vu = jnp.asarray(val_set.uir_tuple[0], jnp.int32)
            vi = jnp.asarray(val_set.uir_tuple[1], jnp.int32)
            vr = jnp.asarray(val_set.uir_tuple[2], jnp.float32)
            best_rmse, best_params, no_improve, decay_wait = np.inf, None, 0, 0
            done = 0
            interval = max(1, self.train_valid_interval)
            while done < self.max_iter:
                n = min(interval, self.max_iter - done)
                self.params, opt_state, loss = run_chunk(
                    self.params, opt_state, jax.random.fold_in(key, done),
                    jnp.int32(n),
                )
                done += n
                rmse = float(valid_rmse(self.params, vu, vi, vr))
                if rmse < best_rmse:
                    best_rmse, no_improve, decay_wait = rmse, 0, 0
                    # deep copy: run_chunk donates param buffers, so an
                    # aliasing snapshot would be invalidated next chunk
                    best_params = jax.tree_util.tree_map(jnp.copy, self.params)
                else:
                    no_improve += 1
                    decay_wait += 1
                if no_improve >= self.train_early_stopping_patience:
                    break
                if decay_wait >= self.train_decay_patience:
                    new_lr = max(
                        lr * self.train_lr_decay_factor,
                        self.train_min_learning_rate,
                    )
                    if new_lr < lr:
                        lr = new_lr
                        # keep optimizer moments, swap the hyperparam
                        opt_state[1].hyperparams["learning_rate"] = jnp.float32(lr)
                    decay_wait = 0
                if self.verbose:
                    print(
                        "Iter %d/%d, loss %.4f, valid rmse %.4f"
                        % (done, self.max_iter, loss, rmse)
                    )
            if best_params is not None:
                self.params = best_params

        # cache eval-mode node embeddings for scoring
        self._refresh_embeddings(act, n_ratings, agg_accum)
        return self

    def _refresh_embeddings(self, act=None, n_ratings=None, agg_accum=None):
        act = act or ACTIVATIONS[self.activation_func]
        n_ratings = n_ratings or len(self.rating_values)
        agg_accum = agg_accum or self.gcn_agg_accum
        ufeat, ifeat = _encode(
            self.params, self.graph, act, n_ratings, agg_accum, 0.0, None
        )
        self.ufeat = np.asarray(ufeat)
        self.ifeat = np.asarray(ifeat)

    # ------------------------------------------------------------- scoring
    def _expected_ratings(self, pu, pi):
        logits = _decode_pairs(
            self.params, jnp.asarray(self.ufeat), jnp.asarray(self.ifeat),
            jnp.asarray(pu, jnp.int32), jnp.asarray(pi, jnp.int32),
        )
        probs = jax.nn.softmax(logits, axis=1)
        return np.asarray(probs @ jnp.asarray(self.rating_values, jnp.float32))

    def transform(self, test_set):
        """Precompute scores for test pairs (reference recom_gcmc.py:194)."""
        tu, ti, _ = test_set.uir_tuple
        preds = self._expected_ratings(tu, ti)
        self.u_i_rating_dict = {
            "%d-%d" % (u, i): float(p) for u, i, p in zip(tu, ti, preds)
        }

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is None:
            items = np.arange(self.num_items)
            return self._expected_ratings(np.full_like(items, user_idx), items)
        if self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if hasattr(self, "u_i_rating_dict"):
            got = self.u_i_rating_dict.get("%d-%d" % (user_idx, item_idx))
            if got is not None:
                return got
        return float(
            self._expected_ratings([user_idx], [item_idx])[0]
        )

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        items = np.arange(self.num_items)
        pu = np.repeat(safe, self.num_items)
        pi = np.tile(items, len(users))
        scores = self._expected_ratings(pu, pi).reshape(len(users), self.num_items)
        scores = scores.astype(np.float64)
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
