"""FPMC — Factorized Personalized Markov Chains (Rendle et al., WWW 2010).

Capability parity with reference ``cornac/models/fpmc/recom_fpmc.py:92``
(torch, the full ``seq_utils/losses.py`` family over (user, prev item,
next item) transitions, adagrad+momentum, best-on-val selection). TPU
design: the classic four-embedding FPMC factorization

    score(u, last, i) = <V_UI[u], V_IU[i]> + <V_IL[i], V_LI[last]>

With ``loss='bpr'`` and no momentum the fit is the fused hand-written
multi-epoch BPR kernel below; every other configuration routes through the
shared :func:`cornac_tpu.models.seq_utils.batch_loss` family using the
concatenation identity ``score = [V_UI[u] | V_LI[last]] . [V_IU[i] |
V_IL[i]]`` — one dot product, so the in-batch + sampled-negative score
matrix is a single matmul.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import get_rng
from ..utils.init_utils import normal
from .recommender import NextItemRecommender
from .seq_utils import (
    SUPPORTED_LOSSES,
    adagrad_m,
    batch_loss,
    neg_sampling_table,
    pad_histories,
    sample_negatives,
    val_score,
)


@partial(jax.jit, static_argnames=("batch_size", "num_items"), donate_argnums=(0,))
def _fpmc_epochs(
    params, key, users, prevs, nexts, lr, reg, batch_size, num_items, n_epochs
):
    n = users.shape[0]
    n_pad = (-n) % batch_size
    n_total = n + n_pad
    n_batches = n_total // batch_size
    pad_mask = jnp.arange(n_total) < n

    def epoch(e, carry):
        params, _ = carry
        k_pos, k_neg = jax.random.split(jax.random.fold_in(key, e))
        pos_idx = jax.random.randint(k_pos, (n_total,), 0, n)
        neg_items = jax.random.randint(k_neg, (n_total,), 0, num_items)
        u = users[pos_idx]
        prev = prevs[pos_idx]
        pos = nexts[pos_idx]
        valid = (pos != neg_items) & pad_mask

        def body(b, carry):
            params, loss_sum = carry
            sl = lambda a: jax.lax.dynamic_slice(a, (b * batch_size,), (batch_size,))
            ub, pb, ib, jb, m = sl(u), sl(prev), sl(pos), sl(neg_items), sl(valid)
            mf = m.astype(jnp.float32)

            V_UI, V_IU, V_IL, V_LI = (
                params["V_UI"],
                params["V_IU"],
                params["V_IL"],
                params["V_LI"],
            )
            vu, vl = V_UI[ub], V_LI[pb]
            vi_u, vj_u = V_IU[ib], V_IU[jb]
            vi_l, vj_l = V_IL[ib], V_IL[jb]

            x = jnp.sum(vu * (vi_u - vj_u), axis=1) + jnp.sum(
                vl * (vi_l - vj_l), axis=1
            )
            z = mf / (1.0 + jnp.exp(x))
            loss_sum = loss_sum + jnp.sum(jnp.log1p(jnp.exp(-jnp.abs(x))) * mf)

            params = dict(params)
            params["V_UI"] = V_UI.at[ub].add(
                lr * (z[:, None] * (vi_u - vj_u) - reg * vu * mf[:, None])
            )
            params["V_IU"] = (
                V_IU.at[ib]
                .add(lr * (z[:, None] * vu - reg * vi_u * mf[:, None]))
                .at[jb]
                .add(lr * (-z[:, None] * vu - reg * vj_u * mf[:, None]))
            )
            params["V_LI"] = V_LI.at[pb].add(
                lr * (z[:, None] * (vi_l - vj_l) - reg * vl * mf[:, None])
            )
            params["V_IL"] = (
                V_IL.at[ib]
                .add(lr * (z[:, None] * vl - reg * vi_l * mf[:, None]))
                .at[jb]
                .add(lr * (-z[:, None] * vl - reg * vj_l * mf[:, None]))
            )
            return params, loss_sum

        return jax.lax.fori_loop(0, n_batches, body, (params, jnp.float32(0.0)))

    return jax.lax.fori_loop(0, n_epochs, epoch, (params, jnp.float32(0.0)))


@jax.jit
def _fpmc_scores(V_UI, V_IU, V_IL, V_LI, users, lasts, has_last):
    base = V_UI[users] @ V_IU.T
    trans = V_LI[lasts] @ V_IL.T
    return base + trans * has_last[:, None]


class FPMC(NextItemRecommender):
    """FPMC with fused BPR training on device."""

    def __init__(
        self,
        name="FPMC",
        embedding_dim=32,
        loss="bpr",
        n_epochs=10,
        learning_rate=0.01,
        momentum=0.0,
        n_sample=2048,
        sample_alpha=0.5,
        lambda_reg=0.001,
        bpreg=1.0,
        elu_param=0.5,
        device="cpu",
        model_selection="last",
        val_eval_every=5,
        val_k=20,
        val_metric="recall",
        batch_size=1024,
        trainable=True,
        verbose=False,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        if loss not in SUPPORTED_LOSSES:
            raise ValueError(
                f"loss='{loss}' not supported; choose from {SUPPORTED_LOSSES}"
            )
        if model_selection not in ("last", "best"):
            raise ValueError(
                f"model_selection='{model_selection}' not supported; "
                "choose 'last' or 'best'"
            )
        self.embedding_dim = embedding_dim
        self.loss = loss
        self.n_epochs = n_epochs
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.n_sample = n_sample
        self.sample_alpha = sample_alpha
        self.lambda_reg = lambda_reg
        self.bpreg = bpreg
        self.elu_param = elu_param
        self.device = device  # no-op: XLA owns placement on TPU
        self.model_selection = model_selection
        self.val_eval_every = val_eval_every
        self.val_k = val_k
        self.val_metric = val_metric
        self.batch_size = batch_size
        self.seed = seed
        self.mesh = mesh
        self.rng = get_rng(seed)

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        if not self.trainable:
            return self

        # (user, prev, next) transitions from every session
        item_arr = train_set.uir_tuple[1]
        user_arr = train_set.uir_tuple[0]
        users, prevs, nexts = [], [], []
        for sid, idx_list in train_set.sessions.items():
            items = [int(item_arr[i]) for i in idx_list]
            u = int(user_arr[idx_list[0]])
            for a, b in zip(items[:-1], items[1:]):
                users.append(u)
                prevs.append(a)
                nexts.append(b)
        if not users:
            raise ValueError("No transitions to train on.")

        d = self.embedding_dim
        params = {
            "V_UI": jnp.asarray(
                normal((self.total_users, d), std=0.01, random_state=self.rng)
            ),
            "V_IU": jnp.asarray(
                normal((self.total_items, d), std=0.01, random_state=self.rng)
            ),
            "V_IL": jnp.asarray(
                normal((self.total_items, d), std=0.01, random_state=self.rng)
            ),
            "V_LI": jnp.asarray(
                normal((self.total_items, d), std=0.01, random_state=self.rng)
            ),
        }

        n = len(users)
        # the fused per-sample SGD program is single-device; mesh training
        # routes through the data-parallel minibatch path (fused_path=False
        # forces the general form for exact mesh-vs-single comparisons)
        if (
            self.loss == "bpr"
            and self.momentum == 0.0
            and self.mesh is None
            and getattr(self, "fused_path", True)
        ):
            params, _ = _fpmc_epochs(
                params,
                jax.random.PRNGKey(self.rng.randint(2**31)),
                jnp.asarray(users, dtype=jnp.int32),
                jnp.asarray(prevs, dtype=jnp.int32),
                jnp.asarray(nexts, dtype=jnp.int32),
                jnp.float32(self.learning_rate),
                jnp.float32(self.lambda_reg),
                batch_size=min(self.batch_size, n),
                num_items=self.num_items,
                n_epochs=jnp.int32(self.n_epochs),
            )
            self.params = {k: np.asarray(v) for k, v in params.items()}
            return self

        self._fit_general(params, users, prevs, nexts, train_set, val_set)
        return self

    def _fit_general(self, params, users, prevs, nexts, train_set, val_set):
        """Reference loss family over transitions (in-batch + sampled
        negatives via the concatenated-embedding identity)."""
        n = len(users)
        bsz = min(self.batch_size, n)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_pad = (-n) % bsz
        u_arr = np.concatenate([users, np.zeros(n_pad, np.int64)]).astype(np.int32)
        p_arr = np.concatenate([prevs, np.zeros(n_pad, np.int64)]).astype(np.int32)
        t_arr = np.concatenate([nexts, np.zeros(n_pad, np.int64)]).astype(np.int32)
        m_arr = np.concatenate(
            [np.ones(n, np.float32), np.zeros(n_pad, np.float32)]
        )
        n_batches = u_arr.shape[0] // bsz

        # reference IndexedAdagradM semantics (zero-init accumulator)
        optimizer = adagrad_m(self.learning_rate, self.momentum)
        opt_state = optimizer.init(params)

        loss_kind = self.loss
        n_sample = self.n_sample
        bpreg, elu_param, reg = self.bpreg, self.elu_param, self.lambda_reg
        cum_probs = neg_sampling_table(train_set, self.sample_alpha, self.num_items)

        def loss_fn(prm, u, p, t, m, key):
            state = jnp.concatenate(
                [prm["V_UI"][u], prm["V_LI"][p]], axis=1
            )[:, None, :]
            out_emb = jnp.concatenate([prm["V_IU"], prm["V_IL"]], axis=1)
            negs = sample_negatives(key, cum_probs, (n_sample,))
            loss = batch_loss(
                loss_kind,
                state,
                out_emb,
                None,
                t[:, None],
                m[:, None],
                negs,
                bpreg=bpreg,
                elu_param=elu_param,
            )
            if reg > 0:
                loss = loss + reg * (
                    jnp.sum(prm["V_UI"][u] ** 2 * m[:, None])
                    + jnp.sum(prm["V_LI"][p] ** 2 * m[:, None])
                ) / jnp.maximum(jnp.sum(m), 1.0)
            return loss

        u_d, p_d, t_d, m_d = (
            jnp.asarray(u_arr),
            jnp.asarray(p_arr),
            jnp.asarray(t_arr),
            jnp.asarray(m_arr),
        )

        # data-parallel over the mesh (same treatment as SASRec): params
        # and optimizer replicated, each minibatch sharded across devices,
        # GSPMD psums the gradients
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(self.mesh, P(tuple(self.mesh.axis_names)))
            params, opt_state, u_d, p_d, t_d, m_d = replicate_all(
                self.mesh, params, opt_state, u_d, p_d, t_d, m_d
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs):
            def epoch(e, carry):
                params, opt_state, _ = carry
                ekey = jax.random.fold_in(key, e)
                order = jax.random.permutation(ekey, u_d.shape[0])

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    idx = jax.lax.dynamic_slice(order, (b * bsz,), (bsz,))
                    ub, pb, tb, mb = u_d[idx], p_d[idx], t_d[idx], m_d[idx]
                    if batch_shard is not None:
                        ub, pb, tb, mb = (
                            jax.lax.with_sharding_constraint(x, batch_shard)
                            for x in (ub, pb, tb, mb)
                        )
                    loss, grads = jax.value_and_grad(loss_fn)(
                        params,
                        ub,
                        pb,
                        tb,
                        mb,
                        jax.random.fold_in(ekey, b),
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

        key = jax.random.PRNGKey(self.rng.randint(2**31))
        select_best = self.model_selection == "best" and val_set is not None
        chunk = self.val_eval_every if select_best else self.n_epochs
        best_score, best_params = -np.inf, None
        done = 0
        while done < self.n_epochs:
            e = min(chunk, self.n_epochs - done)
            params, opt_state, loss_sum = run_epochs(
                params, opt_state, jax.random.fold_in(key, done), e
            )
            done += e
            if self.verbose:
                print(
                    "Epoch %d/%d, loss: %.4f"
                    % (done, self.n_epochs, float(loss_sum) / n_batches)
                )
            if select_best:
                self.params = {k: np.asarray(v) for k, v in params.items()}
                score = val_score(
                    self, train_set, val_set, self.val_metric, self.val_k
                )
                if score > best_score:
                    best_score = score
                    best_params = dict(self.params)
        if select_best and best_params is not None:
            self.params = best_params
        else:
            self.params = {k: np.asarray(v) for k, v in params.items()}

    def score(self, user_idx, history_items, **kwargs):
        users = np.asarray([user_idx])
        return self.score_history_batch(users, [list(history_items)])[0]

    def score_history_batch(self, user_indices, histories):
        users = np.asarray(user_indices, dtype=np.int32)
        users = np.clip(users, 0, self.total_users - 1)
        lasts = np.asarray(
            [int(h[-1]) if len(h) else 0 for h in histories], dtype=np.int32
        )
        has_last = np.asarray(
            [1.0 if len(h) else 0.0 for h in histories], dtype=np.float32
        )
        scores = _fpmc_scores(
            jnp.asarray(self.params["V_UI"]),
            jnp.asarray(self.params["V_IU"]),
            jnp.asarray(self.params["V_IL"]),
            jnp.asarray(self.params["V_LI"]),
            jnp.asarray(users),
            jnp.asarray(lasts),
            jnp.asarray(has_last),
        )
        return np.asarray(scores, dtype=np.float64)[:, : self.num_items]
