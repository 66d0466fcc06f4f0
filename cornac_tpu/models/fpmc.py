"""FPMC — Factorized Personalized Markov Chains (Rendle et al., WWW 2010).

Capability parity with reference ``cornac/models/fpmc/recom_fpmc.py:36``
(torch, BPR-family losses over (user, prev item, next item) transitions).
TPU design: the classic four-embedding FPMC factorization

    score(u, last, i) = <V_UI[u], V_IU[i]> + <V_IL[i], V_LI[last]>

trained with BPR on sampled transitions — the whole fit is one fused
multi-epoch device program like BPR.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import get_rng
from ..utils.init_utils import normal
from .recommender import NextItemRecommender
from .seq_utils import pad_histories


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
        n_epochs=10,
        learning_rate=0.01,
        lambda_reg=0.001,
        batch_size=1024,
        trainable=True,
        verbose=False,
        seed=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.embedding_dim = embedding_dim
        self.n_epochs = n_epochs
        self.learning_rate = learning_rate
        self.lambda_reg = lambda_reg
        self.batch_size = batch_size
        self.seed = seed
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
