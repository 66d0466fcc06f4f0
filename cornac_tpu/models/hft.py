"""HFT — Hidden Factors and Hidden Topics (McAuley & Leskovec, RecSys 2013).

Capability parity with reference ``cornac/models/hft/recom_hft.py:26`` +
``hft/hft.py`` (numpy: L-BFGS over the rating/corpus objective, per-word
Python Gibbs sweep). Redesign notes:

- The word-topic sampling distribution depends only on the current
  parameters (``hft.py:125-150``), so the Gibbs sweep is conditionally
  independent across words: we sample ALL assignments in one vectorized
  categorical draw and rebuild the count tables with scatter-adds —
  replacing the O(total_words) Python loop.
- The L-BFGS objective/gradient is fully vectorized with segment
  (scatter-add) operations instead of per-user/per-item loops.
"""

import numpy as np
import scipy.optimize as opt

from ..exception import ScoreException
from ..utils import get_rng
from ..utils.init_utils import normal
from .recommender import ANNMixin, MEASURE_DOT, Recommender


class HFT(Recommender, ANNMixin):
    """Topic-coupled biased MF over item review text."""

    def __init__(
        self,
        name="HFT",
        k=10,
        max_iter=50,
        grad_iter=50,
        lambda_text=0.1,
        l2_reg=0.001,
        vocab_size=8000,
        init_params=None,
        trainable=True,
        verbose=True,
        seed=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.max_iter = max_iter
        self.grad_iter = grad_iter
        self.lambda_text = lambda_text
        self.l2_reg = l2_reg
        self.vocab_size = vocab_size
        self.seed = seed

        self.init_params = {} if init_params is None else init_params
        self.alpha = self.init_params.get("alpha", None)
        self.beta_u = self.init_params.get("beta_u", None)
        self.beta_i = self.init_params.get("beta_i", None)
        self.gamma_u = self.init_params.get("gamma_u", None)
        self.gamma_i = self.init_params.get("gamma_i", None)

    def _init(self):
        rng = get_rng(self.seed)
        if self.alpha is None:
            self.alpha = self.global_mean
        if self.beta_u is None:
            self.beta_u = normal(self.num_users, std=0.01, random_state=rng)
        if self.beta_i is None:
            self.beta_i = normal(self.num_items, std=0.01, random_state=rng)
        if self.gamma_u is None:
            self.gamma_u = normal((self.num_users, self.k), std=0.01, random_state=rng)
        if self.gamma_i is None:
            self.gamma_i = normal((self.num_items, self.k), std=0.01, random_state=rng)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.item_text is None:
            raise ValueError("this model needs the item_text modality attached to the eval method")
        self._init()
        if self.trainable:
            self._fit_hft(train_set)
        return self

    def _fit_hft(self, train_set):
        rng = get_rng(self.seed)
        k = self.k

        bow = train_set.item_text.batch_bow(
            np.arange(self.num_items), keep_sparse=True
        ).tocsr()
        n_vocab = bow.shape[1]

        # flattened corpus: one entry per (item, unique word) pair
        doc_item = np.repeat(np.arange(self.num_items), np.diff(bow.indptr))
        doc_word = bow.indices.astype(np.int64)
        total_words = len(doc_word)
        if total_words == 0:
            raise ValueError("Empty corpus: no item text available.")

        item_word_cnt = np.diff(bow.indptr).astype(np.float64)[:, None]

        # initial random topic assignment + count tables
        topics = rng.randint(k, size=total_words)
        word_topic_cnt = np.zeros((n_vocab, k))
        np.add.at(word_topic_cnt, (doc_word, topics), 1)
        item_topic_cnt = np.zeros((self.num_items, k))
        np.add.at(item_topic_cnt, (doc_item, topics), 1)
        topic_cnt = np.bincount(topics, minlength=k).astype(np.float64)[None, :]
        background_word = np.zeros((n_vocab, 1))
        np.add.at(background_word, (doc_word,), 1)
        background_word /= total_words

        u_idx, i_idx, r_val = train_set.uir_tuple

        kappa = 1.0
        topic_word = np.zeros((n_vocab, k))

        def pack(alpha, kappa, beta_u, beta_i, gamma_u, gamma_i, topic_word):
            return np.concatenate(
                [
                    [alpha],
                    [kappa],
                    beta_u,
                    beta_i,
                    gamma_u.ravel(),
                    gamma_i.ravel(),
                    topic_word.ravel(),
                ]
            )

        def unpack(x):
            idx = np.cumsum(
                [1, 1, self.num_users, self.num_items,
                 self.num_users * k, self.num_items * k]
            )
            return (
                x[0],
                x[1],
                x[idx[1] : idx[2]],
                x[idx[2] : idx[3]],
                x[idx[3] : idx[4]].reshape(self.num_users, k),
                x[idx[4] : idx[5]].reshape(self.num_items, k),
                x[idx[5] :].reshape(n_vocab, k),
            )

        params = pack(
            self.alpha, kappa, self.beta_u, self.beta_i, self.gamma_u,
            self.gamma_i, topic_word,
        )

        def objective(x):
            alpha, kap, beta_u, beta_i, gamma_u, gamma_i, t_word = unpack(x)
            grad = np.zeros_like(x)
            (dalpha_v, dkappa_v, dbeta_u, dbeta_i, dgamma_u, dgamma_i, dt_word) = (
                unpack(grad)
            )

            pred = (
                alpha
                + beta_u[u_idx]
                + beta_i[i_idx]
                + np.sum(gamma_u[u_idx] * gamma_i[i_idx], axis=1)
            )
            err = pred - r_val
            cf_loss = np.sum(err**2)

            dalpha = 2 * np.sum(err)
            np.add.at(dbeta_u, u_idx, 2 * err)
            np.add.at(dbeta_i, i_idx, 2 * err)
            np.add.at(dgamma_u, u_idx, 2 * err[:, None] * gamma_i[i_idx])
            np.add.at(dgamma_i, i_idx, 2 * err[:, None] * gamma_u[u_idx])

            reg_loss = 0.0
            if self.l2_reg > 0:
                reg_loss = self.l2_reg * (np.sum(gamma_u**2) + np.sum(gamma_i**2))
                dgamma_u += 2 * self.l2_reg * gamma_u
                dgamma_i += 2 * self.l2_reg * gamma_i

            e_theta = np.exp(kappa * gamma_i)
            t_z = e_theta.sum(axis=1, keepdims=True)
            corpus_ll = self.lambda_text * np.sum(
                item_topic_cnt * (kappa * gamma_i - np.log(t_z))
            )
            e_phi = np.exp(background_word + t_word)
            word_z = e_phi.sum(axis=0, keepdims=True)
            corpus_ll += self.lambda_text * np.sum(
                word_topic_cnt * (background_word + t_word - np.log(word_z))
            )

            q = -self.lambda_text * (item_topic_cnt - item_word_cnt * e_theta / t_z)
            dgamma_i += kappa * q
            dkappa = np.sum(gamma_i * q)
            dt_word += -self.lambda_text * (
                word_topic_cnt - topic_cnt * e_phi / word_z
            )

            grad[0] = dalpha
            grad[1] = dkappa
            return cf_loss + reg_loss - corpus_ll, grad

        for it in range(self.max_iter):
            # vectorized parallel Gibbs sweep: scores independent of counts
            _, kap, _, _, _, gamma_i, t_word = unpack(params)
            logits = (
                kap * gamma_i[doc_item]
                + background_word[doc_word]
                + t_word[doc_word]
            )
            logits -= logits.max(axis=1, keepdims=True)
            probs = np.exp(logits)
            probs /= probs.sum(axis=1, keepdims=True)
            cdf = probs.cumsum(axis=1)
            draws = rng.rand(total_words, 1)
            topics = (draws > cdf).sum(axis=1)

            word_topic_cnt.fill(0)
            np.add.at(word_topic_cnt, (doc_word, topics), 1)
            item_topic_cnt.fill(0)
            np.add.at(item_topic_cnt, (doc_item, topics), 1)
            topic_cnt = np.bincount(topics, minlength=k).astype(np.float64)[None, :]

            # re-center topic_word into background (reference hft.py:152-155)
            avg = t_word.sum(axis=1, keepdims=True) / k
            t_word = t_word - avg
            background_word = background_word + avg
            params = pack(*unpack(params)[:6], t_word)

            res = opt.fmin_l_bfgs_b(objective, x0=params, maxiter=self.grad_iter)
            params = res[0]
            if self.verbose:
                print("Iter %d/%d, loss: %.2f" % (it + 1, self.max_iter, res[1]))

        self.alpha, _, self.beta_u, self.beta_i, self.gamma_u, self.gamma_i, _ = (
            unpack(params)
        )
        self.alpha = float(self.alpha)

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        if item_idx is None:
            return (
                self.alpha
                + self.beta_u[user_idx]
                + self.beta_i
                + self.gamma_i @ self.gamma_u[user_idx]
            )
        return (
            self.alpha
            + self.beta_u[user_idx]
            + self.beta_i[item_idx]
            + self.gamma_i[item_idx] @ self.gamma_u[user_idx]
        )

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        scores = (
            self.alpha
            + self.beta_u[safe][:, None]
            + self.beta_i[None, :]
            + self.gamma_u[safe] @ self.gamma_i.T
        )
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
        u_safe, i_safe = np.where(known, users, 0), np.where(known, items, 0)
        preds = (
            self.alpha
            + self.beta_u[u_safe]
            + self.beta_i[i_safe]
            + np.sum(self.gamma_u[u_safe] * self.gamma_i[i_safe], axis=1)
        )
        return np.where(known, preds, self.default_score())

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return np.concatenate(
            (self.gamma_u, self.beta_u.reshape(-1, 1), np.ones((self.num_users, 1))),
            axis=1,
        )

    def get_item_vectors(self):
        return np.concatenate(
            (self.gamma_i, np.ones((self.num_items, 1)), self.beta_i.reshape(-1, 1)),
            axis=1,
        )
