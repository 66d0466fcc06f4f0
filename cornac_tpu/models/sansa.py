"""SANSA — scalable EASE with a sparse approximate inverse
(Spišák et al., RecSys 2023).

Capability parity with reference ``cornac/models/sansa/recom_sansa.py:9``,
which wraps the external ``sansa`` package (sparse approximate Cholesky
inverse of the Gramian). In-house approach (SURVEY §7's planned fallback):
compute the exact EASE weight matrix with a dense device solve — exact at
reference scales where the item-item Gram fits HBM — then sparsify W to the
requested ``weight_matrix_density`` by global magnitude thresholding, which
preserves SANSA's deployment benefit (a sparse scoring matrix) while being
exact-before-truncation. The approximate-Cholesky construction for
beyond-HBM catalogs is a documented future escalation, not silently
dropped.
"""

import numpy as np
import scipy.sparse as sp

from .ease import EASE, _ease_B
import jax.numpy as jnp

from ..exception import ScoreException
from .recommender import ANNMixin, MEASURE_DOT, Recommender


class SANSA(Recommender, ANNMixin):
    """Sparse item-item linear autoencoder."""

    def __init__(
        self,
        name="SANSA",
        l2=500.0,
        weight_matrix_density=1e-2,
        compute_gramian=True,
        factorizer_class="ICF",
        factorizer_shift_step=1e-3,
        factorizer_shift_multiplier=2.0,
        inverter_scans=1,
        inverter_finetune_steps=10,
        use_absolute_value_scores=False,
        trainable=True,
        verbose=True,
        seed=None,
        W1=None,
        W2=None,
        X=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.l2 = l2
        self.weight_matrix_density = weight_matrix_density
        self.compute_gramian = compute_gramian
        # factorizer/inverter knobs kept for API parity with the reference
        self.factorizer_class = factorizer_class
        self.factorizer_shift_step = factorizer_shift_step
        self.factorizer_shift_multiplier = factorizer_shift_multiplier
        self.inverter_scans = inverter_scans
        self.inverter_finetune_steps = inverter_finetune_steps
        self.use_absolute_value_scores = use_absolute_value_scores
        self.seed = seed
        # pre-fitted construction (reference recom_sansa.py:93-96,110):
        # weights[0]/weights[1] sparse factors and the interaction matrix
        self.X = (
            X.astype(np.float32) if X is not None and X.dtype != np.float32 else X
        )
        self.weights = (W1, W2)
        if W1 is not None and W2 is not None:
            self.U = self.X
            self.W = (W1 @ W2).tocsr()

    def forward(self, X):
        """Sparse forward pass through the factored weights
        (reference ``recom_sansa.py:222-228``)."""
        return X @ self.weights[0] @ self.weights[1]

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        self.U = train_set.matrix
        self.X = train_set.matrix.astype(np.float32)

        X = jnp.asarray(self.U.toarray(), dtype=jnp.float32)
        B = np.asarray(_ease_B(X, jnp.float32(self.l2)), dtype=np.float64)

        # sparsify to the requested density by global magnitude threshold
        density = float(np.clip(self.weight_matrix_density, 0.0, 1.0))
        keep = max(1, int(density * B.size))
        if keep < B.size:
            thresh = np.partition(np.abs(B).ravel(), B.size - keep)[B.size - keep]
            B = np.where(np.abs(B) >= thresh, B, 0.0)
        self.W = sp.csr_matrix(B)
        # factored form for reference-API parity (W = weights[0] @ weights[1])
        self.weights = (self.W, sp.identity(self.W.shape[0], format="csr"))
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        row = np.asarray((self.U[user_idx, :] @ self.W).todense()).ravel()
        if self.use_absolute_value_scores:
            row = np.abs(row)
        return row if item_idx is None else row[item_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = np.asarray(
            (self.U[np.where(known, users, 0)] @ self.W).todense(), dtype=np.float64
        )
        if self.use_absolute_value_scores:
            scores = np.abs(scores)
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
        return MEASURE_DOT

    def get_user_vectors(self):
        return self.U

    def get_item_vectors(self):
        return self.W
