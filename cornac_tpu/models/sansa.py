"""SANSA — scalable EASE with a sparse approximate inverse
(Spišák et al., RecSys 2023).

Capability parity with reference ``cornac/models/sansa/recom_sansa.py:9``,
which wraps the external ``sansa`` package. This is an in-house
implementation of the actual algorithm, not the exact-EASE stopgap:

1. (ICF only) equilibrate the Gramian by fourth-root column norms
   (reference ``recom_sansa.py:163-170``),
2. fill-reducing permutation + LDL^T factorization pruned to
   ``weight_matrix_density`` — incomplete with on-the-fly pruning
   (``factorizer_class="ICF"``, with the diagonal-shift breakdown
   escalation) or exact-then-pruned (``"CHOLMOD"`` semantics)
   (reference ``recom_sansa.py:181-190``),
3. UMR approximate inverse of the unit lower-triangular factor
   (``inverter_scans`` full passes + ``inverter_finetune_steps``
   worst-column repairs, reference ``recom_sansa.py:152-156,195-197``),
4. assemble the factored EASE weights ``W1 = W.T``, ``W2 = -W/d/diag``
   exactly as reference ``recom_sansa.py:199-221``.

The factorization/inversion are host float64 setup ops (sequential
dependency chains, same placement as the reference's CHOLMOD/ICF);
scoring flows through the sparse factored weights.
"""

import numpy as np
import scipy.sparse as sp

from ..exception import ScoreException
from ..ops.sparse_chol import (
    equilibrate_columns,
    exact_ldlt_pruned,
    icf_ldlt,
    rcm_permutation,
    umr_inverse,
)
from .recommender import ANNMixin, MEASURE_DOT, Recommender


class SANSA(Recommender, ANNMixin):
    """Sparse item-item linear autoencoder with factored weights
    ``score(X) = X @ W1 @ W2`` where ``W1 @ W2 = B_EASE - I`` approximately
    (the -I only shifts already-seen items, which ranking excludes)."""

    def __init__(
        self,
        name="SANSA",
        l2=1.0,
        weight_matrix_density=1e-3,
        compute_gramian=True,
        factorizer_class="ICF",
        factorizer_shift_step=1e-3,
        factorizer_shift_multiplier=2.0,
        inverter_scans=3,
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
        self._W_cache = None
        if W1 is not None and W2 is not None:
            self.U = self.X

    @property
    def W(self):
        """Materialized item-item weight matrix (lazy; only needed by the
        ANN item-vector API — scoring stays in the factored form)."""
        if self._W_cache is None and self.weights[0] is not None:
            self._W_cache = (self.weights[0] @ self.weights[1]).tocsr()
        return self._W_cache

    def forward(self, X):
        """Sparse forward pass through the factored weights
        (reference ``recom_sansa.py:222-228``)."""
        return X @ self.weights[0] @ self.weights[1]

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        self.U = train_set.matrix
        self.X = train_set.matrix.astype(np.float32)
        self._W_cache = None

        X = self.X
        density = float(np.clip(self.weight_matrix_density, 0.0, 1.0))
        icf = str(self.factorizer_class).upper() != "CHOLMOD"

        # Gramian (or the item-item matrix itself when compute_gramian=False),
        # with the ICF equilibration applied in X-space like the reference
        if self.compute_gramian:
            if icf:
                gram = (X.T @ X).tocsr()
                da = equilibrate_columns(
                    np.asarray(gram.multiply(gram).sum(axis=1)).ravel()
                )
                X = X @ sp.diags(1.0 / da)
            A_sp = (X.T @ X).tocsr()
        else:
            A_sp = X.tocsr()
            if icf:
                da = equilibrate_columns(
                    np.asarray(A_sp.multiply(A_sp).sum(axis=1)).ravel()
                )
                scale = sp.diags(1.0 / da)
                A_sp = (scale @ A_sp @ scale).tocsr()

        n = A_sp.shape[0]
        if n > 32768:
            raise ValueError(
                "SANSA's host factorization densifies the permuted Gramian "
                f"(O(n_items^2) float64): {n} items would need "
                f"~{8 * n * n / 2**30:.1f} GiB. This implementation is "
                "gated to catalogs <= 32768 items; use EASE or a factor "
                "model for larger catalogs."
            )
        p = rcm_permutation(A_sp)
        A = A_sp[p][:, p].toarray().astype(np.float64)
        A[np.diag_indices(n)] += float(self.l2)

        if self.verbose:
            print("Computing LDL^T decomposition of permuted item-item matrix...")
        if icf:
            L, d = icf_ldlt(
                A,
                density,
                shift_step=self.factorizer_shift_step,
                shift_multiplier=self.factorizer_shift_multiplier,
                verbose=self.verbose,
            )
        else:
            L, d = exact_ldlt_pruned(A, density)

        if self.verbose:
            print("Computing approximate inverse of L...")
        L_inv = umr_inverse(
            L,
            density,
            scans=self.inverter_scans,
            finetune_steps=self.inverter_finetune_steps,
        )

        # assemble W1/W2 exactly as reference recom_sansa.py:199-221:
        # A^{-1} = W.T @ diag(1/d) @ W with W = L_inv column-unpermuted
        inv_p = np.argsort(p)
        W = L_inv[:, inv_p].tocsc()
        W_r = W.copy()
        W_r.data = W_r.data / d[W_r.indices]  # row scale by 1/d
        diag = np.asarray(W.multiply(W_r).sum(axis=0)).ravel()  # diag(A^{-1})
        diag[diag == 0] = 1.0
        # column scale by -1/diag: columns of B = -A^{-1} diagMat(1/diag)
        W_r = (W_r @ sp.diags(-1.0 / diag)).tocsc()
        self.weights = (W.T.tocsr(), W_r.tocsr())
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        x = self.U[user_idx, :]
        # W1 @ W2 factors B_EASE - I; add the interaction row back so seen
        # items score under EASE semantics (unseen items have x == 0, so the
        # ranking over candidates is bit-identical to reference
        # recom_sansa.py:254, which scores X @ (B - I))
        row = np.asarray((self.forward(x) + x).todense()).ravel()
        if self.use_absolute_value_scores:
            row = np.abs(row)
        return row if item_idx is None else row[item_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        rows = self.U[np.where(known, users, 0)]
        scores = np.asarray(
            (self.forward(rows) + rows).todense(), dtype=np.float64
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
        # factored form: score(u, i) = (X @ W1)[u] . W2[:, i]
        # (reference recom_sansa.py:279; dense — ANN backends reject sparse)
        return np.asarray((self.U @ self.weights[0]).todense(), dtype=np.float32)

    def get_item_vectors(self):
        return np.asarray(self.weights[1].T.todense(), dtype=np.float32)
