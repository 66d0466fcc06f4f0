"""In-place vector–matrix-rows dot accumulation.

API-parity equivalent of the reference's Cython BLAS kernel
(``cornac/utils/fast_dot.pyx:25-43``): ``output[i] += vec . mat[i]`` for
every row i. The reference parallelizes the row loop with OpenMP prange
over BLAS ``sdot/ddot``; here a single BLAS GEMV via ``np.dot`` does the
same work in one call (models on this framework score through the batched
device engine — this host helper exists for API compatibility with code
written against the reference, e.g. ``models/vbpr/recom_vbpr.py:297``).
"""

import numpy as np


def fast_dot(vec, mat, output):
    """Accumulate ``mat @ vec`` into ``output`` in place.

    Parameters mirror the reference: ``vec`` (d,), ``mat`` (n, d),
    ``output`` (n,) — all float32 or float64, ``output`` is modified
    in place and nothing is returned.
    """
    vec = np.asarray(vec)
    mat = np.asarray(mat)
    output += mat.dot(vec).astype(output.dtype, copy=False)
