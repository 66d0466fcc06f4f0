"""Native reference-semantics baselines for head-to-head benchmarks.

``make_ref_bpr(refcornac_models)`` returns a class implementing the
reference's BPR (``cornac/models/bpr/recom_bpr.pyx:66``) on the reference's
own ``Recommender`` base, with the Cython SGD kernel replaced by a
semantics-faithful C++/OpenMP build (``bpr_ref.cpp``, compiled on first
use) — this environment has no Cython, so the reference's extension cannot
be compiled directly. Python-level flow mirrors the reference: same
factor init draws, seeded runs force one thread, numpy dot scoring
(the reference scores through BLAS ``fast_dot``).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bpr_ref.cpp")
_SO = os.path.join(_DIR, "_bpr_ref.so")
_LIB = None


def load_kernel():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-ffast-math", "-fopenmp", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
    lib = ctypes.CDLL(_SO)
    lib.bpr_fit_sgd.restype = ctypes.c_longlong
    lib.bpr_fit_sgd.argtypes = [
        ctypes.POINTER(ctypes.c_int32),  # indptr
        ctypes.POINTER(ctypes.c_int32),  # item_ids
        ctypes.POINTER(ctypes.c_int32),  # user_ids
        ctypes.c_longlong,               # num_samples
        ctypes.c_longlong,               # n_items
        ctypes.POINTER(ctypes.c_float),  # U
        ctypes.POINTER(ctypes.c_float),  # V
        ctypes.POINTER(ctypes.c_float),  # B
        ctypes.c_int32,                  # k
        ctypes.c_float,                  # lr
        ctypes.c_float,                  # reg
        ctypes.c_int32,                  # use_bias
        ctypes.c_uint32,                 # seed_pos
        ctypes.c_uint32,                 # seed_neg
        ctypes.c_int32,                  # num_threads
        ctypes.c_int32,                  # epochs
    ]
    _LIB = lib
    return lib


def make_ref_bpr(models_ns):
    """Build the reference-semantics BPR class on refcornac's Recommender."""
    import multiprocessing

    Recommender = models_ns.recommender.Recommender
    from refcornac.utils.common import get_rng
    from refcornac.utils.init_utils import uniform, zeros

    class BPRRefNative(Recommender):
        """Reference BPR with the Cython kernel as native C++ (same
        algorithm, hogwild OpenMP, per-thread mt19937)."""

        def __init__(self, name="BPR", k=10, max_iter=100, learning_rate=0.001,
                     lambda_reg=0.01, use_bias=True, num_threads=0,
                     trainable=True, verbose=False, init_params=None,
                     seed=None):
            super().__init__(name=name, trainable=trainable, verbose=verbose)
            self.k = int(k)
            self.max_iter = max_iter
            self.learning_rate = learning_rate
            self.lambda_reg = lambda_reg
            self.use_bias = use_bias
            self.seed = seed
            self.rng = get_rng(seed)
            if seed is not None:
                self.num_threads = 1  # reference: seeded => deterministic
            elif num_threads > 0:
                self.num_threads = num_threads
            else:
                self.num_threads = multiprocessing.cpu_count()
            init_params = {} if init_params is None else init_params
            self.u_factors = init_params.get("U", None)
            self.i_factors = init_params.get("V", None)
            self.i_biases = init_params.get("Bi", None)

        def _init(self):
            n_users, n_items = self.total_users, self.total_items
            if self.u_factors is None:
                self.u_factors = (
                    uniform((n_users, self.k), random_state=self.rng,
                            dtype=np.float32) - 0.5
                ) / self.k
            if self.i_factors is None:
                self.i_factors = (
                    uniform((n_items, self.k), random_state=self.rng,
                            dtype=np.float32) - 0.5
                ) / self.k
            if self.i_biases is None or self.use_bias is False:
                self.i_biases = zeros(n_items, dtype=np.float32)

        def fit(self, train_set, val_set=None):
            Recommender.fit(self, train_set, val_set)
            self._init()
            if not self.trainable:
                return self

            X = train_set.matrix.tocsr()
            X.sort_indices()
            indptr = X.indptr.astype(np.int32)
            item_ids = X.indices.astype(np.int32)
            user_ids = np.repeat(
                np.arange(train_set.num_users), np.ediff1d(X.indptr)
            ).astype(np.int32)

            lib = load_kernel()
            U = np.ascontiguousarray(self.u_factors, dtype=np.float32)
            V = np.ascontiguousarray(self.i_factors, dtype=np.float32)
            B = np.ascontiguousarray(self.i_biases, dtype=np.float32)
            p32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            pf = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            lib.bpr_fit_sgd(
                p32(indptr), p32(item_ids), p32(user_ids),
                len(user_ids), train_set.num_items,
                pf(U), pf(V), pf(B),
                self.k, np.float32(self.learning_rate),
                np.float32(self.lambda_reg), int(self.use_bias),
                np.uint32(self.rng.randint(2**31)),
                np.uint32(self.rng.randint(2**31)),
                self.num_threads, self.max_iter,
            )
            self.u_factors, self.i_factors, self.i_biases = U, V, B
            return self

        def score(self, user_idx, item_idx=None):
            if item_idx is None:
                return self.i_biases + self.i_factors @ self.u_factors[user_idx]
            return (
                self.i_biases[item_idx]
                + self.i_factors[item_idx] @ self.u_factors[user_idx]
            )

    return BPRRefNative
