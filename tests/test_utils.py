"""Utils-layer tests (mirrors reference tests/cornac/utils/test_fastdot.py)."""

import numpy as np
import numpy.testing as npt

from cornac_tpu.utils import fast_dot


class TestFastDot:
    def test_fast_dot_f32(self):
        vec = np.ones(2, dtype=np.float32)
        mat = np.ones((2, 2), dtype=np.float32)
        output = np.zeros(mat.shape[0], dtype=np.float32)
        fast_dot(vec, mat, output)
        npt.assert_array_equal(np.asarray([2, 2]), output)

    def test_fast_dot_f64_accumulates(self):
        vec = np.asarray([1, 2], dtype=np.double)
        mat = np.asarray([[1, 2], [3, 4]], dtype=np.double)
        output = np.zeros(mat.shape[0], dtype=np.double)
        fast_dot(vec, mat, output)
        npt.assert_array_equal(np.asarray([5, 11]), output)
        # in-place accumulation, not overwrite
        fast_dot(vec, mat, output)
        npt.assert_array_equal(np.asarray([10, 22]), output)


class TestMembership:
    """Bitmap (row-major packed words) and CSR binary-search strategies must
    agree on every query, including item indices in the last partial word."""

    def _check(self, n_users, n_items, density, seed):
        import jax.numpy as jnp
        import scipy.sparse as sp

        from cornac_tpu.ops.membership import build_membership

        rng = np.random.RandomState(seed)
        nnz = int(n_users * n_items * density)
        r = rng.randint(0, n_users, nnz)
        c = rng.randint(0, n_items, nnz)
        M = sp.csr_matrix(
            (np.ones(nnz, np.float32), (r, c)), shape=(n_users, n_items)
        )
        M.data[:] = 1.0
        M.sort_indices()
        bm = build_membership(M, bitmap_max_bytes=1 << 30)
        bt = build_membership(M, bitmap_max_bytes=0)
        cs = build_membership(M, bitmap_max_bytes=0, btree_max_degree=-1)
        assert bm.kind == "bitmap" and bt.kind == "btree" and cs.kind == "csr"
        q = 5000
        users = jnp.asarray(rng.randint(0, n_users, q), jnp.int32)
        items = jnp.asarray(rng.randint(0, n_items, q), jnp.int32)
        expected = np.asarray(
            M[np.asarray(users), np.asarray(items)]
        ).ravel().astype(bool)
        for m in (bm, bt, cs):
            npt.assert_array_equal(np.asarray(m.query(users, items)), expected)
        # the stored pairs themselves must all be members under every kind
        nz = rng.permutation(len(r))[:q]
        un = jnp.asarray(r[nz], jnp.int32)
        it = jnp.asarray(c[nz], jnp.int32)
        for m in (bm, bt, cs):
            assert bool(np.asarray(m.query(un, it)).all())

    def test_word_aligned_items(self):
        self._check(97, 64, 0.05, 0)

    def test_partial_last_word(self):
        # n_items % 32 != 0: per-row padding bits must never read as set
        self._check(53, 45, 0.1, 1)

    def test_btree_degree_cap_falls_back_to_csr(self):
        """A user with degree beyond the 2-level b+tree cap (64*63) must
        push the builder to the CSR binary search."""
        import scipy.sparse as sp

        from cornac_tpu.ops.membership import build_membership

        n_items = 5000
        r = np.zeros(4100, np.int64)  # one mega-user, degree 4100 > 4032
        c = np.arange(4100, dtype=np.int64)
        M = sp.csr_matrix(
            (np.ones(len(r), np.float32), (r, c)), shape=(3, n_items)
        )
        m = build_membership(M, bitmap_max_bytes=0)
        assert m.kind == "csr"
        # and just under the cap builds the btree
        M2 = sp.csr_matrix(
            (np.ones(4000, np.float32), (r[:4000], c[:4000])),
            shape=(3, n_items),
        )
        m2 = build_membership(M2, bitmap_max_bytes=0)
        assert m2.kind == "btree"
        import jax.numpy as jnp

        q_u = jnp.asarray([0, 0, 1], jnp.int32)
        q_i = jnp.asarray([3999, 4000, 0], jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(m2.query(q_u, q_i)), [True, False, False]
        )

    def test_beyond_int32_cells(self):
        # 80k x 33k = 2.6G dense cells (> 2^31): the flat-key bitmap would
        # overflow int32; the row-major word index must not
        self._check(80_000, 33_000, 1e-5, 2)
