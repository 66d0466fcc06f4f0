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
