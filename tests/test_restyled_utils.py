"""Direct pins for utility surfaces restyled in r5 (utils/common.py
normalize/scale/clip, data/graph.py degrees + kNN graph, data/reader.py
group-size filters, data/modality.py feature protocol) — each checked
against a straightforward numpy oracle so the house-style rewrites stay
semantically identical to the reference behavior they re-express."""

import numpy as np
import pytest
import scipy.sparse as sp

from cornac_tpu.data import GraphModality, Reader
from cornac_tpu.data.modality import FeatureModality
from cornac_tpu.utils import normalize
from cornac_tpu.utils.common import clip, scale


class TestNormalize:
    @pytest.mark.parametrize("norm", ["l1", "l2", "max"])
    @pytest.mark.parametrize("sparse", [False, True])
    def test_rows_unit_norm(self, norm, sparse):
        rng = np.random.RandomState(0)
        X = rng.rand(6, 9) * 5
        X[2] = 0.0  # all-zero row must pass through untouched
        reducer = {
            "l1": lambda m: np.abs(m).sum(axis=1),
            "l2": lambda m: np.sqrt((m**2).sum(axis=1)),
            "max": lambda m: m.max(axis=1),
        }[norm]
        expect = X / np.where(reducer(X) == 0, 1.0, reducer(X))[:, None]

        arg = sp.csr_matrix(X) if sparse else X
        out = normalize(arg, norm=norm, axis=1, copy=True)
        out = out.toarray() if sp.issparse(out) else out
        np.testing.assert_allclose(out, expect, rtol=1e-12)

    def test_axis0_normalizes_columns(self):
        X = np.array([[3.0, 0.0], [4.0, 2.0]])
        out = normalize(X, norm="l2", axis=0)
        np.testing.assert_allclose(np.sqrt((out**2).sum(axis=0)), [1.0, 1.0])

    def test_copy_false_dense_in_place(self):
        X = np.array([[3.0, 4.0]])
        out = normalize(X, norm="l2", axis=1, copy=False)
        np.testing.assert_allclose(out, [[0.6, 0.8]])
        np.testing.assert_allclose(X, [[0.6, 0.8]])  # mutated in place

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            normalize(np.ones((2, 2)), norm="l7")
        with pytest.raises(ValueError):
            normalize(np.ones(3))


class TestScaleClip:
    def test_scale_maps_range(self):
        v = np.array([0.0, 5.0, 10.0])
        np.testing.assert_allclose(scale(v, 1.0, 3.0), [1.0, 2.0, 3.0])

    def test_scale_degenerate_source(self):
        # all-equal inputs: treated as fraction of the single value
        np.testing.assert_allclose(scale(np.array([4.0, 4.0]), 0.0, 1.0), [1.0, 1.0])

    def test_clip_matches_numpy(self):
        v = np.array([-5.0, 0.5, 99.0, np.nan])
        got = clip(v, 0.0, 1.0)
        np.testing.assert_array_equal(got[:3], np.clip(v[:3], 0.0, 1.0))
        assert np.isnan(got[3])  # NaN passes through, as before r5


class TestGraphModality:
    def _built(self):
        edges = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 2.0), ("z", "a", 1.0)]
        g = GraphModality(data=edges)
        g.build(id_map={"a": 0, "b": 1, "c": 2})  # "z" edge must drop
        return g

    def test_matrix_and_triplets(self):
        g = self._built()
        assert g.matrix.shape == (3, 3)
        assert g.matrix[0, 2] == 2.0
        rows, cols, vals = g.get_train_triplet([0, 1], [1, 2])
        assert set(zip(rows.tolist(), cols.tolist())) == {(0, 1), (1, 2), (0, 2)}

    def test_node_degree_counts(self):
        g = self._built()
        deg = g.get_node_degree()
        # a: out-edges to b and c, no in-edges; c: two in-edges
        np.testing.assert_array_equal(deg[0], [0, 2])
        np.testing.assert_array_equal(deg[2], [2, 0])
        np.testing.assert_array_equal(deg[1], [1, 1])

    def test_from_feature_knn(self):
        # two well-separated clusters: neighbors stay inside each cluster
        rng = np.random.RandomState(1)
        feats = np.concatenate(
            [rng.rand(5, 8) + 10, -(rng.rand(5, 8) + 10)]
        ).astype(np.float32)
        g = GraphModality.from_feature(features=feats, k=2, symmetric=True)
        for i, j, _ in g.raw_data:
            assert (i < 5) == (j < 5), (i, j)
        # symmetric closure: every edge's reverse exists
        pairs = {(i, j) for i, j, _ in g.raw_data}
        assert all((j, i) in pairs for i, j in pairs)


class TestReaderGroupFilters:
    def _read(self, rows, **kwargs):
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write("\n".join("\t".join(map(str, r)) for r in rows))
            path = f.name
        return path

    def test_basket_size_window(self):
        rows = (
            [("u1", "b1", f"i{j}") for j in range(5)]
            + [("u1", "b2", "i0")]
            + [("u2", "b3", f"i{j}") for j in range(3)]
        )
        path = self._read(rows)
        got = Reader(min_basket_size=2, max_basket_size=4).read(path, fmt="UBI")
        baskets = {t[1] for t in got}
        assert baskets == {"b3"}  # b1 too big, b2 too small

    def test_min_basket_sequence(self):
        rows = [("u1", "b1", "i1"), ("u1", "b2", "i2"), ("u2", "b3", "i3")]
        path = self._read(rows)
        got = Reader(min_basket_sequence=2).read(path, fmt="UBI")
        assert {t[0] for t in got} == {"u1"}

    def test_top_freq_and_set_filters(self):
        rows = [("u1", "i1", 5.0)] * 3 + [("u2", "i2", 4.0), ("u3", "i1", 1.0)]
        path = self._read(rows)
        got = Reader(num_top_freq_user=1).read(path, fmt="UIR")
        assert {t[0] for t in got} == {"u1"}
        got = Reader(item_set=["i2"]).read(path, fmt="UIR")
        assert {t[1] for t in got} == {"i2"}


class TestFeatureModalityProtocol:
    def test_rejects_non_2d(self):
        with pytest.raises(ValueError):
            FeatureModality(features=np.ones(3))

    def test_batch_requires_build(self):
        with pytest.raises(ValueError):
            FeatureModality().batch_feature([0, 1])

    def test_normalized_build(self):
        m = FeatureModality(
            features=np.array([[2.0, 6.0], [4.0, 10.0]]), normalized=True
        )
        m.build(id_map=None)
        assert m.features.min() == 0.0
        assert m.features.max() <= 1.0
