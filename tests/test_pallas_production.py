"""Production call sites of the Pallas kernels: dispatch policy, the fused
recommend_batch / TPUExactANN paths, and the KNN neighbor-table API —
each checked for exact equivalence with the reference-semantics host path
(kernels themselves run in XLA or interpret mode on CPU)."""

import numpy as np
import pytest

from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.models import MF, BPR, ItemKNN, TPUExactANN, UserKNN
from cornac_tpu.ops import dispatch


def _rs(seed=5, n_users=25, n_items=40):
    rng = np.random.RandomState(seed)
    seen = {(rng.randint(n_users), rng.randint(n_items)) for _ in range(600)}
    data = [(f"u{u}", f"i{i}", float(rng.randint(1, 6))) for u, i in seen]
    return RatioSplit(data=data, test_size=0.2, seed=seed, verbose=False)


@pytest.fixture(scope="module")
def split():
    return _rs()


class TestDispatch:
    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("CORNAC_TPU_PALLAS", "1")
        dispatch._reset_for_tests()
        assert dispatch.use_pallas() is True
        monkeypatch.setenv("CORNAC_TPU_PALLAS", "off")
        dispatch._reset_for_tests()
        assert dispatch.use_pallas() is False
        monkeypatch.delenv("CORNAC_TPU_PALLAS")
        dispatch._reset_for_tests()

    def test_auto_is_off_on_cpu(self, monkeypatch):
        monkeypatch.setenv("CORNAC_TPU_PALLAS", "auto")
        dispatch._reset_for_tests()
        assert dispatch.use_pallas() is False  # conftest forces CPU
        dispatch._reset_for_tests()


class TestFusedRecommendBatch:
    @pytest.mark.parametrize("make", [lambda: MF(k=6, max_iter=5, seed=3),
                                      lambda: BPR(k=6, max_iter=5, seed=3)])
    @pytest.mark.parametrize("remove_seen", [False, True])
    def test_device_path_matches_host(self, split, make, remove_seen):
        model = make().fit(split.train_set)
        users = [split.train_set.user_ids[i] for i in (0, 3, 7)]
        ts = split.train_set

        # the fused path must actually engage for dot-measure factor models
        uidx = np.array([model.uid_map[u] for u in users])
        assert model._topk_recommend_device(uidx, 5, False, ts) is not None

        fast = model.recommend_batch(users, k=5, remove_seen=remove_seen,
                                     train_set=ts)
        # host oracle: full score matrix + stable argsort (reference path)
        model_host = model._topk_recommend_device
        model._topk_recommend_device = lambda *a, **k: None
        slow = model.recommend_batch(users, k=5, remove_seen=remove_seen,
                                     train_set=ts)
        model._topk_recommend_device = model_host
        assert fast == slow

    def test_full_ranking_uses_host_path(self, split):
        model = MF(k=6, max_iter=5, seed=3).fit(split.train_set)
        users = [split.train_set.user_ids[0]]
        full = model.recommend_batch(users, k=-1)
        assert len(full[0]) == model.total_items


class TestTPUExactANN:
    @pytest.mark.parametrize("k", [3, 10])
    def test_dot_measure_matches_bruteforce(self, split, k):
        model = MF(k=6, max_iter=5, seed=3).fit(split.train_set)
        ann = TPUExactANN(model)
        ann.build_index()
        q = ann.user_vectors[:4]
        ids, dists = ann.knn_query(q, k=k)
        scores = q @ ann.item_vectors.T
        expect = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        assert (ids == expect).all()
        np.testing.assert_allclose(
            -dists, np.take_along_axis(scores, ids, axis=1), rtol=1e-5
        )


class TestKNNNeighbors:
    @pytest.mark.parametrize("cls,attr", [(UserKNN, "nearest_users"),
                                          (ItemKNN, "nearest_items")])
    @pytest.mark.parametrize("kwargs", [dict(), dict(weighting="bm25"),
                                        dict(amplify=2.0)])
    def test_matches_fitted_sim_mat(self, split, cls, attr, kwargs):
        model = cls(k=5, verbose=False, **kwargs).fit(split.train_set)
        ids, sims = getattr(model, attr)(num_neighbors=5)
        n = model.sim_mat.shape[0]
        assert ids.shape == (n, 5)
        # oracle: the fitted full similarity matrix, self excluded
        ref = model.sim_mat.copy()
        np.fill_diagonal(ref, -np.inf)
        for r in range(n):
            got = sims[r]
            exp = np.sort(ref[r])[::-1][:5]
            np.testing.assert_allclose(got, exp, atol=1e-4)

    def test_interpret_kernel_matches_xla(self, split):
        model = ItemKNN(k=4, verbose=False).fit(split.train_set)
        ids_x, sims_x = model.nearest_items(num_neighbors=4, force="xla")
        ids_p, sims_p = model.nearest_items(
            num_neighbors=4, force="pallas_interpret"
        )
        np.testing.assert_allclose(sims_x, sims_p, atol=1e-4)
        assert (ids_x == ids_p).mean() > 0.98  # ties may reorder

    def test_subset_rows(self, split):
        model = UserKNN(k=4, verbose=False).fit(split.train_set)
        ids_all, sims_all = model.nearest_users(num_neighbors=4)
        ids_sub, sims_sub = model.nearest_users([2, 5], num_neighbors=4)
        assert (ids_sub == ids_all[[2, 5]]).all()
        assert (sims_sub == sims_all[[2, 5]]).all()
