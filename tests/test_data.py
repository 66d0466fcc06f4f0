"""Data-layer tests: Reader formats/filters, Dataset ID-mapping invariants,
iterators, negative sampling."""

import os

import numpy as np
import pytest

from cornac_tpu.data import BasketDataset, Dataset, Reader, SequentialDataset

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _uir_data():
    return Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")


class TestReader:
    def test_uir(self):
        data = _uir_data()
        assert len(data) == 150
        assert all(len(t) == 3 for t in data)
        assert isinstance(data[0][2], float)

    def test_uirt(self):
        data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIRT")
        assert all(len(t) == 4 for t in data)
        assert isinstance(data[0][3], int)

    def test_bin_threshold(self):
        data = Reader(bin_threshold=4.0).read(
            os.path.join(DATA_DIR, "rating.txt"), fmt="UIR"
        )
        assert all(t[2] == 1.0 for t in data)

    def test_min_freq_filters(self):
        data = Reader(min_user_freq=5).read(
            os.path.join(DATA_DIR, "rating.txt"), fmt="UIR"
        )
        from collections import Counter

        freq = Counter(u for u, i, r in data)
        assert min(freq.values()) >= 5

    def test_user_item_set(self):
        data = Reader(user_set={"user1", "user2"}).read(
            os.path.join(DATA_DIR, "rating.txt"), fmt="UIR"
        )
        assert {u for u, *_ in data} <= {"user1", "user2"}

    def test_ubit(self):
        data = Reader().read(os.path.join(DATA_DIR, "basket.txt"), fmt="UBIT")
        assert all(len(t) == 4 for t in data)

    def test_usit(self):
        data = Reader().read(os.path.join(DATA_DIR, "sequence.txt"), fmt="USIT")
        assert all(len(t) == 4 for t in data)

    def test_invalid_fmt(self):
        with pytest.raises(ValueError):
            Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="NOPE")


class TestDataset:
    def test_build_id_maps(self):
        data = _uir_data()
        ds = Dataset.from_uir(data, seed=42)
        assert ds.num_users == 15
        assert ds.num_items == 20
        assert ds.num_ratings == 150
        # dense prefix invariant: indices are 0..n-1 in first-seen order
        assert sorted(ds.uid_map.values()) == list(range(15))
        assert sorted(ds.iid_map.values()) == list(range(20))

    def test_global_map_prefix_order(self):
        """Entities first seen in train occupy the dense-index prefix."""
        from collections import OrderedDict

        g_u, g_i = OrderedDict(), OrderedDict()
        train = [("a", "x", 1.0), ("b", "y", 2.0)]
        test = [("a", "z", 3.0), ("c", "x", 4.0)]
        tr = Dataset.build(train, global_uid_map=g_u, global_iid_map=g_i)
        te = Dataset.build(test, global_uid_map=g_u, global_iid_map=g_i)
        assert tr.uid_map["a"] == 0 and tr.uid_map["b"] == 1
        assert te.uid_map["c"] == 2  # unknown user gets tail index
        assert te.iid_map["z"] == 2  # unknown item gets tail index
        assert te.num_users == 3 and te.num_items == 3

    def test_dedup_warning(self):
        data = [("a", "x", 1.0), ("a", "x", 2.0), ("b", "x", 1.0)]
        with pytest.warns(UserWarning):
            ds = Dataset.from_uir(data)
        assert ds.num_ratings == 2

    def test_matrix_views(self):
        ds = Dataset.from_uir(_uir_data())
        assert ds.csr_matrix.shape == (15, 20)
        assert ds.csc_matrix.nnz == 150
        assert ds.dok_matrix[ds.uir_tuple[0][0], ds.uir_tuple[1][0]] > 0

    def test_user_item_data(self):
        ds = Dataset.from_uir(_uir_data())
        total = sum(len(items) for items, _ in ds.user_data.values())
        assert total == 150
        assert set(ds.user_data.keys()) == set(ds.uir_tuple[0])

    def test_chrono_data_sorted(self):
        data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIRT")
        ds = Dataset.from_uirt(data)
        for items, ratings, ts in ds.chrono_user_data.values():
            assert list(ts) == sorted(ts)

    def test_uir_iter(self):
        ds = Dataset.from_uir(_uir_data(), seed=42)
        batches = list(ds.uir_iter(batch_size=32))
        assert sum(len(b[0]) for b in batches) == 150
        u, i, r = batches[0]
        assert len(u) == len(i) == len(r) == 32

    def test_uir_iter_num_zeros(self):
        ds = Dataset.from_uir(_uir_data(), seed=42)
        for u, i, r in ds.uir_iter(batch_size=16, num_zeros=2):
            n_pos = (r > 0).sum()
            n_neg = (r == 0).sum()
            assert n_neg == 2 * n_pos
            # sampled negatives must be unobserved
            neg_mask = r == 0
            assert not ds.is_observed(u[neg_mask], i[neg_mask]).any()

    def test_uij_iter(self):
        ds = Dataset.from_uir(_uir_data(), seed=42)
        for u, i, j in ds.uij_iter(batch_size=32):
            # negative j must have strictly lower observed rating than i
            pos_r = ds.lookup_ratings(u, i)
            neg_r = ds.lookup_ratings(u, j)
            assert (neg_r < pos_r).all()

    def test_uij_iter_popularity(self):
        ds = Dataset.from_uir(_uir_data(), seed=42)
        batches = list(ds.uij_iter(batch_size=64, neg_sampling="popularity"))
        assert len(batches) > 0
        with pytest.raises(ValueError):
            next(ds.uij_iter(neg_sampling="bogus"))

    def test_save_load(self, tmp_path):
        ds = Dataset.from_uir(_uir_data(), seed=42)
        fpath = str(tmp_path / "ds.pkl")
        ds.save(fpath)
        loaded = Dataset.load(fpath)
        assert loaded.num_users == ds.num_users
        np.testing.assert_array_equal(loaded.uir_tuple[0], ds.uir_tuple[0])


class TestBasketDataset:
    def test_build(self):
        data = Reader().read(os.path.join(DATA_DIR, "basket.txt"), fmt="UBIT")
        ds = BasketDataset.from_ubit(data)
        assert ds.num_baskets == len(ds.bid_map)
        assert len(ds.basket_indices) == ds.num_ratings
        assert ds.max_basket_size >= ds.min_basket_size

    def test_ubi_iter(self):
        data = Reader().read(os.path.join(DATA_DIR, "basket.txt"), fmt="UBIT")
        ds = BasketDataset.from_ubit(data)
        for users, baskets, basket_items in ds.ubi_iter(batch_size=4):
            assert len(users) == len(baskets) == len(basket_items)
            for u_baskets, u_items in zip(baskets, basket_items):
                assert len(u_baskets) == len(u_items)

    def test_chrono_user_basket_data(self):
        data = Reader().read(os.path.join(DATA_DIR, "basket.txt"), fmt="UBIT")
        ds = BasketDataset.from_ubit(data)
        for baskets, ts in ds.chrono_user_basket_data.values():
            assert list(ts) == sorted(ts)


class TestSequentialDataset:
    def test_build(self):
        data = Reader().read(os.path.join(DATA_DIR, "sequence.txt"), fmt="USIT")
        ds = SequentialDataset.from_usit(data)
        assert ds.num_sessions == len(ds.sid_map)
        assert ds.avg_session_size > 0

    def test_si_iter(self):
        data = Reader().read(os.path.join(DATA_DIR, "sequence.txt"), fmt="USIT")
        ds = SequentialDataset.from_usit(data)
        n_sessions = 0
        for sids, mapped, items in ds.si_iter(batch_size=4):
            n_sessions += len(sids)
            for m, it in zip(mapped, items):
                assert len(m) == len(it)
        assert n_sessions == ds.num_sessions

    def test_sit_format_without_user(self):
        data = [("s1", "a", 1), ("s1", "b", 2), ("s2", "a", 3)]
        ds = SequentialDataset.from_sit(data)
        assert ds.num_sessions == 2
