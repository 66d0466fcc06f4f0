"""StratifiedSplit: per-user or per-item (optionally chronological) split.

Parity with reference ``cornac/eval_methods/stratified_split.py:25-145``.
"""

from collections import defaultdict

from ..utils.common import safe_indexing
from .base_method import BaseMethod
from .ratio_split import RatioSplit


class StratifiedSplit(BaseMethod):
    """Group interactions by user or item, then split each group into
    train/val/test. With ``chrono=True`` the training portion of each group
    keeps chronological order and the held-out portion is sampled from the
    tail."""

    def __init__(
        self,
        data,
        group_by="user",
        chrono=False,
        fmt="UIRT",
        test_size=0.2,
        val_size=0.0,
        rating_threshold=1.0,
        seed=None,
        exclude_unknowns=True,
        verbose=False,
        **kwargs,
    ):
        super().__init__(
            data=data,
            fmt=fmt,
            rating_threshold=rating_threshold,
            seed=seed,
            exclude_unknowns=exclude_unknowns,
            verbose=verbose,
            **kwargs,
        )

        if group_by not in ["user", "item"]:
            raise ValueError(
                "group_by option must be either 'user' or 'item' but {}".format(
                    group_by
                )
            )

        if chrono and (fmt != "UIRT" or len(self.data[0]) != 4):
            raise ValueError(
                'Input data must be in "UIRT" format for sorting chronologically.'
            )

        self.chrono = chrono
        self.group_by = group_by
        self.val_size = val_size
        self.test_size = test_size

        self._split()

    def _split(self):
        data = sorted(self.data, key=lambda x: x[3]) if self.chrono else self.data

        grouped_indices = defaultdict(list)
        for idx, (uid, iid, *_rest) in enumerate(data):
            key = uid if self.group_by == "user" else iid
            grouped_indices[key].append(idx)

        train_idx, test_idx, val_idx = [], [], []

        for rating_indices in grouped_indices.values():
            n_ratings = len(rating_indices)
            n_train, _, n_test = RatioSplit.validate_size(
                self.val_size, self.test_size, n_ratings
            )

            if self.chrono:
                # keep the (chronological) head for training; shuffle the tail
                # before carving out val/test
                rating_indices = (
                    rating_indices[:n_train]
                    + self.rng.permutation(rating_indices[n_train:]).tolist()
                )
            else:
                rating_indices = self.rng.permutation(rating_indices).tolist()

            train_idx += rating_indices[:n_train]
            test_idx += rating_indices[-n_test:]
            val_idx += rating_indices[n_train:-n_test]

        train_data = safe_indexing(data, train_idx)
        test_data = safe_indexing(data, test_idx)
        val_data = safe_indexing(data, val_idx) if len(val_idx) > 0 else None

        self.build(train_data=train_data, test_data=test_data, val_data=val_data)
