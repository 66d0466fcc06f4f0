"""TimestampSplit: global chronological split by cutoff or ratio.

Parity with reference ``cornac/eval_methods/timestamp_split.py:23-212``.
"""

import warnings

from ..utils.common import safe_indexing
from .base_method import BaseMethod
from .ratio_split import RatioSplit


class TimestampSplit(BaseMethod):
    """Partition interactions chronologically:

    - train: timestamp < val_timestamp
    - validation: val_timestamp <= timestamp < test_timestamp
    - test: timestamp >= test_timestamp

    Cutoffs may be given directly (``val_timestamp``/``test_timestamp``) or
    derived from ``test_size``/``val_size`` proportions of interactions.
    """

    def __init__(
        self,
        data,
        val_timestamp=None,
        test_timestamp=None,
        test_size=None,
        val_size=None,
        fmt="UIRT",
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

        if fmt != "UIRT" or len(self.data[0]) != 4:
            raise ValueError(
                'Input data must be in "UIRT" format for splitting by timestamp.'
            )

        if (val_timestamp is not None or test_timestamp is not None) and (
            test_size is not None or val_size is not None
        ):
            raise ValueError(
                "Provide either val_timestamp/test_timestamp or test_size/val_size, "
                "not a mix of both."
            )

        if val_timestamp is not None and test_timestamp is not None:
            if val_timestamp >= test_timestamp:
                raise ValueError(
                    "val_timestamp ({}) must be strictly less than test_timestamp "
                    "({}).".format(val_timestamp, test_timestamp)
                )
            self.val_timestamp = val_timestamp
            self.test_timestamp = test_timestamp
        elif test_size is not None:
            self.val_timestamp, self.test_timestamp = self._cutoffs_from_ratio(
                test_size=test_size, val_size=val_size
            )
        else:
            raise ValueError(
                "Provide either both val_timestamp and test_timestamp, or test_size "
                "(optionally with val_size) to split by ratio."
            )

        self._split()

    def _cutoffs_from_ratio(self, test_size, val_size):
        """Derive cutoff timestamps so the latest ``test_size`` fraction of
        interactions forms the test set (ties stay on one side)."""
        data_size = len(self.data)
        train_count, val_count, test_count = RatioSplit.validate_size(
            val_size=val_size, test_size=test_size, data_size=data_size
        )

        if test_count == 0:
            raise ValueError("test_size={} yields an empty test set.".format(test_size))

        sorted_ts = sorted(row[3] for row in self.data)
        test_timestamp = sorted_ts[train_count + val_count]
        val_timestamp = sorted_ts[train_count] if val_count > 0 else test_timestamp

        if val_timestamp == sorted_ts[0]:
            raise ValueError(
                "Training set is empty: the earliest timestamps are tied across the "
                "requested train boundary. Use a smaller test_size/val_size or split "
                "by absolute cutoffs instead."
            )
        if val_count > 0 and val_timestamp == test_timestamp:
            warnings.warn(
                "Validation window collapsed due to tied timestamps at the requested "
                "boundary; val_set will be None."
            )

        return val_timestamp, test_timestamp

    def _split(self):
        train_idx, val_idx, test_idx = [], [], []
        for idx, row in enumerate(self.data):
            ts = row[3]
            if ts < self.val_timestamp:
                train_idx.append(idx)
            elif ts < self.test_timestamp:
                val_idx.append(idx)
            else:
                test_idx.append(idx)

        if len(train_idx) == 0:
            raise ValueError("Training set is empty. val_timestamp may be too small.")
        if len(test_idx) == 0:
            raise ValueError("Test set is empty. test_timestamp may be too large.")

        train_data = safe_indexing(self.data, train_idx)
        test_data = safe_indexing(self.data, test_idx)
        val_data = safe_indexing(self.data, val_idx) if len(val_idx) > 0 else None

        self.build(train_data=train_data, test_data=test_data, val_data=val_data)
