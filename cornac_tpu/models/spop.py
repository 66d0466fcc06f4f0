"""SPop — session popularity baseline (Hidasi et al., ICLR 2016).

Capability parity with reference ``cornac/models/spop/recom_spop.py:23``.
"""

from collections import Counter

import numpy as np

from .recommender import NextItemRecommender


class SPop(NextItemRecommender):
    """Global popularity plus (optionally) frequency within the current
    session history."""

    def __init__(self, name="SPop", use_session_popularity=True):
        super().__init__(name=name, trainable=False)
        self.use_session_popularity = use_session_popularity
        self.item_freq = Counter()

    def fit(self, train_set, val_set=None):
        super().fit(train_set=train_set, val_set=val_set)
        self.item_freq = Counter(self.train_set.uir_tuple[1])
        self._pop_row = np.zeros(self.total_items, dtype=np.float64)
        max_freq = max(self.item_freq.values()) if self.item_freq else 1
        for iid, freq in self.item_freq.items():
            self._pop_row[iid] = freq / max_freq
        return self

    def score(self, user_idx, history_items, **kwargs):
        item_scores = self._pop_row.copy()
        if self.use_session_popularity:
            for iid, cnt in Counter(list(history_items)).items():
                item_scores[iid] += cnt
        return item_scores

    def score_history_batch(self, user_indices, histories):
        out = np.tile(self._pop_row[: self.num_items], (len(user_indices), 1))
        if self.use_session_popularity:
            for b, h in enumerate(histories):
                for iid, cnt in Counter(list(h)).items():
                    if iid < self.num_items:
                        out[b, iid] += cnt
        return out
