"""Sentiment (aspect/opinion) modality.

Parity with reference ``cornac/data/sentiment.py:20-117``: lexicon entries
``(user, item, [(aspect, opinion, polarity), ...])`` restricted to observed
train pairs, with dense aspect/opinion ID maps.
"""

from collections import OrderedDict

from .modality import Modality


class SentimentModality(Modality):
    """Aspect-opinion-polarity lexicon keyed by (user, item) pairs."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.raw_data = kwargs.get("data", OrderedDict())

    @property
    def num_aspects(self):
        return len(self.aspect_id_map)

    @property
    def num_opinions(self):
        return len(self.opinion_id_map)

    def _build_sentiment(self, uid_map, iid_map, dok_matrix):
        self.user_sentiment = OrderedDict()
        self.item_sentiment = OrderedDict()
        aid_map = OrderedDict()
        oid_map = OrderedDict()
        sentiment = OrderedDict()
        for idx, (raw_uid, raw_iid, tuples) in enumerate(self.raw_data):
            user_idx = uid_map.get(raw_uid, None)
            item_idx = iid_map.get(raw_iid, None)
            if (
                user_idx is None
                or item_idx is None
                or dok_matrix[user_idx, item_idx] == 0
            ):
                continue
            self.user_sentiment.setdefault(user_idx, OrderedDict())[item_idx] = idx
            self.item_sentiment.setdefault(item_idx, OrderedDict())[user_idx] = idx

            mapped = []
            for tup in tuples:
                aspect, opinion, polarity = tup[0], tup[1], float(tup[2])
                mapped.append(
                    (
                        aid_map.setdefault(aspect, len(aid_map)),
                        oid_map.setdefault(opinion, len(oid_map)),
                        polarity,
                    )
                )
            sentiment.setdefault(idx, mapped)

        self.sentiment = sentiment
        self.aspect_id_map = aid_map
        self.opinion_id_map = oid_map

    def build(self, uid_map=None, iid_map=None, dok_matrix=None, **kwargs):
        """Index the lexicon against the train set's observed pairs."""
        if uid_map is not None and iid_map is not None and dok_matrix is not None:
            self._build_sentiment(uid_map, iid_map, dok_matrix)
        return self
