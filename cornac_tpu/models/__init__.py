from .recommender import (
    ANNMixin,
    NextBasketRecommender,
    NextItemRecommender,
    Recommender,
    is_ann_supported,
)
from .baseline import BaselineOnly, GlobalAvg, MostPop
from .bpr import BPR, WBPR
from .mf import MF, SVD
from .pmf import PMF

__all__ = [
    "ANNMixin",
    "BPR",
    "BaselineOnly",
    "GlobalAvg",
    "MF",
    "MostPop",
    "NextBasketRecommender",
    "NextItemRecommender",
    "PMF",
    "Recommender",
    "SVD",
    "WBPR",
    "is_ann_supported",
]
