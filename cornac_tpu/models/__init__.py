from .recommender import (
    ANNMixin,
    NextBasketRecommender,
    NextItemRecommender,
    Recommender,
    is_ann_supported,
)
from .baseline import BaselineOnly, GlobalAvg, MostPop
from .bpr import BPR, WBPR
from .ease import EASE
from .knn import ItemKNN, UserKNN
from .mcf import MCF
from .mmmf import MMMF
from .mf import MF, SVD
from .nmf import NMF
from .pmf import PMF
from .skm import SKMeans
from .sorec import SoRec
from .wmf import WMF

__all__ = [
    "ANNMixin",
    "BPR",
    "BaselineOnly",
    "EASE",
    "GlobalAvg",
    "ItemKNN",
    "MCF",
    "MF",
    "MMMF",
    "MostPop",
    "NextBasketRecommender",
    "NextItemRecommender",
    "NMF",
    "PMF",
    "Recommender",
    "SKMeans",
    "SoRec",
    "SVD",
    "UserKNN",
    "WBPR",
    "WMF",
    "is_ann_supported",
]
