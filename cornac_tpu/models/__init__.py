from .recommender import (
    ANNMixin,
    NextBasketRecommender,
    NextItemRecommender,
    Recommender,
    is_ann_supported,
)
from .ann import AnnoyANN, BaseANN, FaissANN, HNSWLibANN, ScaNNANN, TPUExactANN
from .bivaecf import BiVAECF
from .baseline import BaselineOnly, GlobalAvg, MostPop
from .basket import GPTop, TIFUKNN, UPCF
from .bpr import BPR, WBPR
from .ease import EASE
from .fpmc import FPMC
from .gru4rec import GRU4Rec
from .knn import ItemKNN, UserKNN
from .lightgcn import LightGCN, NGCF
from .mcf import MCF
from .mmmf import MMMF
from .mf import MF, SVD
from .ncf import GMF, MLP, NCFBase, NeuMF
from .nmf import NMF
from .pmf import PMF
from .recvae import RecVAE
from .sasrec import SASRec
from .skm import SKMeans
from .spop import SPop
from .sorec import SoRec
from .vaecf import VAECF
from .vbpr import AMR, VBPR
from .wmf import WMF

__all__ = [
    "ANNMixin",
    "AnnoyANN",
    "BaseANN",
    "BPR",
    "BaselineOnly",
    "BiVAECF",
    "EASE",
    "FaissANN",
    "FPMC",
    "GlobalAvg",
    "GMF",
    "GPTop",
    "GRU4Rec",
    "HNSWLibANN",
    "ItemKNN",
    "LightGCN",
    "MCF",
    "MF",
    "MMMF",
    "MLP",
    "MostPop",
    "NCFBase",
    "NeuMF",
    "NGCF",
    "NextBasketRecommender",
    "NextItemRecommender",
    "NMF",
    "PMF",
    "Recommender",
    "RecVAE",
    "SASRec",
    "ScaNNANN",
    "SKMeans",
    "SoRec",
    "SPop",
    "SVD",
    "TIFUKNN",
    "TPUExactANN",
    "UPCF",
    "UserKNN",
    "VAECF",
    "VBPR",
    "AMR",
    "WBPR",
    "WMF",
    "is_ann_supported",
]
