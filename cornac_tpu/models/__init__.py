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
from .beacon import Beacon
from .bpr import BPR, WBPR
from .c2pf import C2PF
from .causalrec import CausalRec
from .cdl import CDL
from .companion import Companion
from .comparer import ComparERObj, ComparERSub
from .convmf import ConvMF
from .ctr import CTR
from .cvae import CDR, CVAE
from .cvaecf import CVAECF
from .dmrl import DMRL
from .dnntsp import DNNTSP
from .ease import EASE
from .gcmc import GCMC
from .efm import EFM
from .fm import FM
from .fpmc import FPMC
from .gru4rec import GRU4Rec
from .hft import HFT
from .hpf import HPF
from .hrdr import HRDR
from .hypar import HypAR
from .ibpr import COE, IBPR, OnlineIBPR
from .knn import ItemKNN, UserKNN
from .lightgcn import LightGCN, NGCF
from .lrppm import LRPPM
from .mcf import MCF
from .mter import MTER
from .mmmf import MMMF
from .mf import MF, SVD
from .narre import NARRE
from .ncf import GMF, MLP, NCFBase, NeuMF
from .nmf import NMF
from .pcrl import PCRL
from .pmf import PMF
from .recvae import RecVAE
from .sansa import SANSA
from .sasrec import SASRec
from .sbpr import SBPR
from .skm import SKMeans
from .spop import SPop
from .sorec import SoRec
from .tiger import TIGER
from .tiger_configs import (
    GRID_CONFIG,
    PAISCHER_CONFIG,
    PAISCHER_SPORTS_CONFIG,
    PAISCHER_TOYS_CONFIG,
)
from .transformer_rec import BERT4Rec, TransformerRec
from .trirank import TriRank
from .vaecf import VAECF
from .vbpr import AMR, VBPR
from .vebpr import VEBPR
from .vmf import VMF
from .wmf import WMF

__all__ = [
    "ANNMixin",
    "AnnoyANN",
    "BaseANN",
    "BPR",
    "C2PF",
    "BaselineOnly",
    "Beacon",
    "BERT4Rec",
    "CausalRec",
    "CDL",
    "CDR",
    "Companion",
    "ComparERObj",
    "ComparERSub",
    "COE",
    "ConvMF",
    "CVAE",
    "CVAECF",
    "CTR",
    "DMRL",
    "DNNTSP",
    "GCMC",
    "BiVAECF",
    "EASE",
    "EFM",
    "FaissANN",
    "FM",
    "FPMC",
    "GlobalAvg",
    "GMF",
    "GPTop",
    "GRU4Rec",
    "HFT",
    "HNSWLibANN",
    "HPF",
    "HRDR",
    "HypAR",
    "NARRE",
    "PCRL",
    "IBPR",
    "ItemKNN",
    "LightGCN",
    "LRPPM",
    "MCF",
    "MF",
    "MMMF",
    "MTER",
    "MLP",
    "MostPop",
    "NCFBase",
    "NeuMF",
    "NGCF",
    "OnlineIBPR",
    "NextBasketRecommender",
    "NextItemRecommender",
    "NMF",
    "PMF",
    "Recommender",
    "RecVAE",
    "SANSA",
    "SASRec",
    "SBPR",
    "ScaNNANN",
    "SKMeans",
    "SoRec",
    "SPop",
    "SVD",
    "TIFUKNN",
    "TIGER",
    "GRID_CONFIG",
    "PAISCHER_CONFIG",
    "PAISCHER_SPORTS_CONFIG",
    "PAISCHER_TOYS_CONFIG",
    "TPUExactANN",
    "TransformerRec",
    "TriRank",
    "UPCF",
    "UserKNN",
    "VAECF",
    "VBPR",
    "VEBPR",
    "VMF",
    "AMR",
    "WBPR",
    "WMF",
    "is_ann_supported",
]
