"""Model registry: same capability list as the reference's ``models.py``
(``kon/model/ctr_model/model/models.py:30-426``)."""

from .base import Model
from .coldstart import MetaEmbedding, make_meta_train_step
from .interaction import (AFM, DCN, DLRM, FFM, FNN, LR, NFM, PNN, AutoInt,
                          DeepCross, DeepFM, FiBiNET, FM, FwFM, WideDeep,
                          fnn_from_fm, xDeepFM)
from .interaction_ext import (CCPM, FATDeepFFM, FGCNN, FiGNN, FLEN, MLR, OENN,
                              ONN)
from .image import DICM
from .longseq import DTS, HPMN, MIMN, SIM
from .match import DSSM, DeepMCP
from .multitask import ESMM, MMoE, PLE
from .sequence import BST, DIEN, DIN, DMIN, DSIN, DSTN, MIND, SeqFM

MODEL_REGISTRY = {
    "lr": LR,
    "fm": FM,
    "fnn": FNN,
    "ffm": FFM,
    "fwfm": FwFM,
    "pnn": PNN,
    "deepcross": DeepCross,
    "wide_deep": WideDeep,
    "deepfm": DeepFM,
    "dcn": DCN,
    "nfm": NFM,
    "xdeepfm": xDeepFM,
    "afm": AFM,
    "autoint": AutoInt,
    "fibinet": FiBiNET,
    "dlrm": DLRM,
    "ccpm": CCPM,
    "fgcnn": FGCNN,
    "flen": FLEN,
    "onn": ONN,
    "oenn": OENN,
    "fat_deepffm": FATDeepFFM,
    "fignn": FiGNN,
    "mlr": MLR,
    "din": DIN,
    "dien": DIEN,
    "bst": BST,
    "dsin": DSIN,
    "seqfm": SeqFM,
    "dstn": DSTN,
    "dmin": DMIN,
    "mind": MIND,
    "dssm": DSSM,
    "deepmcp": DeepMCP,
    "dts": DTS,
    "mimn": MIMN,
    "sim": SIM,
    "hpmn": HPMN,
    "dicm": DICM,
    "esmm": ESMM,
    "mmoe": MMoE,
    "ple": PLE,
}


def get_model(name: str, feature_set, **hp) -> Model:
    try:
        ctor = MODEL_REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    return ctor(feature_set, **hp)


__all__ = ["Model", "MODEL_REGISTRY", "get_model", "DICM", "LR", "FM", "FNN",
           "fnn_from_fm", "FFM", "FwFM", "PNN",
           "DeepCross", "WideDeep", "DeepFM", "DCN", "NFM", "xDeepFM", "AFM",
           "AutoInt", "FiBiNET", "DLRM", "CCPM", "FGCNN", "FLEN", "ONN",
           "OENN", "FATDeepFFM", "FiGNN", "MLR", "DIN", "DIEN", "DMIN",
           "MIND", "BST", "DSIN", "SeqFM", "DSTN", "DTS", "MIMN", "SIM",
           "HPMN", "DSSM", "DeepMCP", "ESMM", "MMoE", "PLE", "MetaEmbedding",
           "make_meta_train_step"]
