from .fusion import (EncoderLayer, Encoder, TwoStreamFusion, ThreeStreamFusion,
                     MultiStreamFusion, TrxBranch, MFMTeacher, ScoreFusion,
                     DGAdaIN, DGAFusionTeacher)
from .composer import ComposedFusionTeacher, PRESETS as FUSION_PRESETS

__all__ = ["EncoderLayer", "Encoder", "TwoStreamFusion", "ThreeStreamFusion",
           "MultiStreamFusion", "TrxBranch", "MFMTeacher", "ScoreFusion",
           "DGAdaIN", "DGAFusionTeacher", "ComposedFusionTeacher",
           "FUSION_PRESETS"]
