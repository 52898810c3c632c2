from .fusion import (EncoderLayer, Encoder, TwoStreamFusion, ThreeStreamFusion,
                     MultiStreamFusion, TrxBranch, MFMTeacher, ScoreFusion,
                     DGAdaIN, DGAFusionTeacher)

__all__ = ["EncoderLayer", "Encoder", "TwoStreamFusion", "ThreeStreamFusion",
           "MultiStreamFusion", "TrxBranch", "MFMTeacher", "ScoreFusion",
           "DGAdaIN", "DGAFusionTeacher"]
