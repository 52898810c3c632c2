from .fusion import (EncoderLayer, Encoder, TwoStreamFusion, ThreeStreamFusion,
                     TrxBranch, MFMTeacher, ScoreFusion)

__all__ = ["EncoderLayer", "Encoder", "TwoStreamFusion", "ThreeStreamFusion",
           "TrxBranch", "MFMTeacher", "ScoreFusion"]
