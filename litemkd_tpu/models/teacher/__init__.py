from .fusion import (EncoderLayer, Encoder, TwoStreamFusion, ThreeStreamFusion,
                     MultiStreamFusion, TrxBranch, MFMTeacher, ScoreFusion,
                     DGAdaIN, DGAFusionTeacher, CrossAttentionFusion,
                     SelfEncoderBranch, BatchStatFusion, TwoRoadFusionTeacher)
from .composer import (Branch, ComposedFusionTeacher, PRESETS as FUSION_PRESETS,
                       PRESET_OPTIONS as FUSION_PRESET_OPTIONS,
                       PRESET_EXTRACT as FUSION_PRESET_EXTRACT)

__all__ = ["EncoderLayer", "Encoder", "TwoStreamFusion", "ThreeStreamFusion",
           "MultiStreamFusion", "TrxBranch", "MFMTeacher", "ScoreFusion",
           "DGAdaIN", "DGAFusionTeacher", "CrossAttentionFusion",
           "SelfEncoderBranch", "BatchStatFusion", "TwoRoadFusionTeacher",
           "Branch", "ComposedFusionTeacher", "FUSION_PRESETS",
           "FUSION_PRESET_OPTIONS", "FUSION_PRESET_EXTRACT"]
