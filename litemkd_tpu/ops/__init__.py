from .positional import SinusoidalPE, TrainablePE, sinusoidal_pe
from .tuples import tuple_indices, n_tuples, gather_tuples
from .tct import TemporalCrossTransformer, MultiSetTCT, class_sort
from .distances import (support_dk_logits, edist_logits, cosine_logits,
                        safe_norm)
from .strm import (TokenMLP, BottleneckMLP2, BottleneckMLP3Res, SelfAttnBot,
                   MLPMixEnrich, STRMDistance)

__all__ = [
    "SinusoidalPE", "TrainablePE", "sinusoidal_pe",
    "tuple_indices", "n_tuples", "gather_tuples",
    "TemporalCrossTransformer", "MultiSetTCT", "class_sort",
    "support_dk_logits", "edist_logits", "cosine_logits", "safe_norm",
    "TokenMLP", "BottleneckMLP2", "BottleneckMLP3Res", "SelfAttnBot",
    "MLPMixEnrich", "STRMDistance",
]
