from .trx import (TRX, TRX_sup, TRX_2fc, TRX_2fcsup, TRX_2fcsup_fixed,
                  TRX_1fc_sup, TRX_2fcsup_2)
from .edist import EDist, CosDistance, EDistFC2, EDistFC2Sup, EDist1FCSup

__all__ = ["TRX", "TRX_sup", "TRX_2fc", "TRX_2fcsup", "TRX_2fcsup_fixed",
           "TRX_1fc_sup", "TRX_2fcsup_2", "EDist", "CosDistance", "EDistFC2",
           "EDistFC2Sup", "EDist1FCSup"]
