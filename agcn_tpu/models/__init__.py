from agcn_tpu.models.agcn import AGCN, STGCNBlock, UnitGCN, UnitTCN
from agcn_tpu.models.aagcn import AAGCN
from agcn_tpu.models.aagcn_transformer import AAGCNTransformer
from agcn_tpu.models.sgn import SGN
from agcn_tpu.models.sgn_original import SGNOriginal
from agcn_tpu.models.sgn_transformer import SGNTransformer

__all__ = ["AGCN", "AAGCN", "AAGCNTransformer", "SGN", "SGNOriginal",
           "SGNTransformer", "STGCNBlock", "UnitGCN", "UnitTCN"]
