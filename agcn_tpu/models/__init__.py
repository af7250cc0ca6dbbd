from agcn_tpu.models.agcn import AGCN, STGCNBlock, UnitGCN, UnitTCN
from agcn_tpu.models.aagcn import AAGCN
from agcn_tpu.models.sgn import SGN

__all__ = ["AGCN", "AAGCN", "SGN", "STGCNBlock", "UnitGCN", "UnitTCN"]
