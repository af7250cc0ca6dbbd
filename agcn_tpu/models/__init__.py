from agcn_tpu.models.agcn import AGCN, STGCNBlock, UnitGCN, UnitTCN

__all__ = ["AGCN", "STGCNBlock", "UnitGCN", "UnitTCN"]
