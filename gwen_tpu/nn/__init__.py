from gwen_tpu.nn.gnn import EncodeProcessDecode, GCNStack
from gwen_tpu.nn.layers import gcn_apply, gcn_init

__all__ = ["EncodeProcessDecode", "GCNStack", "gcn_apply", "gcn_init"]
