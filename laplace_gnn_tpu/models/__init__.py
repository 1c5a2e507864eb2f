from .base_gnn import BaseGNN
from .layers import GATConv, GCNConv, GraphSAGEConv
from .models import (MODEL_REGISTRY, GAT, GCN, AttSTEGCN, GraphSAGE,
                     LoRASTEGCN, STEGCN, STEGraphSAGE)
from .sparse_gnn import SparseGAT, SparseGCN, SparseSAGE
