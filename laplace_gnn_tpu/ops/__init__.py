from .adjacency import (binarize_ste, clip_ste, fill_diagonal,
                        fill_diagonal_any, normalize_adj,
                        power_adj, preprocess_adj, sample_neigh_adj, symmetrize_adj,
                        train_adj_mask)
from .linalg import (block_diag, invsqrt_precision, kron, normal_samples,
                     symeig)
from .spmm import aggregate
