"""laplace_gnn_tpu: TPU-native Laplace-GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Laplace-GNN reference (laplace-torch + vendored curvlinops + GNN graph
structure learning), built for TPU: functional models over param pytrees,
matrix-free curvature from jvp/vjp closures, differentiable KFAC marginal
likelihood, and shard_map-partitioned aggregation for multi-chip scale.
"""

from .laplace import (DiagLaplace, DiagLLLaplace, DiagSubnetLaplace,
                      FullLaplace, FullLLLaplace, FullSubnetLaplace,
                      FunctionalLaplace, FunctionalLLLaplace, Kron,
                      KronDecomposed, KronLaplace, KronLLLaplace, Laplace,
                      LowRankLaplace, SubnetLaplace, marglik_training)

__version__ = "0.1.0"
