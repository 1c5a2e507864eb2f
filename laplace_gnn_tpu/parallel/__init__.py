from .distributed import (DcnAggGraph, initialize, make_dcn_gat_aggregate,
                          make_dcn_halo_aggregate, make_hybrid_mesh,
                          stripe_edges)
from .scaling import dcn_projection, projected_scaling
from .mesh import graph_sharding, make_mesh, replicated, shard_gnn_params
from .partition import (HaloPlan, Partition, apply_node_order, bandwidth,
                        edge_balanced_blocks, pad_to_blocks,
                        build_halo_plan, degree_balanced_partition,
                        partition_efficiency, rcm_order)
from .sharded import (HaloAggGraph, build_halo_exchange, make_ring_dense_aggregate,
                      build_ring_halo_exchange, halo_widths,
                      make_halo_gat_aggregate, make_halo_sparse_aggregate,
                      make_ring_halo_sparse_aggregate,
                      make_sharded_sparse_aggregate, make_sharded_train_step,
                      partition_sparse_graph, sharded_aggregate)
