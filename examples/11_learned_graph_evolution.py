"""Learned-graph evolution figures from a SCAN-loop training run.

The paper workflow (reference gnn/plots/interaction_bounds.py driven by the
per-epoch snapshots of gnn/marglik_training.py:244-253), end to end on the
TPU-throughput loop: `marglik_optimization_scan` runs the entire training
inside one jitted fori_loop, captures the binarized adjacency of every
hyper phase ON DEVICE, writes the same `epoch_*.pkl` files afterwards, and
`graph.plots` renders:

  - class-sorted adjacency heatmaps (initial vs final learned graph),
  - avg-local-homophily vs hyper-phase epoch,
  - intra/inter-class edge mass vs epoch,
  - degree-distribution shift.

Run: python examples/11_learned_graph_evolution.py [outdir]
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import laplace_gnn_tpu.graph as G
from laplace_gnn_tpu.graph.data import edge_index_to_adj
from laplace_gnn_tpu.graph.plots import (count_type_edges,
                                         get_learned_graphs,
                                         plot_adjacency_by_class,
                                         plot_avg_local_homophily,
                                         plot_degree_distribution,
                                         plot_interaction_bounds)
from laplace_gnn_tpu.models import STEGCN
from laplace_gnn_tpu.training import marglik_optimization_scan


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="learned_graphs_")
    snapdir = os.path.join(outdir, "snapshots")

    data = G.load_data("karate", n_rand_splits=1)
    tr, va, _ = data.split(0)
    adj0 = data.adjacency()
    model = STEGCN(data.num_features, 16, data.num_classes, 2,
                   jnp.asarray(data.x), adj0, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))

    # whole training in ONE jitted program; snapshots captured on device
    results, params_f, losses, *_ = marglik_optimization_scan(
        model, params, tr, data.y[tr], va, data.y[va],
        lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=60,
        n_hypersteps=5, n_epochs_burnin=10, marglik_frequency=10,
        model_type="stegcn", learned_graphs_dir=snapdir, y=data.y)

    y = np.asarray(data.y)
    n = data.num_nodes
    epochs, homs, intras, inters = [], [], [], []
    for _, snap in get_learned_graphs(snapdir):
        epochs.append(snap["epoch"])
        homs.append(snap["homophily"])
        intra, inter = count_type_edges(snap["edge_index"], y)
        intras.append(intra)
        inters.append(inter)
        print(f"epoch {snap['epoch']:3d}: {int(snap['num_edges'])} edges, "
              f"homophily {snap['homophily']:.3f}, marglik "
              f"{snap['marglik']:.2f}")

    last_adj = edge_index_to_adj(
        next(get_learned_graphs(snapdir, epochs[-1]))[1]["edge_index"], n)
    plot_adjacency_by_class(np.asarray(adj0), y, title="Initial graph",
                            out_fn=os.path.join(outdir, "adj_initial.png"))
    plot_adjacency_by_class(np.asarray(last_adj), y, title="Learned graph",
                            out_fn=os.path.join(outdir, "adj_learned.png"))
    plot_avg_local_homophily(
        epochs, homs, homs,
        losses={"epochs": list(range(1, len(losses) + 1)),
                "train_loss": list(losses)},
        out_fn=os.path.join(outdir, "homophily.png"))
    plot_interaction_bounds(epochs, intras, inters, intras, inters,
                            out_fn=os.path.join(outdir, "edge_types.png"))
    plot_degree_distribution(np.asarray(adj0), np.asarray(last_adj),
                             out_fn=os.path.join(outdir, "degrees.png"))
    print(f"figures written to {outdir}")


if __name__ == "__main__":
    main()
