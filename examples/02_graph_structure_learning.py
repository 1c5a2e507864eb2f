"""Graph structure learning with STE-GCN + differentiable KFAC marginal
likelihood (the flagship workload; counterpart of running the reference's
gnn/marglik_training.py on a small dataset).

Run: python examples/02_graph_structure_learning.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import laplace_gnn_tpu.graph as G
from laplace_gnn_tpu.models import STEGCN
from laplace_gnn_tpu.training import (evaluate_map, evaluate_predictive,
                                      fit_laplace, marglik_optimization)


def main():
    data = G.load_data("karate", n_rand_splits=1)
    tr, va, te = data.split(0)
    adj = data.adjacency()
    print(f"karate: {data.num_nodes} nodes, {data.num_edges} edges, "
          f"homophily={G.global_homophily(adj, data.y):.3f}")

    model = STEGCN(data.num_features, 16, data.num_classes, 2,
                   jnp.asarray(data.x), adj, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))

    results, params, losses, val_losses, neg_margliks = marglik_optimization(
        model, params, tr, data.y[tr], va, data.y[va], y=data.y,
        lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=80,
        n_hypersteps=5, n_epochs_burnin=10, marglik_frequency=10,
        model_type="stegcn", log_every=40)

    best = results["valloss"]["params"]
    learned = np.asarray(model.full_adj(best))
    print(f"learned graph: {int(learned.sum())} edges, "
          f"homophily={G.global_homophily(learned, data.y):.3f}")

    print("MAP test metrics:   ", evaluate_map(model, best, te, data.y[te]))
    la = fit_laplace(model, best, tr, data.y[tr])
    print("Bayes test metrics: ",
          evaluate_predictive(la, te, data.y[te], link_approx="probit"))


if __name__ == "__main__":
    main()
