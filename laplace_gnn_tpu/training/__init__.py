from .marglik_gnn import (fit_laplace, marglik_optimization, mc_eval,
                          mean_eval, make_neg_marglik_fn)
