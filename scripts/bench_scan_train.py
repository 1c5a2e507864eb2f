import jax, jax.numpy as jnp, numpy as np, time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from laplace_gnn_tpu.models import STEGCN
from laplace_gnn_tpu.training import marglik_optimization_scan
N, D, H, C = 2708, 1433, 64, 7
rng = np.random.default_rng(0)
X = rng.standard_normal((N, D), dtype=np.float32)
adj = (rng.random((N, N)) < 0.0014).astype(np.float32)
adj = np.minimum(adj + adj.T, 1.0); np.fill_diagonal(adj, 0.0)
y = rng.integers(0, C, N)
tr = np.arange(140); va = np.arange(140, 640)
model = STEGCN(D, H, C, 2, jnp.asarray(X), jnp.asarray(adj), dropout_p=0.0)
params = model.init(jax.random.PRNGKey(0))
t0 = time.time()
results, pf, losses, vls, nms = marglik_optimization_scan(
    model, params, tr, y[tr], va, y[va],
    lr=1e-3, lr_adj=0.8, weight_decay=5e-5, n_epochs=200,
    n_hypersteps=10, n_epochs_burnin=50, marglik_frequency=20,
    model_type='stegcn')
t = time.time() - t0
print(f"200 epochs + 80 hypersteps (Cora-sized) in {t:.1f}s total (incl compile)", flush=True)
print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f}; marglik {-nms[0]:.1f} -> {-nms[-1]:.1f}", flush=True)
print(f"best epochs: marglik={results['marglik']['epoch']} valloss={results['valloss']['epoch']}", flush=True)
print("adj changed:", float(np.abs(np.asarray(pf['adj']) - np.asarray(model.init_adj)).sum()), flush=True)
params2 = model.init(jax.random.PRNGKey(1))
t0 = time.time()
marglik_optimization_scan(model, params2, tr, y[tr], va, y[va],
    lr=1e-3, lr_adj=0.8, weight_decay=5e-5, n_epochs=200,
    n_hypersteps=10, n_epochs_burnin=50, marglik_frequency=20, model_type='stegcn')
print(f"warm run: {time.time()-t0:.2f}s for the full 200-epoch training", flush=True)
