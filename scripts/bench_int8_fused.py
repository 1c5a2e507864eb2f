import jax, jax.numpy as jnp, numpy as np, time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from laplace_gnn_tpu.models import GCN
N, D, H, C = 2708, 1433, 64, 7
rng = np.random.default_rng(0)
X = rng.standard_normal((N, D), dtype=np.float32)
adj = (rng.random((N, N)) < 0.0014).astype(np.float32)
adj = np.minimum(adj + adj.T, 1.0); np.fill_diagonal(adj, 0.0)
models = {m: GCN(D, H, C, 2, jnp.asarray(X), jnp.asarray(adj), dropout_p=0.0, fused=m)
          for m in (False, True, "int8")}
params = models[False].init(jax.random.PRNGKey(0))
idx = jnp.arange(140)
outs = {m: jax.jit(lambda p, mm=mm: mm.apply(p, idx))(params) for m, mm in models.items()}
for m in (True, "int8"):
    print(f"{m} max err vs plain:", float(jnp.max(jnp.abs(outs[m]-outs[False]))), flush=True)
def timed(model, K=1000):
    @jax.jit
    def loop(params, n):
        def body(i, carry):
            acc, w = carry
            p = jax.tree_util.tree_map(lambda x: x, params)
            p["convs"][0]["lin"]["bias"] = p["convs"][0]["lin"]["bias"] + 1e-30 * acc
            f = model.apply(p, idx)
            return acc + jnp.sum(f), w
        return jax.lax.fori_loop(0, n, body, (0.0, 0.0))[0]
    jax.block_until_ready(loop(params, jnp.asarray(1)))
    t0=time.perf_counter(); jax.block_until_ready(loop(params, jnp.asarray(K))); t1=time.perf_counter()
    jax.block_until_ready(loop(params, jnp.asarray(4*K))); t2=time.perf_counter()
    return ((t2-t1)-(t1-t0))/(3*K)
for m, mm in models.items():
    print(f"fused={m}: {timed(mm)*1e3:.4f} ms/forward", flush=True)
