import time, functools, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model, apply
from dstagnn_drought_tpu.training.step import make_optimizer, make_epoch_runner

spec = ModelSpec(num_of_vertices=170, len_input=12, num_for_predict=12, num_of_d=1,
                 nb_block=4, in_channels=1, K=3, nb_chev_filter=32, nb_time_filter=32,
                 d_model=512, d_k=32, n_heads=3)
rng = np.random.default_rng(0)
N = 170
A = (rng.random((N, N)) < 0.05).astype(np.float32); A = np.maximum(A, A.T); np.fill_diagonal(A, 0); A[0,1]=A[1,0]=1
pa = (rng.random((N, N)) < 0.01).astype(np.float32); np.fill_diagonal(pa, 1)
params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
opt = make_optimizer(1e-4); opt_state = opt.init(params)
B = 64; n_total = 4*B
x_full = jnp.asarray(rng.normal(size=(n_total, N, 1, 12)), jnp.float32)
y_full = jnp.asarray(rng.normal(size=(n_total, N, 12)), jnp.float32)
idx_plan = jnp.asarray((np.arange(168*B) % n_total).reshape(168, B).astype(np.int32))
params_np = jax.tree.map(np.asarray, params)
opt_np = jax.tree.map(np.asarray, opt_state)
for fuse in (False, True):
    fn = functools.partial(apply, fuse_tat=fuse)
    runner = make_epoch_runner(spec, opt, compute_dtype=jnp.bfloat16, apply_fn=fn)
    key = jax.random.key(1, impl="rbg")
    p = jax.tree.map(jnp.asarray, params_np)
    o = jax.tree.map(jnp.asarray, opt_np)
    p, o, k, losses = runner(p, o, key, x_full, y_full, idx_plan, consts)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(3):
        p, o, k, losses = runner(p, o, k, x_full, y_full, idx_plan, consts)
    jax.block_until_ready(losses)
    ms = (time.perf_counter()-t0)/3/168*1e3
    print(f"fuse_tat={fuse}: {ms:.3f} ms/step, loss0={float(losses[0]):.4f}")
