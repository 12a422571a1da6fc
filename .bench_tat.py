import time, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from dstagnn_drought_tpu.ops.attention import temporal_attention
from dstagnn_drought_tpu.ops.pallas.tat_fused import fused_temporal_attention

rng = np.random.default_rng(0)
B, F, T, N, H, dk, dv = 64, 32, 12, 170, 3, 32, 32
dt = jnp.bfloat16
x = jnp.asarray(rng.normal(size=(B, F, T, N)), dt)
mk = lambda *s: jnp.asarray(rng.normal(size=s), dt) * 0.1
wq, wk, wv, wo = mk(N, H*dk), mk(N, H*dk), mk(N, H*dv), mk(H*dv, N)
g1, b1 = jnp.ones(N, dt), jnp.zeros(N, dt)
res = mk(B, F, H, T, T)

def unfused(x, wq, wk, wv, wo, g1, b1, res):
    o, s = temporal_attention(x, res, wq=wq, wk=wk, wv=wv, wo=wo,
                              ln_scale=g1, ln_bias=b1, n_heads=H, d_k=dk, d_v=dv)
    return (o.astype(jnp.float32)**2).mean() + (s.astype(jnp.float32)**2).mean()

def fused(x, wq, wk, wv, wo, g1, b1, res, br):
    o, s = fused_temporal_attention(x, res, pos=None, ln0_scale=None, ln0_bias=None,
                                    wq=wq, wk=wk, wv=wv, wo=wo, ln_scale=g1, ln_bias=b1,
                                    n_heads=H, d_k=dk, d_v=dv, block_rows=br)
    return (o.astype(jnp.float32)**2).mean() + (s.astype(jnp.float32)**2).mean()

args = (x, wq, wk, wv, wo, g1, b1, res)
for name, fn in [("unfused", unfused)] + [
    (f"fused(br={br})", lambda *a, br=br: fused(*a, br)) for br in (8, 16, 32, 64)
]:
    vg = jax.jit(jax.value_and_grad(fn, argnums=(0,1,2,3,4,5,6,7)))
    v, g = vg(*args); jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(50):
        v, g = vg(*args)
    jax.block_until_ready(g)
    dt_ms = (time.perf_counter() - t0) / 50 * 1e3
    print(f"{name}: {dt_ms:.3f} ms/iter (fwd+bwd), loss={float(v):.4f}")
