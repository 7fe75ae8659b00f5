import sys, time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
import jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
print("devices:", jax.devices())
from glorie_slam_tpu.ops import corr as corr_mod
from glorie_slam_tpu.ops.pallas_corr import lookup_pallas
rng = np.random.default_rng(0)
# correctness vs separable
E0, n0, h0, w0 = 2, 256, 12, 20
p0 = jnp.asarray(rng.normal(size=(E0,n0,h0,w0)), jnp.float32)
c0 = jnp.asarray(np.stack([rng.uniform(-3,w0+2,(E0,n0)), rng.uniform(-3,h0+2,(E0,n0))],-1), jnp.float32)
ref = np.asarray(corr_mod.lookup_separable(p0, c0))
got = np.asarray(lookup_pallas(p0.transpose(0,2,3,1), c0))
print("max diff:", np.abs(ref-got).max())
# timing
E, npix, hl, wl = 96, 3200, 40, 80
pl_lanes = jnp.asarray(rng.normal(size=(E,hl,wl,npix)).astype(np.float32), jnp.bfloat16)
coords = jnp.asarray(rng.uniform(0,40,(E,npix,2)).astype(np.float32))
def timeit(f,*a,n=10):
    o=f(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(n): o=f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n*1e3
print("pallas level0:", round(timeit(lookup_pallas, pl_lanes, coords),2), "ms")
