import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from stylegan_directions_face_reenactment_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()
from stylegan_directions_face_reenactment_tpu.ops.upfirdn2d import (blur, upsample2d, set_resample_backend, make_kernel, upfirdn2d)
k = make_kernel([1,3,3,1])
def timeit(f, *a, iters=100):
    y = f(*a); jax.block_until_ready(y)
    s = time.perf_counter()
    for _ in range(iters): y = f(*a)
    jax.block_until_ready(y)
    return (time.perf_counter()-s)/iters*1e3
# correctness on real TPU (compiled kernel, not interpreter)
x = jax.random.normal(jax.random.PRNGKey(0), (2, 33, 33, 128))
set_resample_backend("xla"); ref_b = blur(x, k, (2, 1)); ref_u = upsample2d(x, k)
set_resample_backend("pallas"); got_b = blur(x, k, (2, 1)); got_u = upsample2d(x, k)
print("blur maxdiff", float(jnp.abs(ref_b-got_b).max()),
      "up maxdiff", float(jnp.abs(ref_u-got_u).max()), flush=True)
# perf at the two biggest generator shapes (bf16, the bench dtype)
for name, fn, s in (("blur257", lambda x: blur(x, k, (1, 1)), (16,257,257,128)),
                    ("up128",   lambda x: upsample2d(x, k),   (16,128,128,256)),
                    ("blur129", lambda x: blur(x, k, (1, 1)), (16,129,129,256)),
                    ("up64",    lambda x: upsample2d(x, k),   (16,64,64,512))):
    xx = jax.random.normal(jax.random.PRNGKey(1), s, jnp.bfloat16)
    set_resample_backend("xla"); ta = timeit(jax.jit(fn), xx)
    set_resample_backend("pallas"); tb = timeit(jax.jit(fn), xx)
    print(f"{name}: xla {ta:.3f} | pallas(db) {tb:.3f} | ratio {tb/ta:.2f}", flush=True)
