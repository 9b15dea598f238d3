import sys
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.models.preprocess import Preprocessed
from r2_gaussian_tpu.ops.splat2d import render_pallas
from r2_gaussian_tpu.ops.dense_reference import render_dense

rng = np.random.default_rng(0)
n, H, W = 512, 512, 512
mean2d = jnp.asarray(rng.uniform(50, 450, (n, 2)).astype(np.float32))
sig = rng.uniform(20, 120, n).astype(np.float32)  # big footprints -> big tiers
conic = jnp.asarray(np.stack([1/sig**2, np.zeros(n), 1/sig**2], -1).astype(np.float32))
weight = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
r = 3*sig
pb = np.stack([np.maximum(mean2d[:,0]-r,0), np.minimum(mean2d[:,0]+r+1,W),
               np.maximum(mean2d[:,1]-r,0), np.minimum(mean2d[:,1]+r+1,H)], -1)
prep = Preprocessed(mean2d=mean2d, conic=conic, weight=weight,
                    mu=weight, radius=jnp.asarray(r, jnp.int32),
                    rect_min=jnp.zeros((n,2), jnp.int32),
                    rect_max=jnp.ones((n,2), jnp.int32),
                    depth=jnp.ones(n), px_bounds=jnp.asarray(pb, jnp.float32))
f = jax.jit(lambda p: render_pallas(p, width=W, height=H))
img = np.asarray(f(prep))
ref = np.asarray(render_dense(prep, width=W, height=H))
print("fwd maxerr:", np.abs(img - ref).max() / max(ref.max(), 1e-9), flush=True)

mask = jnp.cos(jnp.arange(H*W).reshape(H,W)*0.01)
def loss(weight):
    p2 = prep._replace(weight=weight)
    return jnp.sum(render_pallas(p2, width=W, height=H) * mask)
def loss_ref(weight):
    p2 = prep._replace(weight=weight)
    return jnp.sum(render_dense(p2, width=W, height=H) * mask)
g1 = np.asarray(jax.jit(jax.grad(loss))(weight))
g2 = np.asarray(jax.jit(jax.grad(loss_ref))(weight))
print("bwd maxerr:", np.abs(g1-g2).max()/max(np.abs(g2).max(),1e-9), flush=True)
