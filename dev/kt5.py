import sys
sys.path.insert(0, "/root/repo")
from r2_gaussian_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()
import jax, jax.numpy as jnp, numpy as np
from r2_gaussian_tpu.models.render import query, query_volume

rng = np.random.default_rng(1)
n = 2048
xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
scales = jnp.asarray(rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32))
rots = rng.standard_normal((n, 4)).astype(np.float32)
rots = jnp.asarray(rots / np.linalg.norm(rots, axis=1, keepdims=True))
dens = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
kw = dict(center=(0.0, 0.0, 0.0), s_voxel=(2.0, 2.0, 2.0))

dense = np.asarray(query(xyz, scales, rots, dens, n_voxel=(64, 64, 64),
                         backend="dense", **kw)["vol"])
print("dense ok", dense.sum(), flush=True)
pallas = np.asarray(query_volume(xyz, scales, rots, dens, n_voxel=(64, 64, 64),
                                 backend="pallas", slab=32, **kw))
print("pallas slab ok", pallas.sum(), flush=True)
err = np.abs(pallas - dense).max() / max(dense.max(), 1e-9)
print("slab-vs-dense maxrelerr:", err, flush=True)
