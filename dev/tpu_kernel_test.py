"""TPU-side kernel validation + timing (run on the real chip)."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from r2_gaussian_tpu.dataset.geometry import build_cameras
from r2_gaussian_tpu.models.preprocess import build_cov3d, preprocess
from r2_gaussian_tpu.ops.splat2d import render_pallas, SplatConfig
from r2_gaussian_tpu.ops.dense_reference import render_dense
from r2_gaussian_tpu.pipeline.densify import morton_code

print(jax.devices())
sc = {"mode":"cone","DSD":7.0,"DSO":5.0,"nDetector":[512,512],"sDetector":[4.0,4.0],
      "nVoxel":[256]*3,"sVoxel":[2.0]*3,"offOrigin":[0,0,0],"offDetector":[0,0]}
cams = build_cameras([0.4], np.zeros((1,512,512),np.float32), ["t"], sc)
w2c = jnp.asarray(cams.w2c[0]); fp = jnp.asarray(cams.full_proj[0])

def make_gaussians(N, seed=0, smax=0.03):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(-0.9,0.9,(N,3)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004,smax,(N,3)).astype(np.float32))
    rots = rng.standard_normal((N,4)).astype(np.float32)
    rots = jnp.asarray(rots/np.linalg.norm(rots,axis=1,keepdims=True))
    dens = jnp.asarray(rng.uniform(0.05,1.0,N).astype(np.float32))
    order = jnp.argsort(morton_code(xyz))
    return xyz[order], scales[order], rots[order], dens[order]

def prep_of(xyz, scales, rots, dens):
    return preprocess(xyz, build_cov3d(scales, rots), dens, w2c, fp,
                      width=512, height=512, tanfovx=cams.tanfovx,
                      tanfovy=cams.tanfovy, mode=1)

# --- correctness: N small, generous fallback cap
cfg_big = SplatConfig(dense_cap=8192, dense_chunk=512)
Ns = 4096
xyzs, ss, rs, ds = make_gaussians(Ns, seed=1)
ps = prep_of(xyzs, ss, rs, ds)
img_p, aux = jax.jit(lambda p: render_pallas(p, width=512, height=512, config=cfg_big, return_aux=True))(ps)
img_d = jax.jit(lambda p: render_dense(p, width=512, height=512))(ps)
err = float(jnp.abs(img_p - img_d).max())
print(f"correctness N={Ns}: max abs err {err:.2e} (img max {float(img_d.max()):.2f}) "
      f"aux={ {k:int(v) for k,v in aux.items()} }")

# --- timing at scale
N = 262144
xyz, scales, rots, dens = make_gaussians(N)
cfg = SplatConfig()
def fwd(xyz, scales, rots, dens, cfg=cfg):
    return render_pallas(prep_of(xyz, scales, rots, dens), width=512, height=512, config=cfg)

def time_it(f, args, k1=2, k2=8):
    fs = {}
    for k in (k1, k2):
        def mk(k=k):
            def g(*a):
                def body(i, acc):
                    return acc + f(*((a[0]*(1+1e-9*i),)+a[1:])).sum()
                return jax.lax.fori_loop(0, k, body, 0.0)
            return jax.jit(g)
        fs[k] = mk()
        np.asarray(fs[k](*args))
    def t(fn):
        best = 1e9
        for _ in range(4):
            t0=time.perf_counter(); np.asarray(fn(*args)); best=min(best,time.perf_counter()-t0)
        return best
    return (t(fs[k2])-t(fs[k1]))/(k2-k1)

for tiers in [((64,56),(112,104),(176,168)), ((96,88),(176,168))]:
    c = SplatConfig(tiers=tiers)
    # fallback stats
    _, aux = jax.jit(lambda p: render_pallas(p, width=512, height=512, config=c, return_aux=True))(prep_of(xyz,scales,rots,dens))
    dt = time_it(lambda *a: fwd(*a, cfg=c), (xyz, scales, rots, dens))
    print(f"tiers {tiers}: fwd {dt*1e3:.2f} ms, aux={ {k:int(v) for k,v in aux.items()} }")

g_jit = lambda *a: jax.grad(lambda *b: fwd(*b).sum(), argnums=(0,1,2,3))(*a)
def time_grad(k1=2, k2=6):
    fs={}
    for k in (k1,k2):
        def mk(k=k):
            def g(xyz, scales, rots, dens):
                def body(i, acc):
                    gr = jax.grad(lambda *b: fwd(*b).sum(), argnums=(0,))(xyz*(1+1e-9*i), scales, rots, dens)
                    return acc + gr[0].sum()
                return jax.lax.fori_loop(0, k, body, 0.0)
            return jax.jit(g)
        fs[k]=mk(); np.asarray(fs[k](xyz,scales,rots,dens))
    def t(fn):
        best=1e9
        for _ in range(4):
            t0=time.perf_counter(); np.asarray(fn(xyz,scales,rots,dens)); best=min(best,time.perf_counter()-t0)
        return best
    return (t(fs[k2])-t(fs[k1]))/(k2-k1)
print(f"fwd+bwd: {time_grad()*1e3:.2f} ms at N={N}")
