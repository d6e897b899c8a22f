import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from bench import make_sphere_mesh
import jax.numpy as jnp
import obj2voxel_tpu.engine as eng
from obj2voxel_tpu.constants import ANTI_BLEED, TRI_MATERIALLESS
from obj2voxel_tpu.ops.color import TexturePool

n_target, resolution = 2_000_000, 1024
tris = make_sphere_mesh(n_target)
n = tris.shape[0]
scale = (resolution - ANTI_BLEED) / 2.0
tris = (tris + 1.0) * np.float32(scale) + np.float32(ANTI_BLEED / 2.0)
n_pad = eng._pow2_at_least(n)
verts = np.zeros((n_pad, 3, 3), np.float32); verts[:n] = tris
pixels_np, meta_np = TexturePool().device_arrays()
table = jnp.asarray(eng.build_tri_table(
    verts, np.zeros((n_pad,3,2),np.float32), np.full((n_pad,),1,np.int32),
    np.ones((n_pad,3),np.float32), np.full((n_pad,),-1,np.int32)))
table.block_until_ready()
vmin = np.clip(np.floor(tris.min(axis=1)), 0, resolution).astype(np.int64)
vmax = np.clip(np.floor(tris.max(axis=1)) + 1, 0, resolution).astype(np.int64)
pixels = jnp.asarray(pixels_np); meta = jnp.asarray(meta_np)

def run():
    voxels = 0; checks = []
    for xyz, argb, count in eng.stream_slabs(
        table, pixels, meta, aabb_host=(vmin, vmax),
        stride=resolution, z_extent=resolution,
        is_blend=True, do_down=False,
        pair_tile=eng.MAX_PASS_BUDGET, device_outputs=True):
        voxels += count
        checks.append(jnp.sum(argb, dtype=jnp.uint32) ^ jnp.sum(xyz.astype(jnp.uint32)))
    if checks:
        float(np.asarray(sum(checks) & jnp.uint32(0xFFFF)))
    return voxels

for name, env in (("fused(1-pull)", {}), ("two-pull", {"O2V_PLAN_FUSED": "0"})):
    os.environ.pop("O2V_PLAN_FUSED", None); os.environ.update(env)
    v0 = run()
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); v = run(); ts.append(time.perf_counter()-t0)
        assert v == v0
    ts.sort()
    print(f"{name:14s} median {ts[1]:.3f}/{ts[2]:.3f}s runs={['%.3f'%t for t in ts]} voxels={v0}", flush=True)
