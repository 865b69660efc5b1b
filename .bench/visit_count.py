"""Visit-count probe: run kernels with VPT_TRAV_EXP=count and read the
iteration counters stashed in slot_out[0,0] of each ray block."""
import os
import sys
import tempfile

os.environ["VPT_TRAV_EXP"] = "count"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, "/root/repo")

from tests.test_mesh_render import write_uv_sphere
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.core.camera import Camera, generate_rays
from vrenderer_pathtracer_tpu.native import load_obj


def counts(slot, nb):
    c = np.asarray(slot).reshape(nb, 8, 128)[:, 0, 0]
    return int(c.sum()), float(c.mean()), int(c.max())


def main():
    from vrenderer_pathtracer_tpu.accel.pallas_paged import traverse_paged
    from vrenderer_pathtracer_tpu.accel.pallas_traverse import traverse_packets

    b = 512 * 1024
    nb = b // 1024
    tmax = jnp.full((b,), 1e6, jnp.float32)
    cam = Camera.default()._replace(
        origin=jnp.asarray([0.0, 0.0, 28.0], jnp.float32))
    # Tile-remap manually so block counters stay addressable.
    from vrenderer_pathtracer_tpu.accel.pallas_traverse import _tile_remap
    o, d = generate_rays(cam, 1024, 512)
    o_t, d_t = _tile_remap(o, 512, 1024), _tile_remap(d, 512, 1024)
    rng = np.random.default_rng(0)
    so = jnp.asarray(rng.uniform(-20, 20, (b, 3)).astype(np.float32))
    sd = rng.normal(size=(b, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sd = jnp.asarray(sd)

    p = os.path.join(tempfile.mkdtemp(), "s.obj")
    write_uv_sphere(p, radius=12.0, n_theta=120, n_phi=120)
    mesh = pack_mesh(load_obj(p))
    print("packet nodes8:", mesh.nodes8_i.shape[0])
    slot, _ = traverse_packets(mesh, o_t, d_t, tmax)
    print("packet coherent visits (sum, mean/blk, max):", counts(slot, nb))
    slot, _ = traverse_packets(mesh, so, sd, tmax)
    print("packet shuffled visits:", counts(slot, nb))

    p2 = os.path.join(tempfile.mkdtemp(), "sb.obj")
    write_uv_sphere(p2, radius=12.0, n_theta=300, n_phi=300)
    mesh2 = pack_mesh(load_obj(p2), paged=True)
    slot, _ = traverse_paged(mesh2, o_t, d_t, tmax)
    print("paged coherent visits:", counts(slot, nb))
    slot, _ = traverse_paged(mesh2, so, sd, tmax)
    print("paged shuffled visits:", counts(slot, nb))


main()
