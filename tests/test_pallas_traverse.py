"""Pallas packet-traversal kernel vs the XLA traversal oracle.

SURVEY §4.3: every Pallas kernel is tested against its jax.numpy reference
in interpret mode on CPU — the TPU analog of the reference's CUDA/OpenCL
dual-backend cross-check.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_mesh_traversal import _aimed_rays, _rays, _soup
from vrenderer_pathtracer_tpu.accel.mesh import pack_mesh
from vrenderer_pathtracer_tpu.accel.pallas_traverse import (
    BLOCK,
    fits_vmem,
    traverse_packets,
)
from vrenderer_pathtracer_tpu.accel.traverse import traverse


@pytest.mark.parametrize("seed", [0, 1])
def test_packets_match_xla(seed):
    host = _soup(200, seed=seed)
    mesh = pack_mesh(host)
    assert fits_vmem(mesh)
    o1, d1 = _rays(512, seed=seed + 10)
    o2, d2 = _aimed_rays(host, 512, seed=seed + 20)
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t_max = jnp.full((1024,), 1e6, jnp.float32)

    slot_a, t_a = traverse(mesh, o, d, t_max)
    slot_b, t_b = traverse_packets(mesh, o, d, t_max, interpret=True)

    np.testing.assert_array_equal(np.asarray(slot_a), np.asarray(slot_b))
    hit = np.asarray(slot_a) >= 0
    # Winning slots must agree exactly; t only to fp-association tolerance
    # (the scalar-broadcast M-T evaluates in a different order — and the
    # integrator recomputes t differentiably from the slot anyway).
    np.testing.assert_allclose(
        np.asarray(t_a)[hit], np.asarray(t_b)[hit], rtol=1e-4
    )


def test_packets_padding():
    """Ray counts that don't divide the 1024-lane block size."""
    host = _soup(60, seed=5)
    mesh = pack_mesh(host)
    o, d = _aimed_rays(host, 100, seed=6)
    t_max = jnp.full((100,), 1e6, jnp.float32)
    slot_a, t_a = traverse(mesh, o, d, t_max)
    slot_b, t_b = traverse_packets(mesh, o, d, t_max, interpret=True)
    assert slot_b.shape == (100,)
    np.testing.assert_array_equal(np.asarray(slot_a), np.asarray(slot_b))


def test_packets_respect_t_max():
    """Hits beyond t_max (e.g. an earlier sphere hit) must be rejected."""
    host = _soup(60, seed=7)
    mesh = pack_mesh(host)
    o, d = _aimed_rays(host, BLOCK, seed=8)
    wide = jnp.full((BLOCK,), 1e6, jnp.float32)
    slot_w, t_w = traverse_packets(mesh, o, d, wide, interpret=True)
    hit = np.asarray(slot_w) >= 0
    assert hit.sum() > 10
    # Cap t_max below each found hit: every one must disappear.
    tight = jnp.where(slot_w >= 0, t_w * 0.5, wide)
    slot_t, _ = traverse_packets(mesh, o, d, tight, interpret=True)
    assert (np.asarray(slot_t)[hit] == -1).all()
