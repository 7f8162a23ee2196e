"""2-D (rays x texels) sharded texel dose maps on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.geometry.procedural import make_box_room
from uvtrace.ops.cluster import build_clusters
from uvtrace.ops.texel import build_atlas
from uvtrace.ops.traverse_clustered import cluster_arrays
from uvtrace.parallel.multihost import make_2d_mesh
from uvtrace.parallel.sharded import sharded_texel_counts


@pytest.fixture(scope="module")
def setup():
    room = make_box_room(subdivisions=4, clutter=1, seed=13)
    scene = cluster_arrays(build_clusters(room.tris, cluster_size=128))
    atlas = build_atlas(room.areas, density=4.0)
    tris = jnp.asarray(room.tris)
    return room, scene, atlas, tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]


def _pad_texels(n, shards):
    return ((n + shards - 1) // shards) * shards


def test_2d_mesh_shapes():
    mesh = make_2d_mesh(ray_shards=4, texel_shards=2)
    assert mesh.shape == {"rays": 4, "texels": 2}


def test_sharded_texel_counts(setup):
    room, scene, atlas, v0, e1, e2 = setup
    mesh = make_2d_mesh(ray_shards=4, texel_shards=2)
    n_texels = _pad_texels(atlas.n_slots, 2)
    lamp = jnp.array([0.0, room.floor_height + 0.8, 0.0], jnp.float32)
    counts = sharded_texel_counts(
        mesh, scene, atlas, v0, e1, e2, jax.random.PRNGKey(0), lamp, 1.0,
        n_per_device=1024, n_texels=n_texels,
    )
    counts = np.asarray(counts)
    assert counts.shape == (n_texels,)
    total = 4 * 1024
    assert 0 < counts.sum() <= total
    assert counts.sum() > 0.9 * total  # closed room


def test_sharded_matches_single_shard(setup):
    room, scene, atlas, v0, e1, e2 = setup
    n_texels = _pad_texels(atlas.n_slots, 2)
    lamp = jnp.array([0.0, room.floor_height + 0.8, 0.0], jnp.float32)
    args = (scene, atlas, v0, e1, e2, jax.random.PRNGKey(5), lamp, 1.0)
    c_22 = np.asarray(sharded_texel_counts(
        make_2d_mesh(ray_shards=4, texel_shards=2), *args,
        n_per_device=1024, n_texels=n_texels))
    c_41 = np.asarray(sharded_texel_counts(
        make_2d_mesh(ray_shards=4, texel_shards=1), *args,
        n_per_device=1024, n_texels=n_texels))
    # same rays (key folded by ray-axis index only) => identical histograms
    np.testing.assert_array_equal(c_22, c_41)
