"""RNG: WangHash/xorshift32 bit-exactness against a direct scalar
reimplementation of cl/tools.cl:2-4, and sampler distribution checks."""

import jax
import jax.numpy as jnp
import numpy as np

from uvtrace.ops import generate as gen_ops
from uvtrace.ops import rng as rng_ops


def scalar_wang_hash(s: int) -> int:
    s &= 0xFFFFFFFF
    s = ((s ^ 61) ^ (s >> 16)) & 0xFFFFFFFF
    s = (s * 9) & 0xFFFFFFFF
    s = (s ^ (s >> 4)) & 0xFFFFFFFF
    s = (s * 0x27D4EB2D) & 0xFFFFFFFF
    s = (s ^ (s >> 15)) & 0xFFFFFFFF
    return s


def scalar_xorshift32(s: int) -> int:
    s &= 0xFFFFFFFF
    s ^= (s << 13) & 0xFFFFFFFF
    s ^= s >> 17
    s ^= (s << 5) & 0xFFFFFFFF
    return s & 0xFFFFFFFF


def test_wang_hash_bit_exact():
    xs = np.array([0, 1, 17, 12345, 2**31, 2**32 - 1, 987654321], dtype=np.uint32)
    got = np.asarray(rng_ops.wang_hash(xs))
    want = np.array([scalar_wang_hash(int(x)) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_xorshift_bit_exact():
    xs = np.array([1, 42, 0xDEADBEEF, 2**32 - 1], dtype=np.uint32)
    got = np.asarray(rng_ops.xorshift32(jnp.asarray(xs)))
    want = np.array([scalar_xorshift32(int(x)) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_random_float_range():
    s = rng_ops.wang_hash(np.arange(1, 10001, dtype=np.uint32))
    _, f = rng_ops.random_float(s)
    f = np.asarray(f)
    assert (f >= 0).all() and (f <= 1.0).all()
    assert abs(f.mean() - 0.5) < 0.02


def test_photon_seeds_deterministic():
    a = np.asarray(rng_ops.photon_seeds(64, (1.0, 2.0, 3.0), 0))
    b = np.asarray(rng_ops.photon_seeds(64, (1.0, 2.0, 3.0), 0))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(rng_ops.photon_seeds(64, (1.0, 2.0, 3.1), 0))
    assert (a != c).any()
    # sharded generation matches the monolithic launch
    lo = np.asarray(rng_ops.photon_seeds(32, (1.0, 2.0, 3.0), 0, start=0))
    hi = np.asarray(rng_ops.photon_seeds(32, (1.0, 2.0, 3.0), 0, start=32))
    np.testing.assert_array_equal(np.concatenate([lo, hi]), a)


def test_advance_global_seed_changes():
    s0 = np.uint32(0)
    s1 = rng_ops.advance_global_seed((0.0, 0.3, 0.0), s0)
    s2 = rng_ops.advance_global_seed((0.0, 0.3, 0.0), s1)
    assert int(s1) != int(s0) and int(s2) != int(s1)


def _check_sphere_uniform(d, n):
    # components should each be mean ~0; y uniform in [-1,1]; unit norm
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    assert abs(d[:, 1].mean()) < 4.0 / np.sqrt(n)
    # cos-theta uniform => var(y) = 1/3
    assert abs(np.var(d[:, 1]) - 1 / 3) < 0.02
    # azimuth uniform
    phi = np.arctan2(d[:, 2], d[:, 0])
    assert abs(phi.mean()) < 0.05


def test_generate_reference_distribution():
    rays = gen_ops.generate_reference(20000, (0.5, 0.3, -0.2), 1.0, global_seed=0)
    o, d = np.asarray(rays.orig), np.asarray(rays.dir)
    assert (o[:, 0] == np.float32(0.5)).all() and (o[:, 2] == np.float32(-0.2)).all()
    assert (o[:, 1] >= 0.3 - 1e-6).all() and (o[:, 1] <= 1.3 + 1e-6).all()
    # origin height uniform on the rod
    assert abs(o[:, 1].mean() - 0.8) < 0.01
    _check_sphere_uniform(d, 20000)


def test_generate_native_distribution():
    rays = gen_ops.generate_native(jax.random.PRNGKey(7), 20000, (0.0, 0.0, 0.0), 2.0)
    o, d = np.asarray(rays.orig), np.asarray(rays.dir)
    assert (o[:, 1] >= 0).all() and (o[:, 1] <= 2.0).all()
    assert abs(o[:, 1].mean() - 1.0) < 0.02
    _check_sphere_uniform(d, 20000)


def test_generate_reference_matches_scalar_stream():
    """Replay photon 5's stream with pure-python xorshift to pin down the
    exact reference semantics (cl/generate.cl:13-33)."""
    light = (0.25, 0.6, -0.75)
    n = 8
    rays = gen_ops.generate_reference(n, light, 1.0, global_seed=0)
    tid = 5
    acc = np.float32(tid * 17 + 1)
    acc = np.float32(acc + np.float32(light[0]) * np.float32(13))
    acc = np.float32(acc + np.float32(light[1]) * np.float32(7))
    acc = np.float32(acc + np.float32(light[2]) * np.float32(11))
    seed = scalar_wang_hash(int(max(0.0, float(acc))))

    def randf():
        nonlocal seed
        seed = scalar_xorshift32(seed)
        return np.float32(np.float32(seed) * np.float32(2.3283064365387e-10))

    height = randf()
    diry = np.float32(randf() * 2 - 1)
    xzlen = np.sqrt(1.0 - float(diry) ** 2)
    while True:
        dx, dz = randf() * 2 - 1, randf() * 2 - 1
        if dx * dx + dz * dz <= 1:
            break
    scale = xzlen / np.sqrt(float(dx) ** 2 + float(dz) ** 2)
    o, d = np.asarray(rays.orig)[tid], np.asarray(rays.dir)[tid]
    np.testing.assert_allclose(o[1], 0.6 + height * 1.0, rtol=1e-6)
    np.testing.assert_allclose(d[1], diry, rtol=1e-6)
    np.testing.assert_allclose(d[0], dx * scale, rtol=1e-5)
    np.testing.assert_allclose(d[2], dz * scale, rtol=1e-5)
