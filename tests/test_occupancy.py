"""Empty-space skip (differender_tpu.occupancy): conservativeness of the
structure and exactness of the skipping march."""
import numpy as np
import jax
import jax.numpy as jnp

from conftest import make_sphere_volume, make_shell_volume
from differender_tpu import RenderConfig, render_nondiff, get_tf
from differender_tpu.occupancy import (build_occupancy, jump_steps,
                                       tf_alpha_range_max)


def test_tf_alpha_range_max(rng):
    tf = jnp.asarray(rng.random((16, 4), dtype=np.float32))
    tab = np.asarray(tf_alpha_range_max(tf))
    a = np.asarray(tf[:, 3])
    for lo in range(16):
        for hi in range(lo, 16):
            assert tab[lo, hi] == a[lo:hi + 1].max()


def test_distance_field_conservative(rng):
    """Every sample position with TF alpha above threshold must lie in a
    cell with dist == 0; and any jump from a head position must only skip
    samples whose classified alpha is <= alpha_skip."""
    from differender_tpu.sampling import trilinear, apply_tf
    vol = jnp.asarray(make_shell_volume((24, 24, 24)))
    tf = jnp.asarray(np.asarray(get_tf("tf1", 32)))
    cfg = RenderConfig(volume_shape=vol.shape, image_shape=(8, 8))
    grid = build_occupancy(vol, tf, cfg, cell=4)

    pts = jnp.asarray(rng.uniform(-1, 1, (4096, 3)).astype(np.float32))
    inten = trilinear(vol, pts)
    alpha = apply_tf(tf, inten)[:, 3]
    nx, ny, nz = grid.shape

    def cell_of(p, size, n):
        v = jnp.clip(0.5 * p + 0.5, 0.0, 1.0) * np.float32(size - 1.0 - 1e-4)
        return jnp.clip((v / grid.cell).astype(jnp.int32), 0, n - 1)

    ci = (cell_of(pts[:, 0], 24, nx) * ny
          + cell_of(pts[:, 1], 24, ny)) * nz + cell_of(pts[:, 2], 24, nz)
    d = np.asarray(jnp.take(grid.dist, ci))
    hot = np.asarray(alpha) > cfg.alpha_skip
    assert (d[hot] == 0).all()


def test_jump_steps_skips_only_empty(rng):
    """From random heads along random directions, every skipped sample must
    classify below alpha_skip."""
    from differender_tpu.sampling import trilinear, apply_tf
    vol = jnp.asarray(make_sphere_volume((24, 24, 24), radius=0.4))
    tf = jnp.asarray(np.asarray(get_tf("tf1", 32)))
    cfg = RenderConfig(volume_shape=vol.shape, image_shape=(8, 8))
    grid = build_occupancy(vol, tf, cfg, cell=4)

    N = 512
    p0 = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    dirs = rng.normal(size=(N, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    dt = jnp.full((N,), 0.004, jnp.float32)

    adv = jump_steps(grid, vol.shape, p0[:, 0], p0[:, 1], p0[:, 2], dt)
    adv_np = np.asarray(adv)
    # Check each skipped sample (subsample for speed).
    max_check = 64
    ss = np.minimum(adv_np, max_check)
    for frac in (0.0, 0.25, 0.5, 0.75, 0.999):
        k = (ss * frac).astype(np.int32)
        sel = adv_np > 0
        pts = p0 + (k * dt)[:, None] * dirs
        inten = trilinear(vol, pts)
        alpha = np.asarray(apply_tf(tf, inten)[:, 3])
        assert (alpha[sel & (k < adv_np)] <= cfg.alpha_skip + 1e-7).all()


def test_nondiff_with_occupancy_is_exact(sphere_volume, shell_volume):
    """render_nondiff with occupancy skipping == without, BIT-for-bit.

    Parametrized over cell sizes so jumps genuinely fire (at cell 8 on
    32^3 test volumes every cell borders an occupied one and the jump
    path is dormant).  Bitwise equality holds because jump advances are
    rounded down to march-block multiples: the visited blocks are then a
    subset of the no-skip march's blocks, so supercell group bases and
    the composite's per-block partial sums are identical f32 arithmetic
    (render._nd_jump; ~1-ulp reassociation differences otherwise)."""
    tf = np.asarray(get_tf("tf1", 32))
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    for vol in (sphere_volume, shell_volume):
        for cell, md in ((0, 0), (8, 12), (4, 24), (2, 48)):
            cfg_on = RenderConfig(volume_shape=vol.shape, image_shape=(12, 12),
                                  occupancy_cell=cell, occupancy_max_dist=md)
            cfg_off = cfg_on.replace(occupancy_skip=False)
            for sr in (1.0, 6.0):
                a = render_nondiff(vol, tf, lf, cfg_on,
                                   sampling_rate=sr).image
                b = render_nondiff(vol, tf, lf, cfg_off,
                                   sampling_rate=sr).image
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolved_occupancy_auto():
    """Auto sizing: smallest cell with <= 2^21 macrocells, ~96-voxel reach."""
    cases = [((32,) * 3, 2, 48), ((256,) * 3, 2, 48),
             ((512,) * 3, 4, 24), ((1024,) * 3, 8, 12)]
    for shape, want_cell, want_md in cases:
        cfg = RenderConfig(volume_shape=shape, image_shape=(8, 8))
        cell, md = cfg.resolved_occupancy()
        assert (cell, md) == (want_cell, want_md), (shape, cell, md)
    # explicit values pass through untouched
    cfg = RenderConfig(volume_shape=(64,) * 3, image_shape=(8, 8),
                       occupancy_cell=16, occupancy_max_dist=5)
    assert cfg.resolved_occupancy() == (16, 5)


def test_prebuilt_grid_reuse(sphere_volume):
    tf = np.asarray(get_tf("tf1", 32))
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(8, 8))
    grid = build_occupancy(sphere_volume, tf, cfg)
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    a = render_nondiff(sphere_volume, tf, lf, cfg, sampling_rate=2.0,
                       occupancy=grid).image
    b = render_nondiff(sphere_volume, tf, lf, cfg, sampling_rate=2.0).image
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wavefront_compaction_equivalent(sphere_volume):
    """The phased compacted march == the plain while loop (each ray marches
    the identical sample sequence; images agree to XLA fusion noise)."""
    tf = np.asarray(get_tf("tf1", 32))
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    # compaction_min=32 forces a multi-phase ladder even at 12x12
    cfg_c = RenderConfig(volume_shape=sphere_volume.shape,
                         image_shape=(12, 12), compaction_min=32)
    cfg_n = cfg_c.replace(nondiff_compaction=False)
    for sr in (1.0, 6.0):
        a = render_nondiff(sphere_volume, tf, lf, cfg_c,
                           sampling_rate=sr).image
        b = render_nondiff(sphere_volume, tf, lf, cfg_n,
                           sampling_rate=sr).image
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_compaction_under_vmap(sphere_volume):
    """Batched nondiff rendering (vmap over cameras) must work with the
    multi-phase compaction ladder (vmapped while_loops + argsort)."""
    tf = np.asarray(get_tf("tf1", 32))
    lfs = jnp.asarray(np.stack([[1.2, 0.8, 2.0], [-2.0, 0.5, 1.0]],
                               axis=0).astype(np.float32))
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(12, 12),
                       compaction_min=32)
    batched = jax.vmap(lambda lf: render_nondiff(
        sphere_volume, tf, lf, cfg, sampling_rate=2.0).image)(lfs)
    for k in range(2):
        single = render_nondiff(sphere_volume, tf, lfs[k], cfg,
                                sampling_rate=2.0).image
        np.testing.assert_allclose(np.asarray(batched[k]),
                                   np.asarray(single), atol=1e-6)


def test_strips_with_jitter(sphere_volume):
    """Strip execution must reproduce the jittered monolithic render (the
    shared make_rays consumes the key once for the full image)."""
    from differender_tpu import render_nondiff_strips
    tf = np.asarray(get_tf("tf1", 32))
    lf = np.array([1.2, 0.8, 2.0], np.float32)
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(12, 12))
    key = jax.random.PRNGKey(3)
    a = render_nondiff(sphere_volume, tf, lf, cfg, sampling_rate=2.0,
                       key=key).image
    b = render_nondiff_strips(sphere_volume, tf, lf, cfg, sampling_rate=2.0,
                              key=key, n_strips=3).image
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
