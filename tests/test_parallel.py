"""Multi-device tests on the virtual 8-CPU-device mesh (SURVEY §4 impl. 5)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from differender_tpu import RenderConfig, render, get_tf, mse_loss
from differender_tpu.parallel import (render_views, view_parallel_grads,
                                      render_volume_sharded, shard_volume)


def _mesh(axis, n):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def _cfg(shape, hw=(6, 6), **kw):
    kw.setdefault("max_samples", 48)
    kw.setdefault("block_size", 8)
    return RenderConfig(volume_shape=shape, image_shape=hw, **kw)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_render_views_matches_single(sphere_volume):
    cfg = _cfg(sphere_volume.shape)
    tf = jnp.asarray(get_tf("tf5", 16))
    lfs = jnp.asarray(np.stack(
        [[np.cos(a) * 2.4, 0.6, np.sin(a) * 2.4] for a in
         np.linspace(0, 3, 8)]).astype(np.float32))
    mesh = _mesh("views", 8)
    imgs = render_views(jnp.asarray(sphere_volume), tf, lfs, cfg, mesh,
                        sampling_rate=0.5)
    assert imgs.shape == (8, 6, 6, 4)
    for k in [0, 3, 7]:
        single = render(sphere_volume, tf, lfs[k], cfg, sampling_rate=0.5).image
        np.testing.assert_allclose(np.asarray(imgs[k]), np.asarray(single),
                                   atol=1e-4)


def test_view_parallel_grads_match_single_device(sphere_volume):
    cfg = _cfg(sphere_volume.shape)
    tf = jnp.asarray(get_tf("tf5", 16))
    vol = jnp.asarray(sphere_volume)
    lfs = jnp.asarray(np.stack(
        [[np.cos(a) * 2.4, 0.6, np.sin(a) * 2.4] for a in
         np.linspace(0, 3, 8)]).astype(np.float32))
    targets = jax.vmap(
        lambda l: render(vol, tf, l, cfg, sampling_rate=0.5).image)(lfs)
    targets = targets * 0.9   # make the loss nonzero

    mesh = _mesh("views", 8)
    loss, (gv, gt) = view_parallel_grads(
        mse_loss, vol, tf, lfs, targets, cfg, mesh, sampling_rate=0.5)

    def single_loss(v, t):
        imgs = jax.vmap(lambda l: render(v, t, l, cfg, sampling_rate=0.5).image)(lfs)
        return jnp.mean(jax.vmap(mse_loss)(imgs, targets))

    loss_s, (gv_s, gt_s) = jax.value_and_grad(single_loss, argnums=(0, 1))(vol, tf)
    np.testing.assert_allclose(float(loss), float(loss_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_s),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_s),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_volume_sharded_matches_unsharded(sphere_volume, n_shards):
    cfg = _cfg(sphere_volume.shape)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
    mesh = _mesh("space", n_shards)
    vol_sharded = shard_volume(jnp.asarray(sphere_volume), mesh)
    out = render_volume_sharded(vol_sharded, tf, lf, cfg, mesh,
                                sampling_rate=0.6)
    want = render(sphere_volume, tf, lf, cfg, sampling_rate=0.6, ert=False)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(want.image),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.valid_steps),
                                  np.asarray(want.valid_steps))


def test_volume_sharded_axis_aligned_view(sphere_volume):
    """Camera along the shard axis: all rays cross every shard."""
    cfg = _cfg(sphere_volume.shape)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.asarray(np.array([2.5, 0.05, 0.1], np.float32))   # ~ -x view
    mesh = _mesh("space", 4)
    out = render_volume_sharded(shard_volume(jnp.asarray(sphere_volume), mesh),
                                tf, lf, cfg, mesh, sampling_rate=0.6)
    want = render(sphere_volume, tf, lf, cfg, sampling_rate=0.6, ert=False)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(want.image),
                               atol=1e-4)


def test_volume_sharded_jitter(sphere_volume):
    cfg = _cfg(sphere_volume.shape)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
    key = jax.random.PRNGKey(3)
    mesh = _mesh("space", 4)
    out = render_volume_sharded(shard_volume(jnp.asarray(sphere_volume), mesh),
                                tf, lf, cfg, mesh, sampling_rate=0.6, key=key)
    want = render(sphere_volume, tf, lf, cfg, sampling_rate=0.6, ert=False,
                  key=key)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(want.image),
                               atol=1e-4)


def test_volume_sharded_grads_match(sphere_volume):
    cfg = _cfg(sphere_volume.shape, hw=(5, 5), max_samples=32)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
    mesh = _mesh("space", 4)
    w = jnp.asarray(np.random.default_rng(0).random((5, 5, 4), np.float32))

    def loss_sharded(v, t):
        img = render_volume_sharded(v, t, lf, cfg, mesh,
                                    sampling_rate=0.6).image
        return jnp.sum(img * w)

    def loss_single(v, t):
        img = render(v, t, lf, cfg, sampling_rate=0.6, ert=False).image
        return jnp.sum(img * w)

    vol = jnp.asarray(sphere_volume)
    gv, gt = jax.grad(loss_sharded, argnums=(0, 1))(vol, tf)
    gv_s, gt_s = jax.grad(loss_single, argnums=(0, 1))(vol, tf)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_s),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_s),
                               atol=2e-4, rtol=1e-3)


def test_volume_sharded_segment_window(sphere_volume):
    """A reduced per-shard window still renders exactly for a side-on view
    (each shard's slab chord is short)."""
    cfg = _cfg(sphere_volume.shape)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.asarray(np.array([0.1, 0.4, 2.4], np.float32))  # ~ -z view
    mesh = _mesh("space", 8)
    out = render_volume_sharded(
        shard_volume(jnp.asarray(sphere_volume), mesh), tf, lf, cfg, mesh,
        sampling_rate=0.6, segment_max_samples=16)
    want = render(sphere_volume, tf, lf, cfg, sampling_rate=0.6, ert=False)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(want.image),
                               atol=1e-4)


@pytest.mark.slow
def test_views_x_space_combined_grads_match(sphere_volume):
    """Combined 2x4 views x space mesh: one SPMD step's loss and gradients
    match the single-device computation (the `dryrun_multichip` topology,
    verified for numerics rather than just loss decrease)."""
    import functools
    from differender_tpu.geometry import RayBundle, make_rays
    from differender_tpu.parallel import segment_render, segment_length

    cfg = _cfg(sphere_volume.shape, hw=(5, 5), max_samples=32)
    tf = jnp.asarray(get_tf("tf5", 16))
    vol = jnp.asarray(sphere_volume)
    sr = 0.6
    length, block = segment_length(cfg, sr)
    dv, ds = 2, 4
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(dv, ds),
                ("views", "space"))

    n_views = 4   # 2 per views-device
    # Generic (off-axis) cameras: an exactly axis-aligned view puts samples
    # on integer voxel coordinates, where the trilinear derivative's cell
    # attribution is fp-rounding-dependent between the two (equally valid)
    # evaluation orders.
    angles = np.linspace(0.17, 2.5, n_views)
    lfs = [jnp.asarray(np.array(
        [np.cos(a) * 2.4, 0.6, np.sin(a) * 2.4], np.float32))
        for a in angles]
    rays = [make_rays(lf, cfg, sr) for lf in lfs]
    rays_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rays)
    targets = jnp.stack([
        render(vol * 0.9, tf, lfs[i], cfg, sampling_rate=sr, ert=False).image
        for i in range(n_views)])

    # The SPMD forward: views x space shard_map returning per-view images.
    # Loss and grads are taken OUTSIDE (differentiating THROUGH the
    # shard_map): per-device jax.grad of a replicated loss over-counts
    # cotangents through all_gather by the axis size (its transpose is a
    # psum — sum-over-replica-losses semantics), so grads must be computed
    # around the shard_map, not inside it.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("space"), P(), P("views")),
        out_specs=P("views"),
        check_vma=False,
    )
    def render_views_sharded_vol(vol_local, tf_, rays_local):
        imgs = []
        for i in range(n_views // dv):
            rb = jax.tree.map(lambda x: x[i], rays_local)
            img, _ = segment_render(vol_local, tf_, RayBundle(*rb), cfg, sr,
                                    "space", length, block)
            imgs.append(img)
        return jnp.stack(imgs)

    def combined_loss(v, t):
        imgs = render_views_sharded_vol(v, t, rays_stacked)
        return jnp.mean((imgs - targets) ** 2)

    loss, (gv, gt) = jax.jit(jax.value_and_grad(
        combined_loss, argnums=(0, 1)))(vol, tf)

    def single_loss(v, t):
        imgs = jnp.stack([
            render(v, t, lfs[i], cfg, sampling_rate=sr, ert=False).image
            for i in range(n_views)])
        return jnp.mean((imgs - targets) ** 2)

    loss_s, (gv_s, gt_s) = jax.value_and_grad(
        single_loss, argnums=(0, 1))(vol, tf)
    np.testing.assert_allclose(float(loss), float(loss_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_s),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_s),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_fast_sharded_matches_unsharded(sphere_volume, n_shards):
    """Sharded shear-warp == unsharded shear-warp (strip decomposition)."""
    from differender_tpu.fastpath import render_fast, render_fast_sharded

    cfg = _cfg(sphere_volume.shape, hw=(8, 8))
    tf = jnp.asarray(get_tf("tf5", 16))
    vol = jnp.asarray(sphere_volume)
    mesh = _mesh("space", n_shards)
    for lf_np in ([1.3, 0.7, 2.1], [2.5, 0.05, 0.1], [-0.2, -2.3, 0.4]):
        lf = jnp.asarray(np.array(lf_np, np.float32))
        out = render_fast_sharded(vol, tf, lf, cfg, mesh,
                                  intermediate=16, planes_per_voxel=1.0)
        want = render_fast(vol, tf, lf, cfg, intermediate=16,
                           planes_per_voxel=1.0)
        np.testing.assert_allclose(np.asarray(out.image),
                                   np.asarray(want.image), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.hit),
                                      np.asarray(want.hit))


@pytest.mark.slow
def test_fast_sharded_grads_match(sphere_volume):
    from differender_tpu.fastpath import render_fast, render_fast_sharded

    cfg = _cfg(sphere_volume.shape, hw=(6, 6))
    tf = jnp.asarray(get_tf("tf5", 16))
    vol = jnp.asarray(sphere_volume)
    lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
    mesh = _mesh("space", 4)
    w = jnp.asarray(np.random.default_rng(1).random((6, 6, 4), np.float32))

    gv, gt = jax.grad(lambda v, t: jnp.sum(render_fast_sharded(
        v, t, lf, cfg, mesh, intermediate=16).image * w),
        argnums=(0, 1))(vol, tf)
    gv_s, gt_s = jax.grad(lambda v, t: jnp.sum(render_fast(
        v, t, lf, cfg, intermediate=16).image * w),
        argnums=(0, 1))(vol, tf)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_s),
                               atol=2e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_s),
                               atol=2e-5, rtol=1e-3)


class TestTrainStepViews:
    """parallel.train_step_views (VERDICT r2 #5): both modes == the plain
    serial mean-loss gradient."""

    def _problem(self, sphere_volume, B=4):
        from differender_tpu import get_tf, render_nondiff
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf5", 16))
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(8, 8),
                           max_samples=48, block_size=8)
        lfs = jnp.asarray(np.stack([
            [1.3, 0.7, 2.1], [-2.0, 0.5, 1.0],
            [0.5, -1.5, 1.8], [2.2, 0.2, -0.8]], axis=0).astype(np.float32))
        tgts = jnp.stack([render_nondiff(vol, tf, lf, cfg,
                                         sampling_rate=2.0).image
                          for lf in lfs])
        return vol, tf, cfg, lfs[:B], tgts[:B]

    @staticmethod
    def _serial(loss_fn, vol, tf, lfs, tgts, cfg, sr):
        from differender_tpu import render

        def total(v, t):
            losses = [loss_fn(render(v, t, lf, cfg, sr).image, tgt)
                      for lf, tgt in zip(lfs, tgts)]
            return jnp.mean(jnp.stack(losses))

        l, g = jax.value_and_grad(total, argnums=(0, 1))(vol, tf)
        return l, g

    def test_accum_matches_serial(self, sphere_volume):
        from differender_tpu.losses import mse_loss
        from differender_tpu.parallel import train_step_views
        vol, tf, cfg, lfs, tgts = self._problem(sphere_volume)
        l0, (gv0, gt0) = self._serial(mse_loss, vol, tf, lfs, tgts, cfg, 0.7)
        l1, (gv1, gt1) = train_step_views(
            mse_loss, vol, tf, lfs, tgts, cfg, sampling_rate=0.7,
            mode="accum")
        # same math, different accumulation order -> f32 noise only
        assert abs(float(l0) - float(l1)) < 1e-6
        sv = max(float(jnp.abs(gv0).max()), 1e-9)
        st = max(float(jnp.abs(gt0).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                                   atol=1e-4 * sv)
        np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt0),
                                   atol=1e-4 * st)

    def test_shard_map_matches_serial(self, sphere_volume):
        from differender_tpu.losses import mse_loss
        from differender_tpu.parallel import train_step_views
        vol, tf, cfg, lfs, tgts = self._problem(sphere_volume)
        mesh = _mesh("views", 4)
        l1, (gv1, gt1) = train_step_views(
            mse_loss, vol, tf, lfs, tgts, cfg, sampling_rate=0.7,
            mesh=mesh)
        l0, (gv0, gt0) = self._serial(mse_loss, vol, tf, lfs, tgts, cfg, 0.7)
        assert abs(float(l0) - float(l1)) < 1e-6
        sv = max(float(jnp.abs(gv0).max()), 1e-9)
        st = max(float(jnp.abs(gt0).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                                   atol=1e-4 * sv)
        np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt0),
                                   atol=1e-4 * st)

    @pytest.mark.slow
    def test_shard_map_with_keys_local_batch(self, sphere_volume):
        """2 views per device + jitter keys: exercises the local scan."""
        from differender_tpu.losses import mse_loss
        from differender_tpu.parallel import train_step_views
        vol, tf, cfg, lfs, tgts = self._problem(sphere_volume)
        mesh = _mesh("views", 2)
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        l1, (gv1, gt1) = train_step_views(
            mse_loss, vol, tf, lfs, tgts, cfg, sampling_rate=0.7,
            keys=keys, mesh=mesh)
        l2, (gv2, gt2) = train_step_views(
            mse_loss, vol, tf, lfs, tgts, cfg, sampling_rate=0.7,
            keys=keys, mode="accum")
        assert abs(float(l1) - float(l2)) < 1e-6
        sv = max(float(jnp.abs(gv2).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2),
                                   atol=1e-4 * sv)

    @pytest.mark.slow
    def test_accum_shearwarp_renderer(self, sphere_volume):
        """renderer='shearwarp' in accum mode == direct render_fast grads."""
        from differender_tpu.fastpath import render_fast
        from differender_tpu.losses import mse_loss
        from differender_tpu.parallel import train_step_views
        vol, tf, cfg, lfs, tgts = self._problem(sphere_volume, B=2)
        l1, (gv1, gt1) = train_step_views(
            mse_loss, vol, tf, lfs, tgts, cfg, sampling_rate=1.0,
            mode="accum", renderer="shearwarp")

        def total(v, t):
            losses = [mse_loss(render_fast(v, t, lf, cfg,
                                           planes_per_voxel=1.0).image, tgt)
                      for lf, tgt in zip(lfs, tgts)]
            return jnp.mean(jnp.stack(losses))

        l0, (gv0, gt0) = jax.value_and_grad(total, argnums=(0, 1))(vol, tf)
        assert abs(float(l0) - float(l1)) < 1e-6
        sv = max(float(jnp.abs(gv0).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                                   atol=1e-4 * sv)
