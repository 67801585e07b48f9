"""Gradient correctness: JAX AD through the checkpointed march vs
finite differences of the float64 NumPy oracle (SURVEY §4, implication (3);
target <= 1e-3 per BASELINE.md)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differender_tpu import RenderConfig, render, get_tf
from differender_tpu.optim import nan_to_num_grads, value_and_clean_grad

import np_reference as ref


def _loss_weights(shape, seed=0):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


def _np_loss(vol, tf, lf, W, H, sr, weights, max_samples):
    out, _, _ = ref.render_np(vol, tf, lf, W, H, sr, max_samples=max_samples)
    return float(np.sum(out * weights))


def test_volume_grads_match_finite_differences(rng):
    vol = np.clip(rng.random((8, 8, 8), dtype=np.float32), 0.05, 0.95)
    tf = np.asarray(get_tf("tf5", 16), np.float64)
    tf = np.clip(tf, 0.0, 0.98)  # keep 1/(1-a)^... well-conditioned
    lf = np.array([1.0, 0.7, 2.2])
    W = H = 6
    sr = 0.8
    cfg = RenderConfig(volume_shape=vol.shape, image_shape=(H, W),
                       tf_resolution=16, max_samples=64, block_size=8)
    weights_wh = _loss_weights((W, H, 4))
    weights_img = ref.to_image(weights_wh)

    def loss_fn(v):
        img = render(v, jnp.asarray(tf, jnp.float32), jnp.asarray(lf, jnp.float32),
                     cfg, sampling_rate=sr).image
        return jnp.sum(img * weights_img)

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(vol, jnp.float32)))

    eps = 1e-4
    idxs = [(2, 3, 4), (4, 4, 4), (1, 6, 2), (6, 2, 5), (3, 3, 3), (0, 4, 4)]
    for ijk in idxs:
        vp, vm = vol.copy(), vol.copy()
        vp[ijk] += eps
        vm[ijk] -= eps
        fd = (_np_loss(vp, tf, lf, W, H, sr, weights_wh, 64)
              - _np_loss(vm, tf, lf, W, H, sr, weights_wh, 64)) / (2 * eps)
        assert abs(g[ijk] - fd) < max(1e-3, 2e-2 * abs(fd)), (ijk, g[ijk], fd)


def test_tf_grads_match_finite_differences(rng):
    vol = np.clip(rng.random((8, 8, 8), dtype=np.float32), 0.05, 0.95)
    tf = np.asarray(get_tf("gray", 16), np.float64)
    lf = np.array([-1.5, 0.5, 1.8])
    W = H = 6
    sr = 0.8
    cfg = RenderConfig(volume_shape=vol.shape, image_shape=(H, W),
                       tf_resolution=16, max_samples=64, block_size=8)
    weights_wh = _loss_weights((W, H, 4), seed=1)
    weights_img = ref.to_image(weights_wh)

    def loss_fn(t):
        img = render(jnp.asarray(vol), t, jnp.asarray(lf, jnp.float32),
                     cfg, sampling_rate=sr).image
        return jnp.sum(img * weights_img)

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(tf, jnp.float32)))

    eps = 1e-4
    for (r, c) in [(4, 0), (7, 3), (8, 1), (10, 3), (12, 2)]:
        tp, tm = tf.copy(), tf.copy()
        tp[r, c] += eps
        tm[r, c] -= eps
        fd = (_np_loss(vol, tp, lf, W, H, sr, weights_wh, 64)
              - _np_loss(vol, tm, lf, W, H, sr, weights_wh, 64)) / (2 * eps)
        assert abs(g[r, c] - fd) < max(1e-3, 2e-2 * abs(fd)), ((r, c), g[r, c], fd)


def test_jittered_grads_deterministic(sphere_volume):
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(6, 6),
                       max_samples=32, block_size=8)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.array([1.0, 0.7, 2.2])
    key = jax.random.PRNGKey(11)

    def loss_fn(v):
        return jnp.sum(render(v, tf, lf, cfg, sampling_rate=0.5, key=key).image)

    g1 = jax.grad(loss_fn)(jnp.asarray(sphere_volume))
    g2 = jax.grad(loss_fn)(jnp.asarray(sphere_volume))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_grads_are_finite(sphere_volume):
    """With an alpha=1 TF texel the opacity-correction derivative blows up in
    the reference (inf scrubbed by nan_to_num, `:463-464`); our grads with
    in-range TFs must be finite without scrubbing."""
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(6, 6),
                       max_samples=32, block_size=8)
    tf = jnp.asarray(get_tf("tf1", 32))
    lf = jnp.array([0.5, 1.0, 2.3])

    def loss_fn(v, t):
        return jnp.sum(render(v, t, lf, cfg, sampling_rate=1.0).image)

    gv, gt = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(sphere_volume), tf)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gt)).all()
    assert float(jnp.abs(gt).max()) > 0.0


def test_value_and_clean_grad_scrubs():
    def bad(x):
        return jnp.sum(jnp.sqrt(x))   # grad at 0 -> inf

    val, g = value_and_clean_grad(bad)(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    g_raw = jax.grad(bad)(jnp.zeros(3))
    assert not np.isfinite(np.asarray(g_raw)).all()
    scrubbed = nan_to_num_grads({"g": g_raw})
    assert np.isfinite(np.asarray(scrubbed["g"])).all()


def test_camera_grads_exist(sphere_volume):
    """Beyond the reference: gradients w.r.t. the camera position."""
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(6, 6),
                       max_samples=32, block_size=8)
    tf = jnp.asarray(get_tf("tf5", 16))

    def loss_fn(lf):
        return jnp.sum(render(jnp.asarray(sphere_volume), tf, lf, cfg,
                              sampling_rate=0.5).image)

    g = jax.grad(loss_fn)(jnp.array([1.0, 0.7, 2.2]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_camera_grads_flag_refuses_tiled_vjp(sphere_volume):
    """camera_grads=True + the tiled VJP would silently return zero
    sample-position cotangents — render must refuse loudly.  ('sorted'
    accepts since round 5: exact position cotangents on request.)"""
    tf = jnp.asarray(get_tf("tf5", 16))
    vol = jnp.asarray(sphere_volume)
    cfg = RenderConfig(volume_shape=sphere_volume.shape,
                       image_shape=(16, 16), max_samples=32,
                       block_size=8, march_vjp="tiled", camera_grads=True)
    with pytest.raises(ValueError, match="camera_grads"):
        render(vol, tf, jnp.array([1.0, 0.7, 2.2]), cfg,
               sampling_rate=0.5)
    # The declared-intent combination works: ad + camera_grads=True.
    cfg = RenderConfig(volume_shape=sphere_volume.shape, image_shape=(6, 6),
                       max_samples=32, block_size=8, camera_grads=True)
    g = jax.grad(lambda lf: jnp.sum(
        render(vol, tf, lf, cfg, sampling_rate=0.5).image))(
        jnp.array([1.0, 0.7, 2.2]))
    assert float(jnp.abs(g).max()) > 0.0


@pytest.mark.parametrize("table", ["super64", "super64s2"])
def test_camera_grads_sorted_matches_ad(sphere_volume, table):
    """Round 5 (VERDICT r4 item 5): camera gradients under the SHIPPED
    fast VJP.  march_vjp='sorted' + camera_grads=True emits exact
    sample-position cotangents (sampling._position_cotangents
    differentiates the same forward eval the AD path does), so look_from
    grads match march_vjp='ad' on both table flavors."""
    vol = jnp.asarray(sphere_volume)
    tf = jnp.asarray(get_tf("tf5", 16))
    lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
    key = jax.random.PRNGKey(7)
    cfg_ad = RenderConfig(volume_shape=vol.shape, image_shape=(16, 16),
                          max_samples=48, block_size=8, march_table=table,
                          march_vjp="ad", camera_grads=True)
    cfg_s = cfg_ad.replace(march_vjp="sorted")

    def loss(cfg):
        return lambda l: jnp.sum(render(
            vol, tf, l, cfg, sampling_rate=0.7, key=key).image ** 2)

    g_ad = jax.grad(loss(cfg_ad))(lf)
    g_s = jax.grad(loss(cfg_s))(lf)
    assert float(jnp.abs(g_ad).max()) > 0.0
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_ad),
                               rtol=1e-3, atol=1e-9)


def test_sorted_position_cotangents_finite_difference():
    """The sorted VJP's sample-position cotangents
    (sampling._position_cotangents) against central differences of the
    sampler itself.  NOTE an end-to-end FD test on look_from is ill-posed:
    per-ray ``n_samples = floor(sr*ray_len*diag) + 1`` makes the rendered
    loss DISCONTINUOUS in the camera (some ray always sits near a floor
    boundary), so FD is checked here at the sampler level where the
    function is piecewise smooth (hat weights), at generic non-boundary
    positions.  End-to-end camera-grad correctness is covered by the
    sorted == AD tests above."""
    from differender_tpu.sampling import (SampleSpec, sample_block_sorted,
                                          supercell_table)
    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.random((16, 16, 16), np.float32))
    table = jnp.asarray(np.asarray(supercell_table(vol)))
    K, N = 4, 8
    spec = SampleSpec(volume_shape=(16, 16, 16), delta=1e-3, group=1,
                      parity=True, n_tiles=1, box=8, box_rows=256,
                      window_rows=64, camera_grads=True)
    # Generic world positions well inside the volume, away from voxel
    # boundaries (coordinate = clip(0.5*(p+d)+0.5)*15 — irrational-ish
    # offsets keep every stencil point off integer coordinates).
    p = (rng.random((3, K, N)) * 1.4 - 0.7 + 0.013).astype(np.float32)
    px, py, pz = (jnp.asarray(p[i]) for i in range(3))
    wi = jnp.asarray(rng.random((K, N), np.float32))
    wg = jnp.asarray(rng.random((3, K, N), np.float32))

    def loss(px_, py_, pz_):
        i0, (gx, gy, gz) = sample_block_sorted(spec, vol, table,
                                               px_, py_, pz_)
        return jnp.sum(wi * i0 + wg[0] * gx + wg[1] * gy + wg[2] * gz)

    g = jax.grad(loss, argnums=(0, 1, 2))(px, py, pz)
    eps = 3e-4
    # FD a handful of entries per axis (full Jacobian FD would be slow).
    checked = 0
    for ax, parr in enumerate((px, py, pz)):
        for (k, n) in [(0, 0), (1, 3), (3, 7)]:
            e = jnp.zeros((K, N), jnp.float32).at[k, n].set(eps)
            args_p = [px, py, pz]
            args_m = [px, py, pz]
            args_p[ax] = parr + e
            args_m[ax] = parr - e
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            got = float(g[ax][k, n])
            # f32 FD noise: loss is O(10), eps 3e-4 -> ~1e-3 absolute.
            assert abs(fd - got) <= 5e-2 * max(abs(fd), abs(got), 0.1), (
                ax, k, n, fd, got)
            checked += 1
    assert checked == 9


def test_camera_grads_blockwise_refuses(sphere_volume):
    """The host-level blockwise backward cannot produce look_from grads
    (rays built eagerly on the host) — it must refuse camera_grads."""
    from differender_tpu.render import value_and_grad_blockwise
    vol = jnp.asarray(sphere_volume)
    tf = jnp.asarray(get_tf("tf5", 16))
    cfg = RenderConfig(volume_shape=vol.shape, image_shape=(8, 8),
                       max_samples=32, block_size=8, march_table="super64",
                       march_vjp="sorted", camera_grads=True)
    with pytest.raises(ValueError, match="camera_grads"):
        value_and_grad_blockwise(vol, tf, jnp.array([1.0, 0.7, 2.2]), cfg,
                                 lambda out: jnp.mean(out.image ** 2))


class TestTiledVJP:
    """march_vjp='tiled' (hand-written per-tile volume-grad scatter) ==
    march_vjp='ad' for image, volume grads, and TF grads.  Images match to
    f32 lane-regrouping noise (the AD path uses grouped supercell sampling
    — several steps per row gather, summing identical values over
    different lane patterns — while the tiled path's parity branch stays
    ungrouped); grads match up to f32 summation-order noise."""

    @pytest.mark.parametrize("analytic", [True, False])
    @pytest.mark.parametrize("hw", [(16, 16), (32, 32)])
    def test_matches_ad(self, sphere_volume, analytic, hw):
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf5", 16))
        lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
        w = jnp.asarray(np.random.default_rng(3).random(
            hw + (4,), np.float32))
        key = jax.random.PRNGKey(7)
        cfg_ad = RenderConfig(volume_shape=vol.shape, image_shape=hw,
                              max_samples=48, block_size=8,
                              analytic_normals=analytic,
                              march_table="super64", march_vjp="ad")
        cfg_t = cfg_ad.replace(march_vjp="tiled")

        def loss(cfg):
            return lambda v, t: jnp.sum(render(
                v, t, lf, cfg, sampling_rate=0.7, key=key).image * w)

        img_a = render(vol, tf, lf, cfg_ad, sampling_rate=0.7, key=key).image
        img_t = render(vol, tf, lf, cfg_t, sampling_rate=0.7, key=key).image
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_a),
                                   atol=1e-5)
        gv_a, gt_a = jax.grad(loss(cfg_ad), argnums=(0, 1))(vol, tf)
        gv_t, gt_t = jax.grad(loss(cfg_t), argnums=(0, 1))(vol, tf)
        sv = float(jnp.abs(gv_a).max())
        st = float(jnp.abs(gt_a).max())
        np.testing.assert_allclose(np.asarray(gv_t), np.asarray(gv_a),
                                   atol=2e-3 * max(sv, 1e-9))
        np.testing.assert_allclose(np.asarray(gt_t), np.asarray(gt_a),
                                   atol=2e-3 * max(st, 1e-9))



class TestTiledVJPContainmentCheck:
    """vjp_check: the tiled VJP must poison (NaN) instead of silently
    clamping when a tile's sample footprint exceeds vjp_box (advisor
    round-2 low finding)."""

    def _grads(self, vol, cfg):
        tf = jnp.asarray(get_tf("tf5", 16))
        lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))

        def loss(v):
            return jnp.sum(render(v, tf, lf, cfg, sampling_rate=0.7).image)

        return np.asarray(jax.grad(loss)(vol))

    def test_violation_poisons(self):
        # 32^3 volume with an 8-voxel box and ONE 16x16 tile: the tile's
        # rays span most of the volume -> footprint >> box.
        from conftest import make_sphere_volume
        vol = jnp.asarray(make_sphere_volume((32, 32, 32)))
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(16, 16),
                           max_samples=48, block_size=8,
                           march_table="super64", march_vjp="tiled",
                           vjp_tile=16, vjp_box=8, vjp_check=True)
        gv = self._grads(vol, cfg)
        assert np.isnan(gv).any()

    def test_valid_config_stays_finite(self):
        from conftest import make_sphere_volume
        vol = jnp.asarray(make_sphere_volume((16, 16, 16)))
        # Box >= volume: containment guaranteed; check must not fire.
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(16, 16),
                           max_samples=48, block_size=8,
                           march_table="super64", march_vjp="tiled",
                           vjp_tile=16, vjp_box=32, vjp_check=True)
        gv = self._grads(vol, cfg)
        assert np.isfinite(gv).all()
        cfg_ad = cfg.replace(march_vjp="ad", vjp_check=False)
        gv_ad = self._grads(vol, cfg_ad)
        np.testing.assert_allclose(
            gv, gv_ad, atol=2e-3 * max(float(np.abs(gv_ad).max()), 1e-9))


class TestSortedVJP:
    """march_vjp='sorted' (sorted-window box scatter, round 4) ==
    march_vjp='ad' for image, volume grads, and TF grads — including with
    tiny window/box sizes that force multiple windows AND multiple runtime
    sub-box passes per window (the exactness mechanism that replaces the
    tiled path's clamping).  Unlike tiled, the sorted parity forward is
    grouped exactly like the AD path, so images match to plain f32 noise."""

    @pytest.mark.parametrize("analytic", [True, False])
    @pytest.mark.parametrize("wrows,brows", [(1 << 17, 1 << 18),  # defaults
                                             (512, 1024)])  # forced multi
    def test_matches_ad(self, sphere_volume, analytic, wrows, brows):
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf5", 16))
        lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
        hw = (16, 16)
        w = jnp.asarray(np.random.default_rng(3).random(
            hw + (4,), np.float32))
        key = jax.random.PRNGKey(7)
        cfg_ad = RenderConfig(volume_shape=vol.shape, image_shape=hw,
                              max_samples=48, block_size=8,
                              analytic_normals=analytic,
                              march_table="super64", march_vjp="ad")
        cfg_s = cfg_ad.replace(march_vjp="sorted", vjp_window_rows=wrows,
                               vjp_box_rows=brows)

        def loss(cfg):
            return lambda v, t: jnp.sum(render(
                v, t, lf, cfg, sampling_rate=0.7, key=key).image * w)

        img_a = render(vol, tf, lf, cfg_ad, sampling_rate=0.7, key=key).image
        img_s = render(vol, tf, lf, cfg_s, sampling_rate=0.7, key=key).image
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_a),
                                   atol=1e-6)
        gv_a, gt_a = jax.grad(loss(cfg_ad), argnums=(0, 1))(vol, tf)
        gv_s, gt_s = jax.grad(loss(cfg_s), argnums=(0, 1))(vol, tf)
        sv = float(jnp.abs(gv_a).max())
        st = float(jnp.abs(gt_a).max())
        np.testing.assert_allclose(np.asarray(gv_s), np.asarray(gv_a),
                                   atol=2e-3 * max(sv, 1e-9))
        np.testing.assert_allclose(np.asarray(gt_s), np.asarray(gt_a),
                                   atol=2e-3 * max(st, 1e-9))

    def test_uneven_dims_and_jitter(self):
        """Non-cubic volume (distinct Y/Z strides in the fold) + jittered
        rays + window size not dividing the row count (padding path)."""
        rng = np.random.default_rng(11)
        vol = jnp.asarray(rng.random((24, 20, 16), np.float32))
        tf = jnp.asarray(get_tf("tf1", 32))
        lf = jnp.asarray(np.array([-1.1, 0.9, 1.7], np.float32))
        key = jax.random.PRNGKey(3)
        cfg_ad = RenderConfig(volume_shape=(24, 20, 16), image_shape=(12, 12),
                              tf_resolution=32, max_samples=48, block_size=8,
                              march_table="super64", march_vjp="ad")
        cfg_s = cfg_ad.replace(march_vjp="sorted", vjp_window_rows=448,
                               vjp_box_rows=1536)

        def loss(cfg):
            return lambda v: jnp.sum(render(
                v, tf, lf, cfg, sampling_rate=0.9, key=key).image ** 2)

        gv_a = jax.grad(loss(cfg_ad))(vol)
        gv_s = jax.grad(loss(cfg_s))(vol)
        sv = float(jnp.abs(gv_a).max())
        np.testing.assert_allclose(np.asarray(gv_s), np.asarray(gv_a),
                                   atol=2e-3 * max(sv, 1e-9))

    def test_requires_super64(self):
        cfg = RenderConfig(volume_shape=(16, 16, 16), image_shape=(8, 8),
                           march_table="cell8", march_vjp="sorted")
        with pytest.raises(ValueError, match="sorted"):
            render(jnp.zeros((16, 16, 16)), jnp.zeros((128, 4)),
                   jnp.asarray(np.array([1.0, 0.5, 2.0], np.float32)), cfg)

    @pytest.mark.parametrize("wrows,brows", [(1 << 17, 1 << 18),  # defaults
                                             (384, 640)])  # forced multi
    def test_stride2_matches_ad(self, sphere_volume, wrows, brows):
        """march_vjp='sorted' over the stride-2 table (the 512^3-class
        path: even-base keys, stride-2 fold) == the AD scatter, including
        with boxes far smaller than the even-base key range."""
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf5", 16))
        lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
        key = jax.random.PRNGKey(7)
        w = jnp.asarray(np.random.default_rng(3).random(
            (16, 16, 4), np.float32))
        cfg_ad = RenderConfig(volume_shape=vol.shape, image_shape=(16, 16),
                              max_samples=48, block_size=8,
                              march_table="super64s2", march_vjp="ad")
        cfg_s = cfg_ad.replace(march_vjp="sorted", vjp_window_rows=wrows,
                               vjp_box_rows=brows)

        def loss(cfg):
            return lambda v, t: jnp.sum(render(
                v, t, lf, cfg, sampling_rate=0.7, key=key).image * w)

        img_a = render(vol, tf, lf, cfg_ad, sampling_rate=0.7, key=key).image
        img_s = render(vol, tf, lf, cfg_s, sampling_rate=0.7, key=key).image
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_a),
                                   atol=1e-6)
        gv_a, gt_a = jax.grad(loss(cfg_ad), argnums=(0, 1))(vol, tf)
        gv_s, gt_s = jax.grad(loss(cfg_s), argnums=(0, 1))(vol, tf)
        sv = float(jnp.abs(gv_a).max())
        st = float(jnp.abs(gt_a).max())
        np.testing.assert_allclose(np.asarray(gv_s), np.asarray(gv_a),
                                   atol=2e-3 * max(sv, 1e-9))
        np.testing.assert_allclose(np.asarray(gt_s), np.asarray(gt_a),
                                   atol=2e-3 * max(st, 1e-9))

    def test_vmap_batched_grads(self, sphere_volume):
        """The sorted VJP composes with vmap (the Raycaster's batched
        training path): per-view grads of a vmapped multi-view loss match
        the serial per-view grads."""
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf1", 16))
        lfs = jnp.asarray(np.array([[1.3, 0.7, 2.1], [-1.0, 1.1, 1.8]],
                                   np.float32))
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(12, 12),
                           tf_resolution=16, max_samples=32, block_size=8,
                           march_table="super64", march_vjp="sorted",
                           vjp_window_rows=512, vjp_box_rows=1024)

        def view_loss(v, lf):
            return jnp.mean(render(v, tf, lf, cfg,
                                   sampling_rate=0.8).image ** 2)

        gv_b = jax.grad(lambda v: jnp.sum(
            jax.vmap(lambda lf: view_loss(v, lf))(lfs)))(vol)
        gv_s = sum(jax.grad(view_loss)(vol, lfs[i]) for i in range(2))
        sv = float(jnp.abs(gv_s).max())
        np.testing.assert_allclose(np.asarray(gv_b), np.asarray(gv_s),
                                   atol=2e-3 * max(sv, 1e-9))


class TestBlockwiseVJP:
    """value_and_grad_blockwise: the host-level per-block backward must be
    numerically identical (same block math, different program partitioning)
    to jax.value_and_grad over render() — for both march_vjp modes, with
    ERT block skip, and with jitter replay."""

    @pytest.mark.parametrize("vjp_mode,table,compact",
                             [("ad", "auto", 0),
                              ("sorted", "super64", 0),
                              ("sorted", "super64s2", 0),
                              ("sorted", "super64", 2),
                              ("sorted", "super64s2", 2),
                              ("ad", "auto", 2)])
    def test_matches_monolithic(self, sphere_volume, vjp_mode, table,
                                compact):
        from differender_tpu import value_and_grad_blockwise
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf1", 16))
        lf = jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32))
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(12, 12),
                           tf_resolution=16, max_samples=32, block_size=8,
                           march_table=table, march_vjp=vjp_mode,
                           vjp_window_rows=512, vjp_box_rows=1024,
                           compact_after=compact)
        key = jax.random.PRNGKey(7)

        def loss_fn(out):
            return jnp.mean(out.image ** 2)

        # jit the monolithic reference too: the blockwise path runs its
        # ray setup and march blocks as compiled programs, and XLA's
        # fusion rounding differs from op-by-op eager evaluation by ulps
        # (loss rel ~3e-5 unjitted); compiled-vs-compiled plus a small
        # tolerance for the differing program partitioning is the honest
        # comparison.
        ref_loss, (gv_r, gt_r) = jax.jit(jax.value_and_grad(
            lambda v, t: loss_fn(render(v, t, lf, cfg, sampling_rate=0.8,
                                        key=key)), argnums=(0, 1)))(vol, tf)
        bl_loss, (gv_b, gt_b) = value_and_grad_blockwise(
            vol, tf, lf, cfg, loss_fn, sampling_rate=0.8, key=key)
        np.testing.assert_allclose(float(bl_loss), float(ref_loss),
                                   rtol=1e-4)
        sv = float(jnp.abs(gv_r).max())
        st = float(jnp.abs(gt_r).max())
        np.testing.assert_allclose(np.asarray(gv_b), np.asarray(gv_r),
                                   atol=1e-4 * max(sv, 1e-9))
        np.testing.assert_allclose(np.asarray(gt_b), np.asarray(gt_r),
                                   atol=1e-4 * max(st, 1e-9))

    def test_auto_selection_policy(self, sphere_volume):
        """value_and_grad_render routes 512^3-class sorted configs to the
        blockwise split backward and everything else to the monolith; the
        monolithic route must agree with plain jax.value_and_grad."""
        from differender_tpu import value_and_grad_render
        # Decision logic (pure, no rendering): the measured boundary.
        big = RenderConfig(volume_shape=(512, 512, 512),
                           image_shape=(512, 512), max_samples=512,
                           block_size=32, march_vjp="sorted")
        assert big.resolved_march_table() == "super64s2"
        assert big.use_blockwise_grad()
        assert not big.replace(march_vjp="ad").use_blockwise_grad()
        small = RenderConfig(volume_shape=sphere_volume.shape,
                             image_shape=(8, 8), max_samples=16,
                             block_size=8, march_vjp="sorted",
                             march_table="super64s2")
        assert not small.use_blockwise_grad()  # below the voxel floor
        # Numerics through the wrapper (monolithic route).
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf1", 16))
        lf = jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32))
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(8, 8),
                           tf_resolution=16, max_samples=16, block_size=8)

        def loss_fn(out):
            return jnp.mean(out.image ** 2)

        l_a, (gv_a, gt_a) = value_and_grad_render(vol, tf, lf, cfg, loss_fn,
                                                  sampling_rate=0.8)
        l_r, (gv_r, gt_r) = jax.value_and_grad(
            lambda v, t: loss_fn(render(v, t, lf, cfg, sampling_rate=0.8)),
            argnums=(0, 1))(vol, tf)
        np.testing.assert_allclose(float(l_a), float(l_r), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gv_a), np.asarray(gv_r))
        np.testing.assert_allclose(np.asarray(gt_a), np.asarray(gt_r))

    def test_loss_args_traced(self, sphere_volume):
        """Per-step targets passed via loss_args (traced jit arguments)
        must match the same loss written as a closure capture — and must
        not require a fresh loss_fn identity per target."""
        from differender_tpu import value_and_grad_blockwise
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf1", 16))
        lf = jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32))
        cfg = RenderConfig(volume_shape=vol.shape, image_shape=(8, 8),
                           tf_resolution=16, max_samples=16, block_size=8,
                           march_vjp="ad")
        rng = np.random.default_rng(3)
        targets = [jnp.asarray(rng.random((8, 8, 4), np.float32))
                   for _ in range(2)]

        def loss_with_target(out, target):
            return jnp.mean((out.image - target) ** 2)

        for target in targets:
            l_args, (gv_a, _) = value_and_grad_blockwise(
                vol, tf, lf, cfg, loss_with_target, sampling_rate=0.8,
                loss_args=(target,))
            l_ref, (gv_r, _) = jax.jit(jax.value_and_grad(
                lambda v, t: jnp.mean(
                    (render(v, t, lf, cfg, sampling_rate=0.8).image
                     - target) ** 2), argnums=(0, 1)))(vol, tf)
            np.testing.assert_allclose(float(l_args), float(l_ref),
                                       rtol=1e-4)
            sv = float(jnp.abs(gv_r).max())
            np.testing.assert_allclose(np.asarray(gv_a), np.asarray(gv_r),
                                       atol=1e-4 * max(sv, 1e-9))

    def test_rejects_sorted_with_bad_table(self, sphere_volume):
        """sorted VJP + cell8/flat table: d_volume would be silently zero
        (vol_op is stop_gradient'd, the hand-VJP branch never fires) —
        must raise like march_diff does."""
        from differender_tpu import value_and_grad_blockwise
        cfg = RenderConfig(volume_shape=sphere_volume.shape,
                           image_shape=(8, 8), tf_resolution=16,
                           max_samples=16, block_size=8,
                           march_table="cell8", march_vjp="sorted")
        with pytest.raises(ValueError, match="super64"):
            value_and_grad_blockwise(
                jnp.asarray(sphere_volume), jnp.asarray(get_tf("tf1", 16)),
                jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32)), cfg,
                lambda out: jnp.mean(out.image ** 2), sampling_rate=0.8)

    def test_rejects_tiled(self, sphere_volume):
        from differender_tpu import value_and_grad_blockwise
        cfg = RenderConfig(volume_shape=sphere_volume.shape,
                           image_shape=(8, 8), tf_resolution=16,
                           max_samples=32, block_size=8,
                           march_table="super64", march_vjp="tiled",
                           vjp_tile=4)
        with pytest.raises(ValueError, match="blockwise"):
            value_and_grad_blockwise(
                jnp.asarray(sphere_volume), jnp.asarray(get_tf("tf1", 16)),
                jnp.asarray(np.array([1.2, 0.8, 2.0], np.float32)), cfg,
                lambda out: jnp.mean(out.image ** 2), sampling_rate=0.8)
