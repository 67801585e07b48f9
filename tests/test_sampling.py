import numpy as np
import jax.numpy as jnp
import pytest

from differender_tpu.sampling import trilinear, sample_with_gradient, apply_tf

import np_reference as ref


def test_trilinear_matches_oracle(rng):
    vol = rng.random((9, 7, 11), dtype=np.float32)
    pos = rng.uniform(-1.2, 1.2, size=(200, 3)).astype(np.float32)
    got = np.asarray(trilinear(jnp.asarray(vol), jnp.asarray(pos)))
    want = np.array([ref.trilinear(vol, p) for p in pos])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_hits_voxel_values(rng):
    """Sampling exactly at a voxel's continuous coordinate returns its value.

    Voxel (i,j,k) sits at normalized coord c = i/(s-1-1e-4) -> world
    pos = 2c - 1 (inverse of the reference mapping `:163-165`)."""
    vol = rng.random((8, 8, 8), dtype=np.float32)
    s = np.array(vol.shape, np.float64) - 1.0 - 1e-4
    for ijk in [(0, 0, 0), (3, 4, 5), (7, 7, 7), (1, 6, 2)]:
        c = np.array(ijk, np.float64) / s
        pos = jnp.asarray(2.0 * c - 1.0, jnp.float32)
        got = float(trilinear(jnp.asarray(vol), pos))
        assert abs(got - vol[ijk]) < 1e-3


def test_gradient_matches_oracle(rng):
    vol = rng.random((9, 9, 9), dtype=np.float32)
    pos = rng.uniform(-0.9, 0.9, size=(50, 3)).astype(np.float32)
    val, grad = sample_with_gradient(jnp.asarray(vol), jnp.asarray(pos))
    want_v = np.array([ref.trilinear(vol, p) for p in pos])
    want_g = np.array([ref.volume_gradient(vol, p) for p in pos])
    np.testing.assert_allclose(np.asarray(val), want_v, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), want_g, atol=1e-5)


def test_apply_tf_matches_oracle(rng):
    tf = rng.random((32, 4), dtype=np.float32)
    intensity = np.concatenate([
        rng.random(100, dtype=np.float32),
        np.array([0.0, 1.0, 0.999999, 0.5], np.float32),
    ])
    got = np.asarray(apply_tf(jnp.asarray(tf), jnp.asarray(intensity)))
    want = np.array([ref.apply_tf(tf, i) for i in intensity])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_apply_tf_texel_exact(rng):
    tf = rng.random((16, 4), dtype=np.float32)
    idx = np.arange(16, dtype=np.float32) / 15.0
    got = np.asarray(apply_tf(jnp.asarray(tf), jnp.asarray(idx)))
    np.testing.assert_allclose(got, tf, atol=1e-5)


class TestSupercell:
    """Supercell (4x4x4-row) samplers == cell-table samplers exactly."""

    def _ray_positions(self, key, K, N, step_scale=0.01):
        """Consecutive ray-like sample positions (valid for grouping)."""
        import jax
        k1, k2 = jax.random.split(key)
        p0 = jax.random.uniform(k1, (3, 1, N), jnp.float32) * 1.6 - 0.8
        d = jax.random.normal(k2, (3, 1, N), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
        s = jnp.arange(K, dtype=jnp.float32).reshape(1, K, 1)
        p = p0 + s * step_scale * d
        return p[0], p[1], p[2]

    @pytest.mark.parametrize("group", [1, 2, 4])
    def test_parity_matches_cell(self, sphere_volume, group):
        import jax
        from differender_tpu.sampling import (cell_table, supercell_table,
                                              sample_cell_parity,
                                              sample_super_parity)
        vol = jnp.asarray(sphere_volume)
        shape = vol.shape
        cell = cell_table(vol)
        sup = supercell_table(vol)
        px, py, pz = self._ray_positions(jax.random.PRNGKey(0), 8, 64)
        i1, (a1, b1, c1) = sample_cell_parity(cell, shape, px, py, pz)
        i2, (a2, b2, c2) = sample_super_parity(sup, shape, px, py, pz,
                                               group=group)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)
        for u, v in ((a1, a2), (b1, b2), (c1, c2)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-6)

    @pytest.mark.parametrize("group", [1, 2, 4])
    def test_analytic_matches_cell(self, sphere_volume, group):
        import jax
        from differender_tpu.sampling import (cell_table, supercell_table,
                                              sample_cell_analytic,
                                              sample_super_analytic)
        vol = jnp.asarray(sphere_volume)
        shape = vol.shape
        cell = cell_table(vol)
        sup = supercell_table(vol)
        # step small enough that `group` consecutive samples share a row
        px, py, pz = self._ray_positions(jax.random.PRNGKey(1), 8, 64,
                                         step_scale=0.01)
        i1, (a1, b1, c1) = sample_cell_analytic(cell, shape, px, py, pz)
        i2, (a2, b2, c2) = sample_super_analytic(sup, shape, px, py, pz,
                                                 group=group)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)
        for u, v in ((a1, a2), (b1, b2), (c1, c2)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-6)

    def test_clamped_boundary_positions(self, sphere_volume):
        """Positions beyond the volume clamp identically in both paths."""
        from differender_tpu.sampling import (cell_table, supercell_table,
                                              sample_cell_parity,
                                              sample_super_parity)
        vol = jnp.asarray(sphere_volume)
        shape = vol.shape
        cell = cell_table(vol)
        sup = supercell_table(vol)
        edge = jnp.asarray(np.array(
            [[-1.2, -1.0, -0.999], [1.2, 1.0, 0.999]], np.float32))
        px = jnp.broadcast_to(edge[:, 0][:, None], (2, 3))
        py = jnp.broadcast_to(edge[:, 1][:, None], (2, 3))
        pz = jnp.broadcast_to(edge[:, 2][:, None], (2, 3))
        i1, g1 = sample_cell_parity(cell, shape, px, py, pz)
        i2, g2 = sample_super_parity(sup, shape, px, py, pz)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)
        for u, v in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-6)

    def test_render_table_kinds_agree(self, sphere_volume):
        """End-to-end: render with flat / cell8 / super64 tables agrees."""
        from differender_tpu import RenderConfig, render, get_tf
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf5", 16))
        lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
        imgs = {}
        for kind in ("flat", "cell8", "super64"):
            cfg = RenderConfig(volume_shape=vol.shape, image_shape=(6, 6),
                               max_samples=48, block_size=8,
                               march_table=kind)
            imgs[kind] = np.asarray(
                render(vol, tf, lf, cfg, sampling_rate=0.7).image)
        np.testing.assert_allclose(imgs["cell8"], imgs["flat"], atol=1e-5)
        np.testing.assert_allclose(imgs["super64"], imgs["flat"], atol=1e-5)


class TestSupercellStride2:
    """Stride-2 supercell table (the 512^3 parity fallback) == cell-table
    parity sampling."""

    def test_matches_cell_parity(self, sphere_volume, rng):
        from differender_tpu.sampling import (cell_table, supercell2_table,
                                              sample_cell_parity,
                                              sample_super2_parity)
        vol = jnp.asarray(sphere_volume)
        shape = vol.shape
        cell = cell_table(vol)
        s2 = supercell2_table(vol)
        assert s2.shape == (shape[0] * shape[1] * shape[2] // 8, 64)
        px, py, pz = (jnp.asarray(
            rng.uniform(-1.05, 1.05, (4, 64)).astype(np.float32))
            for _ in range(3))
        i1, g1 = sample_cell_parity(cell, shape, px, py, pz)
        i2, g2 = sample_super2_parity(s2, shape, px, py, pz)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)
        for u, v in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-6)

    @pytest.mark.parametrize("group", [2, 4])
    def test_grouped_matches_cell_parity(self, sphere_volume, group):
        """Step-grouped stride-2 sampling (group span + even-floor slack
        within the 4-point row cover) == per-sample cell-table parity."""
        import jax
        from differender_tpu.sampling import (cell_table, supercell2_table,
                                              sample_cell_parity,
                                              sample_super2_parity)
        vol = jnp.asarray(sphere_volume)
        shape = vol.shape
        cell = cell_table(vol)
        s2 = supercell2_table(vol)
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        p0 = jax.random.uniform(k1, (3, 1, 64), jnp.float32) * 1.6 - 0.8
        d = jax.random.normal(k2, (3, 1, 64), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
        s = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
        p = p0 + s * 0.005 * d
        px, py, pz = p[0], p[1], p[2]
        i1, g1 = sample_cell_parity(cell, shape, px, py, pz)
        i2, g2 = sample_super2_parity(s2, shape, px, py, pz, group=group)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)
        for u, v in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-6)

    def test_render_and_grads_match_cell8(self, sphere_volume):
        import jax
        from differender_tpu import RenderConfig, render, get_tf
        vol = jnp.asarray(sphere_volume)
        tf = jnp.asarray(get_tf("tf5", 16))
        lf = jnp.asarray(np.array([1.3, 0.7, 2.1], np.float32))
        cfg8 = RenderConfig(volume_shape=vol.shape, image_shape=(8, 8),
                            max_samples=48, block_size=8,
                            march_table="cell8")
        cfg2 = cfg8.replace(march_table="super64s2")
        r8 = render(vol, tf, lf, cfg8, sampling_rate=0.7).image
        r2 = render(vol, tf, lf, cfg2, sampling_rate=0.7).image
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r8),
                                   atol=1e-5)
        g8 = jax.grad(lambda v: jnp.sum(render(
            v, tf, lf, cfg8, sampling_rate=0.7).image))(vol)
        g2 = jax.grad(lambda v: jnp.sum(render(
            v, tf, lf, cfg2, sampling_rate=0.7).image))(vol)
        sc = max(float(jnp.abs(g8).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g8),
                                   atol=1e-4 * sc)

    def test_auto_rule(self):
        from differender_tpu import RenderConfig
        big = RenderConfig(volume_shape=(512,) * 3, image_shape=(8, 8))
        assert big.resolved_march_table() == "super64s2"
        assert big.replace(
            analytic_normals=True).resolved_march_table() == "cell8"
        assert RenderConfig(volume_shape=(256,) * 3,
                            image_shape=(8, 8)).resolved_march_table() \
            == "super64"


class TestSortedVolumeGrad:
    """Direct oracle test of the sorted-window placement kernel
    (_sorted_volume_grad): random row cotangents — duplicate bases, dead
    rows, boundary-clamped bases, tiny windows forcing multiple runtime
    sub-box passes — must equal the dense per-lane accumulation."""

    def _oracle(self, shape, base_xyz, d_rows, stride):
        X, Y, Z = shape
        out = np.zeros((X, Y, Z), np.float64)
        for (bx, by, bz), row in zip(base_xyz, d_rows):
            for lane in range(64):
                dx, dy, dz = lane // 16, (lane // 4) % 4, lane % 4
                vx, vy, vz = bx + dx, by + dy, bz + dz
                if vx < X and vy < Y and vz < Z:
                    out[vx, vy, vz] += row[lane]
        return out.astype(np.float32)

    @pytest.mark.parametrize("stride", [1, 2])
    @pytest.mark.parametrize("wrows,brows", [(64, 128), (1 << 17, 1 << 18)])
    def test_matches_dense_oracle(self, rng, stride, wrows, brows):
        import jax.numpy as jnp
        from differender_tpu.sampling import SampleSpec, _sorted_volume_grad
        shape = (12, 10, 8)
        X, Y, Z = shape
        M = 500
        step = stride
        bx = (rng.integers(0, X - 1, M) // step * step).astype(np.int64)
        by = (rng.integers(0, Y - 1, M) // step * step).astype(np.int64)
        bz = (rng.integers(0, Z - 1, M) // step * step).astype(np.int64)
        d_rows = rng.normal(size=(M, 64)).astype(np.float32)
        d_rows[rng.random(M) < 0.3] = 0.0            # dead rows
        # The kernel's contract: lanes referencing voxels >= size carry
        # exactly zero (guaranteed by the hat-weight construction in
        # _super_bwd_rows) — enforce it on the synthetic rows.
        for lane in range(64):
            dx, dy, dz = lane // 16, (lane // 4) % 4, lane % 4
            oob = ((bx + dx >= X) | (by + dy >= Y) | (bz + dz >= Z))
            d_rows[oob, lane] = 0.0
        if stride == 1:
            key = (bx * Y + by) * Z + bz
        else:
            key = (bx // 2) * (Y * Z) + (by // 2) * Z + bz // 2
        spec = SampleSpec(volume_shape=shape, delta=1e-3, group=1,
                          parity=True, n_tiles=1, box=32,
                          box_rows=brows, window_rows=wrows,
                          stride2=stride == 2)
        got = np.asarray(_sorted_volume_grad(
            spec, jnp.asarray(key, jnp.int32), jnp.asarray(d_rows)))
        want = self._oracle(shape, np.stack([bx, by, bz], -1), d_rows,
                            stride)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_interleave_mxu_bitwise_matches_pad():
    """The MXU permutation-matmul interleave (the 512^3-class
    sorted_finalize branch) must be BITWISE equal to the interior-dilated
    pad form: each output element is 1.0*value plus exact zeros, so
    HIGHEST-precision dots introduce no rounding."""
    import jax
    from differender_tpu.sampling import _interleave_mxu
    X, Y, Z = 6, 8, 10
    Ck = X * Y * Z // 2
    rng = np.random.default_rng(11)
    even = jnp.asarray(rng.standard_normal(Ck).astype(np.float32))
    odd = jnp.asarray(rng.standard_normal(Ck).astype(np.float32))
    got = np.asarray(_interleave_mxu(even, odd, X, Y, Z))
    Zh = Z // 2
    e2 = even.reshape(X * Y, Zh)
    o2 = odd.reshape(X * Y, Zh)
    zero = jnp.float32(0.0)
    want = np.asarray((jax.lax.pad(e2, zero, ((0, 0, 0), (0, 1, 1)))
                       + jax.lax.pad(o2, zero, ((0, 0, 0), (1, 0, 1)))
                       ).reshape(X, Y, Z))
    assert (got == want).all()
