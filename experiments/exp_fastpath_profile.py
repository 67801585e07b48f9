"""Where does the shear-warp slab time go? (CLAUDE.md round-2 plan a)

Ablates _core's per-slab components on the real TPU at the headline config
(256^3 volume, O=768, 2 planes/voxel, 512 slabs):
  full         — the product path
  no_tf        — TF hat expansion replaced by broadcasting intensity to RGBA
  no_shade     — lighting factor forced to 1 (TF still applied)
  no_resample  — einsums replaced by slicing a fixed (4, O, O) block
  tf_dot       — TF classification as outer-difference hat weights fed to an
                 MXU dot against the (R, 4) texture (prototype: is building
                 W as rank-2-matmul + 3 VPU ops, then dot, faster than the
                 unrolled accumulate?)
plus fwd+bwd for full and tf_dot.

All timings use the chained-scalar protocol.  ONE process (rule 6).
Appends JSON lines to experiments/fastpath_profile_results.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from differender_tpu import RenderConfig
from differender_tpu.transfer import get_tf

OUT = os.path.join(os.path.dirname(__file__),
                   "fastpath_profile_results.jsonl")

V, O, PPV, R = 256, 768, 2.0, 128


def chain(f, args, n=2):
    """Chained-scalar timing; arrays passed as jit ARGUMENTS (closure
    constants trip the remote-compile length limit — CLAUDE.md rule 2)."""
    c = f(jnp.float32(0.0), *args)
    jax.block_until_ready(c)
    t0 = time.time()
    for _ in range(n):
        c = f(c, *args)
    jax.block_until_ready(c)
    return (time.time() - t0) / n


def build_core(variant):
    """A faithful reduction of fastpath._core's slab loop with components
    ablated; principal axis fixed to z (camera on -z) to skip branch logic."""
    from differender_tpu.sampling import apply_tf_hat
    from differender_tpu.shading import unit_normal_soa

    cfg = RenderConfig(volume_shape=(V,) * 3, image_shape=(512, 512))
    n_planes = int(PPV * V)
    X = Y = Z = V

    def core(channels, tf, lf, c):
        lx, ly, lz = lf[0], lf[1], lf[2] + c * 1e-6
        x0, x1 = jnp.float32(-1.6), jnp.float32(1.6)
        dx = (x1 - x0) / (O - 1)
        ga = x0 + dx * jnp.arange(O, dtype=jnp.float32)
        gb = ga
        dirx = ga[:, None] - lx
        diry = gb[None, :] - ly
        dmag = jnp.sqrt(dirx ** 2 + diry ** 2 + lz ** 2)
        dz_world = 2.0 / (n_planes - 1)
        exponent = dz_world * dmag / jnp.abs(lz) * np.float32(cfg.vol_diag)
        light = lf + np.array([0, 1, 0], np.float32)
        xsc = np.float32(0.5 * (X - 1))
        zsc = np.float32(0.5 * (Z - 1))
        zws = jnp.linspace(-1.0, 1.0, n_planes)

        def interp_matrix(src, size):
            lo = jnp.floor(src)
            frac = src - lo
            lo_i = lo.astype(jnp.int32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (O, size), 1)
            inside = (src >= 0.0) & (src <= size - 1.0)
            w_lo = jnp.where((cols == lo_i[:, None]) & inside[:, None],
                             (1.0 - frac)[:, None], 0.0)
            w_hi = jnp.where(
                (cols == jnp.minimum(lo_i + 1, size - 1)[:, None])
                & inside[:, None], frac[:, None], 0.0)
            return w_lo + w_hi

        def classify(res0):
            if variant == "no_tf":
                return jnp.stack([res0, res0, res0, res0 * 0.05], -1)
            if variant in ("tf_dot", "tf_dot_bwd"):
                t = jnp.clip(res0 * (R - 1.0), 0.0, R - 1.0)
                # outer difference via rank-2 matmul-free broadcast; W is
                # (O*O, R) per slab — relies on XLA fusing the elementwise
                # producer into the dot tiles.
                w = jnp.maximum(
                    0.0, 1.0 - jnp.abs(t.reshape(-1, 1)
                                       - jnp.arange(R, dtype=jnp.float32)))
                return (w @ tf).reshape(O, O, 4)
            return apply_tf_hat(tf, res0)

        def slab_fn(carry, zw):
            acc_rgb, T = carry
            sz = (zw - lz) / (0.0 - lz)
            src_x = (lx + sz * (ga - lx) + 1.0) * xsc
            src_y = (ly + sz * (gb - ly) + 1.0) * xsc
            zv = jnp.clip((zw + 1.0) * zsc, 0.0, Z - 1.0)
            z_lo = jnp.floor(zv).astype(jnp.int32)
            fz = zv - jnp.floor(zv)
            if variant == "no_resample":
                res = jnp.broadcast_to(
                    channels[:, :1, :1, 0] * (1 - fz), (4, O, O))
                coverage = jnp.ones((O, O), jnp.float32)
            else:
                Mx = interp_matrix(src_x, X)
                My = interp_matrix(src_y, Y)
                slab = (jax.lax.dynamic_index_in_dim(
                            channels, z_lo, axis=3, keepdims=False) * (1 - fz)
                        + jax.lax.dynamic_index_in_dim(
                            channels, jnp.minimum(z_lo + 1, Z - 1), axis=3,
                            keepdims=False) * fz)
                tmp = jnp.einsum("ox,cxy->cyo", Mx, slab,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                res = jnp.einsum("py,cyo->cop", My, tmp,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                coverage = (jnp.sum(Mx, 1)[:, None] * jnp.sum(My, 1)[None, :])
            rgba = classify(res[0])
            if variant == "no_shade":
                lightf = jnp.float32(1.0)
            else:
                g = res[1:4]
                g2 = g[0] ** 2 + g[1] ** 2 + g[2] ** 2
                nx, ny, nz = unit_normal_soa(g[0], g[1], g[2])
                sz2 = (zw - lz) / (0.0 - lz)
                px = jnp.broadcast_to(lx + sz2 * (ga[:, None] - lx), (O, O))
                py = jnp.broadcast_to(ly + sz2 * (gb[None, :] - ly), (O, O))
                pz = jnp.full((O, O), zw, jnp.float32)
                lxr, lyr, lzr = px - light[0], py - light[1], pz - light[2]
                lm = jax.lax.rsqrt(jnp.maximum(
                    lxr ** 2 + lyr ** 2 + lzr ** 2, 1e-30))
                lxr, lyr, lzr = lxr * lm, lyr * lm, lzr * lm
                dot2 = nx * lxr + ny * lyr + nz * lzr
                ndl = jnp.maximum(dot2, 0.0)
                diffuse = 0.8 * jnp.where(g2 > 0, ndl, 0.0)
                rx = lxr - 2 * dot2 * nx
                ry = lyr - 2 * dot2 * ny
                rz = lzr - 2 * dot2 * nz
                vim = jax.lax.rsqrt(jnp.maximum(
                    (px - lx) ** 2 + (py - ly) ** 2 + (pz - lz) ** 2, 1e-30))
                vdx, vdy, vdz = ((px - lx) * vim, (py - ly) * vim,
                                 (pz - lz) * vim)
                rdv = jnp.maximum(-(rx * vdx + ry * vdy + rz * vdz), 0.0)
                specular = 0.3 * jnp.where(g2 > 0, jnp.power(rdv, 32.0), 0.0)
                lightf = jnp.minimum(1.0, diffuse + specular + 0.4)
            alpha = (1.0 - jnp.power(jnp.maximum(1.0 - rgba[..., 3], 0.0),
                                     exponent)) * coverage
            rgb = lightf[..., None] * rgba[..., :3] * alpha[..., None]
            acc_rgb = acc_rgb + T[..., None] * rgb
            T = T * (1.0 - alpha)
            return (acc_rgb, T), None

        slab_fn = jax.checkpoint(slab_fn, prevent_cse=False)
        (acc, T), _ = jax.lax.scan(
            slab_fn, (jnp.zeros((O, O, 3), jnp.float32),
                      jnp.ones((O, O), jnp.float32)), zws)
        return acc, T

    return core


def main():
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, (V,) * 3, jnp.float32) * 0.5
    channels = jnp.concatenate([
        vol[None], jnp.gradient(vol)[0][None],
        jnp.gradient(vol)[1][None], jnp.gradient(vol)[2][None]])
    tf = jnp.asarray(np.asarray(get_tf("tf1", R)))
    lf0 = np.array([0.15, 0.2, -2.4], np.float32)

    recs = []
    for variant in ["full", "no_tf", "no_shade", "no_resample", "tf_dot"]:
        core = build_core(variant)

        @jax.jit
        def fwd(c, ch, t):
            acc, T = core(ch, t, jnp.asarray(lf0), c)
            return c + 1 + acc.sum() * 0 + T.sum() * 0

        s = chain(fwd, (channels, tf))
        rec = {"variant": variant, "fwd_s": round(s, 4),
               "per_slab_ms": round(s / (PPV * V) * 1e3, 4)}
        print(json.dumps(rec), flush=True)
        recs.append(rec)

    for variant in ["full", "tf_dot"]:
        core = build_core(variant)

        @jax.jit
        def step(c, ch, t):
            def loss(ch_, t_):
                acc, T = core(ch_, t_, jnp.asarray(lf0), c)
                return jnp.mean(acc ** 2) + jnp.mean(T ** 2)
            g = jax.grad(loss, argnums=(0, 1))(ch, t)
            return c + 1 + g[0].sum() * 0 + g[1].sum() * 0

        s = chain(step, (channels, tf))
        rec = {"variant": variant + "_fwd_bwd", "fwd_bwd_s": round(s, 4),
               "per_slab_ms": round(s / (PPV * V) * 1e3, 4)}
        print(json.dumps(rec), flush=True)
        recs.append(rec)

    with open(OUT, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
