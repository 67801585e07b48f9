"""Independent NumPy oracle renderer.

A direct per-pixel/per-sample transcription of the reference math
(`/root/reference/differender/volume_raycaster.py`), written as plain Python
loops so it shares no code with the JAX implementation under test.  Slow —
use tiny volumes/images only.

Conventions: volume (X, Y, Z) internal order, tf (R, 4), output in the
internal (W, H) buffer orientation [i=x-pixel, j=y-pixel] like the Taichi
fields — tests convert orientations explicitly.
"""
import math

import numpy as np


def low_high_frac(x):
    x = max(x, 0.0)
    low = math.floor(x)
    return int(low), int(low) + 1, x - low


def ray_dir(orig, view_dir, x, y, fov_rad, near, aspect):
    u, v = x - 0.5, y - 0.5
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(view_dir, up)
    right = right / np.linalg.norm(right)
    up = np.cross(right, view_dir)
    up = up / np.linalg.norm(up)
    near_h = 2.0 * math.tan(fov_rad) * near
    near_w = near_h * aspect
    near_pos = orig + near * view_dir + u * near_w * right + v * near_h * up
    d = near_pos - orig
    return d / np.linalg.norm(d)


def entry_exit(look_from, vd, bl, tr):
    with np.errstate(divide="ignore", invalid="ignore"):
        dirfrac = 1.0 / vd
    t1 = (bl[0] - look_from[0]) * dirfrac[0]
    t2 = (tr[0] - look_from[0]) * dirfrac[0]
    t3 = (bl[1] - look_from[1]) * dirfrac[1]
    t4 = (tr[1] - look_from[1]) * dirfrac[1]
    t5 = (bl[2] - look_from[2]) * dirfrac[2]
    t6 = (tr[2] - look_from[2]) * dirfrac[2]
    tmin = max(min(t1, t2), min(t3, t4), min(t5, t6))
    tmax = min(max(t1, t2), max(t3, t4), max(t5, t6))
    hit = not (tmax < 0.0 or tmin > tmax)
    return tmin, tmax, hit


def trilinear(vol, pos):
    shape = np.array(vol.shape, np.float64)
    p = np.clip(0.5 * pos + 0.5, 0.0, 1.0) * (shape - 1.0 - 1e-4)
    xl, xh, xf = low_high_frac(p[0])
    yl, yh, yf = low_high_frac(p[1])
    zl, zh, zf = low_high_frac(p[2])
    xh = min(xh, vol.shape[0] - 1)
    yh = min(yh, vol.shape[1] - 1)
    zh = min(zh, vol.shape[2] - 1)
    v000, v100 = vol[xl, yl, zl], vol[xh, yl, zl]
    v010, v110 = vol[xl, yh, zl], vol[xh, yh, zl]
    v001, v101 = vol[xl, yl, zh], vol[xh, yl, zh]
    v011, v111 = vol[xl, yh, zh], vol[xh, yh, zh]
    a = v000 * (1 - xf) + v100 * xf
    b = v010 * (1 - xf) + v110 * xf
    lo = a * (1 - yf) + b * yf
    a = v001 * (1 - xf) + v101 * xf
    b = v011 * (1 - xf) + v111 * xf
    hi = a * (1 - yf) + b * yf
    return lo * (1 - zf) + hi * zf


def volume_gradient(vol, pos, delta=1e-3):
    g = np.zeros(3)
    for ax in range(3):
        d = np.zeros(3)
        d[ax] = delta
        g[ax] = trilinear(vol, pos + d) - trilinear(vol, pos - d)
    return g


def apply_tf(tf, intensity):
    R = tf.shape[0]
    low, high, frac = low_high_frac(intensity * (R - 1))
    low = min(low, R - 1)
    high = min(high, R - 1)
    return tf[low] * (1 - frac) + tf[high] * frac


def render_np(vol, tf, look_from, W, H, sampling_rate, max_samples=512,
              fov_deg=30.0, near=0.1, jitter_t=None, ert=True,
              nondiff=False, alpha_skip=1e-3):
    """Render; returns (out (W,H,4), valid_counts (W,H), n_samples (W,H)).

    jitter_t: optional (W, H) array of uniform draws in [0,1) applied like
    the reference jitter; None disables jitter.
    """
    vol = np.asarray(vol, np.float64)
    tf = np.asarray(tf, np.float64)
    lf = np.asarray(look_from, np.float64)
    aspect = W / H
    fov_rad = math.radians(fov_deg)
    view_dir = -lf / np.linalg.norm(lf)
    shape = np.array(vol.shape, np.float64)
    vol_diag = np.linalg.norm(shape - 1.0)
    bl, tr = np.array([-1.0] * 3), np.array([1.0] * 3)

    out = np.zeros((W, H, 4))
    counts = np.ones((W, H), np.int32)
    nsamp = np.zeros((W, H), np.int32)

    for i in range(W):
        for j in range(H):
            x = (i + 0.5) / W
            y = (j + 0.5) / H
            vd = ray_dir(lf, view_dir, x, y, fov_rad, near, aspect)
            tmin, tmax, hit = entry_exit(lf, vd, bl, tr)
            ray_len = tmax - tmin
            n = int(hit * (math.floor(sampling_rate * ray_len * vol_diag) + 1))
            if jitter_t is not None and n > 0:
                tmin = tmin + jitter_t[i, j] * ray_len / n
            nsamp[i, j] = n
            if n <= 0:
                continue
            ray_len = tmax - tmin
            t0 = tmin + 0.5 * ray_len / n
            acc = np.zeros(4)
            light_pos = lf + np.array([0.0, 1.0, 0.0])
            for s in range(n):
                if nondiff:
                    if acc[3] >= 0.99:
                        break
                else:
                    if not ((not ert or acc[3] < 0.99) and s < max_samples):
                        continue
                u = s / (n - 1) if n > 1 else 0.0
                t = t0 + u * (tmax - t0)
                pos = lf + t * vd
                intensity = trilinear(vol, pos)
                rgba = apply_tf(tf, intensity)
                if nondiff and rgba[3] <= alpha_skip:
                    continue
                opacity = 1.0 - (1.0 - rgba[3]) ** (1.0 / sampling_rate)
                g = volume_gradient(vol, pos)
                gn = np.linalg.norm(g)
                if gn > 0:
                    normal = g / gn
                    ldir = pos - light_pos
                    ldir = ldir / np.linalg.norm(ldir)
                    ndl = max(float(normal @ ldir), 0.0)
                    diffuse = 0.8 * ndl
                    refl = ldir - 2.0 * float(normal @ ldir) * normal
                    rdv = max(float(refl @ (-vd)), 0.0)
                    specular = 0.3 * rdv ** 32.0
                else:
                    diffuse = 0.0
                    specular = 0.0
                light = diffuse + specular + 0.4
                if not nondiff:
                    light = min(1.0, light)
                shaded = np.array([
                    light * rgba[0] * opacity,
                    light * rgba[1] * opacity,
                    light * rgba[2] * opacity,
                    opacity,
                ])
                acc = acc + (1.0 - acc[3]) * shaded
                if not nondiff:
                    counts[i, j] += 1
            out[i, j] = np.minimum(1.0, acc) if nondiff else acc
    return out, counts, nsamp


def to_image(out_wh4):
    """Internal (W, H, 4) buffer -> image (H, W, 4), row 0 = top
    (the reference's flip+permute,
    `/root/reference/differender/volume_raycaster.py:543-548`)."""
    return np.flip(out_wh4, axis=1).transpose(1, 0, 2)
