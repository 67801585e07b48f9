"""Forward-only (non-differentiable) render — mirrors
`/root/reference/examples/render_nondiff.py`.

The reference loads a CQ500 CT volume via torchvtk and renders 800x800 with
sampling_rate=16; binary volumes are absent from its repo, so this script
renders a synthetic skull-ish shell by default, or any raw volume passed via
--raw/--shape (the reference's skull.raw recipe).
"""
import argparse
import os
import sys

# Allow running straight from a checkout: `python examples/<script>.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

import numpy as np


def synthetic_volume(n=128):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.meshgrid(xs, xs, xs, indexing="ij")
    r = np.sqrt(sum(x * x for x in g))
    shell = np.exp(-((r - 0.6) ** 2) / 0.004) * 0.6
    core = 1.0 / (1.0 + np.exp((r - 0.25) * 30.0)) * 0.35
    return (shell + core).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", type=str, default=None,
                    help="raw uint8 volume file (skull.raw recipe)")
    ap.add_argument("--shape", type=int, nargs=3, default=[256, 256, 256])
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--tf", type=str, default="tf1")
    ap.add_argument("--tf-res", type=int, default=128)
    ap.add_argument("--sampling-rate", type=float, default=16.0)
    ap.add_argument("--out", type=str, default="render.png")
    ap.add_argument("--nifti", type=str, default=None,
                    help="NIfTI volume (.nii/.nii.gz) — the CQ500-class "
                         "medical format (io.load_nifti)")
    ap.add_argument("--strips", type=int, default=4,
                    help="execute the render as N independent row-strip "
                         "programs (bounds TPU program size for big "
                         "images; 1 = monolithic)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from differender_tpu import (RenderConfig, render_nondiff,
                                 render_nondiff_strips, get_tf)
    from differender_tpu.io import load_nifti, load_raw_volume
    from differender_tpu.plotting import save_image
    from differender_tpu.raycaster import volume_to_internal

    if args.nifti:
        vol_dhw = load_nifti(args.nifti)
    elif args.raw:
        vol_dhw = load_raw_volume(args.raw, tuple(args.shape))
    else:
        vol_dhw = synthetic_volume(min(args.shape))
    vol = volume_to_internal(jnp.asarray(vol_dhw))

    cfg = RenderConfig(volume_shape=vol.shape,
                       image_shape=(args.res, args.res),
                       tf_resolution=args.tf_res,
                       max_samples=1,      # nondiff path needs no tape depth
                       jitter=False)
    tf = get_tf(args.tf, args.tf_res)
    look_from = jnp.asarray(np.array([0.0, 1.0, -2.3], np.float32))

    if args.strips > 1 and args.res % args.strips == 0:
        out = render_nondiff_strips(vol, tf, look_from, cfg,
                                    sampling_rate=args.sampling_rate,
                                    n_strips=args.strips)
    else:
        out = render_nondiff(vol, tf, look_from, cfg,
                             sampling_rate=args.sampling_rate)
    img = np.asarray(out.image)
    save_image(img, args.out)
    print(f"saved {args.out}  (mean alpha {img[..., 3].mean():.3f}, "
          f"max n_samples {int(np.asarray(out.n_samples).max())})")


if __name__ == "__main__":
    main()
