"""Transfer-function optimization + orbit viewer — mirrors
`/root/reference/examples/taichi_volume_raycaster.py` (the standalone
research prototype): ``--task backward`` recovers a target TF with the
bespoke momentum optimizer (`:375-381, 596-601`); ``--task forward`` renders
an orbit animation (the GUI viewer `:634-652` becomes a GIF).

CLI flags follow the reference's argparse surface (`:466-530`).
"""
import argparse
import os
import sys

# Allow running straight from a checkout: `python examples/<script>.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


def make_volume(res, raw=None, shape=None):
    if raw:
        from differender_tpu.io import load_raw_volume
        return load_raw_volume(raw, tuple(shape))
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    g = np.meshgrid(xs, xs, xs, indexing="ij")
    r = np.sqrt(sum(x * x for x in g))
    shell = np.exp(-((r - 0.6) ** 2) / 0.004) * 0.5
    core = 1.0 / (1.0 + np.exp((r - 0.3) * 25.0)) * 0.3
    return (shell + core).astype(np.float32)


def main():
    ap = argparse.ArgumentParser("TF optimization / orbit rendering")
    ap.add_argument("task", choices=["forward", "backward"])
    ap.add_argument("--res", type=int, default=240, help="render resolution")
    ap.add_argument("--vol-res", type=int, default=64)
    ap.add_argument("--tf-res", type=int, default=128)
    ap.add_argument("--iterations", type=int, default=240)
    ap.add_argument("--ref", type=str, default=None,
                    help="path to a reference image .npy to fit against")
    ap.add_argument("--raw", type=str, default=None)
    ap.add_argument("--shape", type=int, nargs=3, default=None)
    ap.add_argument("--max-samples", type=int, default=2048)
    ap.add_argument("--fw-sampling-rate", type=float, default=8.0)
    ap.add_argument("--bw-sampling-rate", type=float, default=2.0)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--mom", type=float, default=0.9)
    ap.add_argument("--clip-grads", type=float, default=0.1)
    ap.add_argument("--lr-decay", type=float, default=0.99)
    ap.add_argument("--bw-jitter", action="store_true")
    ap.add_argument("--target-tf", type=str, default="tf5")
    ap.add_argument("--init-tf", type=str, default="black")
    ap.add_argument("--results", type=str, default="results/opt_tf")
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax
    from differender_tpu import (RenderConfig, render, render_nondiff,
                                 get_tf, in_circles, mse_loss, tf_momentum,
                                 project_nonneg)
    from differender_tpu.plotting import plot_tfs, save_gif, save_image
    from differender_tpu.video import VideoWriter
    from differender_tpu.raycaster import volume_to_internal

    os.makedirs(args.results, exist_ok=True)
    vol = volume_to_internal(jnp.asarray(
        make_volume(args.vol_res, args.raw, args.shape)))
    cfg = RenderConfig(volume_shape=vol.shape,
                       image_shape=(args.res, args.res),
                       tf_resolution=args.tf_res,
                       max_samples=args.max_samples)
    look_from = jnp.asarray(np.array([0.0, 0.9, 2.3], np.float32))

    if args.task == "forward":
        tf = get_tf(args.target_tf, args.tf_res)
        frames = []
        for i in range(min(args.iterations, 72)):
            lf = in_circles(2 * np.pi * i / 72.0, y=0.9, dist=2.3)
            img = render_nondiff(vol, tf, lf, cfg,
                                 sampling_rate=args.fw_sampling_rate).image
            frames.append(np.asarray(img))
            if i % 12 == 0:
                print(f"frame {i}")
        save_gif(frames, f"{args.results}/orbit.gif", fps=12)
        # ti.VideoManager parity (`taichi_volume_raycaster.py:559-575`):
        # a real video container, not only a GIF preview.
        with VideoWriter(f"{args.results}/orbit.avi", fps=12) as vw:
            for fr in frames:
                vw.write_frame(fr)
        save_image(frames[0], f"{args.results}/frame0.png")
        print(f"saved {args.results}/orbit.gif and orbit.avi")
        return

    # --- backward: TF optimization -------------------------------------
    tf_target = get_tf(args.target_tf, args.tf_res)
    if args.ref:
        reference = jnp.asarray(np.load(args.ref))
    else:
        reference = render_nondiff(vol, tf_target, look_from, cfg,
                                   sampling_rate=args.fw_sampling_rate).image
        np.save(f"{args.results}/temp_reference.npy", np.asarray(reference))

    tf_pred = get_tf(args.init_tf, args.tf_res)
    opt = tf_momentum(lr=args.lr, gamma=args.mom, max_grad=args.clip_grads,
                      lr_decay=args.lr_decay)
    opt_state = opt.init(tf_pred)

    def loss_fn(t, key):
        img = render(vol, t, look_from, cfg, args.bw_sampling_rate,
                     key=key).image
        return mse_loss(img, reference)

    @jax.jit
    def step(t, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(t, key)
        updates, opt_state = opt.update(grads, opt_state)
        t = project_nonneg(optax.apply_updates(t, updates))
        return t, opt_state, loss, jnp.abs(grads).max(axis=0)

    video = VideoWriter(f"{args.results}/optimization.avi", fps=12)
    key = jax.random.PRNGKey(0)
    for i in range(args.iterations):
        key, sub = jax.random.split(key)
        tf_pred, opt_state, loss, gmax = step(
            tf_pred, opt_state, sub if args.bw_jitter else None)
        if i % args.log_every == 0 or i == args.iterations - 1:
            print(f"Step {i:03d}  Loss: {float(loss):.5f}  "
                  f"TF grad max (rgba): "
                  + " ".join(f"{float(v):.2e}" for v in gmax))
            plot_tfs([(np.asarray(tf_pred), "Prediction"),
                      (np.asarray(tf_target), "Target")],
                     path=f"{args.results}/tf_comparison_{i:03d}.png")
            video.write_frame(np.asarray(render(
                vol, tf_pred, look_from, cfg,
                args.bw_sampling_rate).image))
    if video.n_frames:
        video.close()
        print(f"saved {args.results}/optimization.avi")
    print(f"final TF L1 vs target: "
          f"{float(jnp.abs(tf_pred - tf_target).mean()):.4f}")


if __name__ == "__main__":
    main()
