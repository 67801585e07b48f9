"""Volume inverse rendering — mirrors
`/root/reference/examples/test_opt_tf.py` (which, despite its name,
optimizes the VOLUME): recover a corrupted volume from multi-view renders.

Reference recipe: 5% of voxels randomized (`:41-44`), batch of 8 poses =
1 orbit + 7 random per step (`:65`), ground truth from the clean volume via
the nondiff path at sampling_rate 8 (`:66-67`), loss = (1-SSIM) + MSE
(`:70-72`), AdamW + OneCycleLR (`:55-56`), post-step clamp to [0,1]
(`:86-88`), per-step logging and comparison figures (`:81-83, 94-108`).
"""
import argparse
import os
import sys

# Allow running straight from a checkout: `python examples/<script>.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64, help="volume resolution")
    ap.add_argument("--img-res", type=int, default=128)
    ap.add_argument("--tf-res", type=int, default=128)
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--max-lr", type=float, default=1e-3)
    ap.add_argument("--corruption", type=float, default=0.05)
    ap.add_argument("--sampling-rate", type=float, default=1.0)
    ap.add_argument("--gt-sampling-rate", type=float, default=8.0)
    ap.add_argument("--max-samples", type=int, default=512)
    ap.add_argument("--results", type=str, default="results/opt_volume")
    ap.add_argument("--log-figures-every", type=int, default=0,
                    help="save comparison figures every N steps (0 = off)")
    ap.add_argument("--checkpoint-every", type=int, default=50)
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint file to resume from")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--view-mode", choices=["auto", "accum", "shard_map",
                                            "vmap"],
                    default="auto",
                    help="multi-view step strategy: accum = per-view jit + "
                         "gradient accumulation (safe at scale, keeps the "
                         "ERT block-skip), shard_map = views sharded over "
                         "a device mesh, vmap = one joint graph (fastest "
                         "at small scale, loses the block-skip)")
    ap.add_argument("--mesh-views", type=int, default=0,
                    help="shard views over this many devices (enables "
                         "shard_map mode)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax
    from differender_tpu import (RenderConfig, render, render_nondiff,
                                 get_tf, in_circles, get_rand_pos,
                                 dssim_mse_loss, adamw_onecycle, project_unit)
    from differender_tpu.io import save_checkpoint, load_checkpoint
    from differender_tpu.plotting import plot_comp_render_tf, save_histogram

    os.makedirs(args.results, exist_ok=True)
    rng = np.random.default_rng(0)

    n = args.res
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.meshgrid(xs, xs, xs, indexing="ij")
    r = np.sqrt(sum(x * x for x in g))
    vol_gt = (1.0 / (1.0 + np.exp((r - 0.55) * 14.0))).astype(np.float32)
    vol = vol_gt.copy()
    mask = rng.random(vol.shape) < args.corruption
    vol[mask] = rng.random(int(mask.sum()), dtype=np.float32)
    print(f"vol {vol.shape}, corrupted {mask.mean():.1%} of voxels")

    cfg = RenderConfig(volume_shape=vol.shape,
                       image_shape=(args.img_res, args.img_res),
                       tf_resolution=args.tf_res,
                       max_samples=args.max_samples)
    tf = get_tf("tf1", args.tf_res)
    vol_gt_j = jnp.asarray(vol_gt)
    vol_j = jnp.asarray(vol)

    opt = adamw_onecycle(max_lr=args.max_lr, total_steps=args.iterations)
    opt_state = opt.init(vol_j)
    start_step = 0
    key = jax.random.PRNGKey(0)
    if args.resume:
        state, start_step = load_checkpoint(args.resume)
        vol_j = jnp.asarray(state["volume"])
        opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        key = jnp.asarray(state["key"])
        print(f"resumed from {args.resume} at step {start_step}")

    from differender_tpu.parallel import train_step_views

    mesh = None
    if args.mesh_views > 0:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:args.mesh_views]), ("views",))

    def view_loss(img, tgt):
        """(1 - SSIM) + MSE per view (`test_opt_tf.py:70-72`)."""
        return dssim_mse_loss(jnp.moveaxis(img, -1, 0),
                              jnp.moveaxis(tgt, -1, 0))

    # gt volume passed as a jit ARGUMENT (CLAUDE.md rule 2: closure
    # constants are fetched through the remote tunnel at trace time).
    gt_render = jax.jit(lambda v, lf: render_nondiff(
        v, tf, lf, cfg, args.gt_sampling_rate).image)

    # --view-mode vmap: the round-1 joint-graph step, kept for small scale.
    def loss_fn(v, lfs, keys, gts):
        def one(lf, key):
            return render(v, tf, lf, cfg, args.sampling_rate, key=key).image
        imgs = jax.vmap(one)(lfs, keys)
        return dssim_mse_loss(
            jnp.transpose(imgs, (0, 3, 1, 2)), jnp.transpose(gts, (0, 3, 1, 2)))

    @jax.jit
    def vmap_grads(v, lfs, keys, gts):
        return jax.value_and_grad(loss_fn)(v, lfs, keys, gts)

    @jax.jit
    def apply_update(v, opt_state, grads):
        updates, opt_state = opt.update(grads, opt_state, v)
        return project_unit(optax.apply_updates(v, updates)), opt_state

    def step(v, opt_state, lfs, keys):
        gts = jnp.stack([gt_render(vol_gt_j, lf) for lf in lfs])
        if args.view_mode == "vmap":
            loss, grads = vmap_grads(v, lfs, keys, gts)
        else:
            # the measured-safe recipe (VERDICT r2 #5): per-view jit with
            # gradient accumulation, or a views-axis shard_map on a mesh
            loss, (grads, _) = train_step_views(
                view_loss, v, tf, lfs, gts, cfg,
                sampling_rate=args.sampling_rate, keys=keys, mesh=mesh,
                mode=("auto" if args.view_mode == "auto" else args.view_mode))
        v, opt_state = apply_update(v, opt_state, grads)
        return v, opt_state, loss, jnp.abs(grads).max()

    def checkpoint(i):
        save_checkpoint(f"{args.results}/ckpt.pkl",
                        {"volume": vol_j, "opt_state": opt_state,
                         "key": key}, step=i)

    try:
        for i in range(start_step, args.iterations):
            key, k1, k2 = jax.random.split(key, 3)
            lfs = jnp.concatenate([in_circles(0.1 * i)[None],
                                   get_rand_pos(k1, args.bs - 1)], axis=0)
            vol_j, opt_state, loss, gmax = step(
                vol_j, opt_state, lfs, jax.random.split(k2, args.bs))
            log = (f"Step {i:03d}:   Loss: {float(loss):0.3f}   "
                   f"Vol Grad AbsMax: {float(gmax):.1e}   "
                   f"Vol err: {float(jnp.abs(vol_j - vol_gt_j).mean()):.5f}")
            print(log)
            _maybe_log_figures(args, i, vol_j, vol_gt_j, tf, cfg, lfs, log)
            if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
                checkpoint(i + 1)
    except KeyboardInterrupt:
        # reference behavior: Ctrl+C still saves state/logs
        # (`/root/reference/examples/test_opt_tf.py:90-91`)
        print(f"Ctrl+C stopped at step {i}. Saving checkpoint now.")
        checkpoint(i)


def _maybe_log_figures(args, i, vol_j, vol_gt_j, tf, cfg, lfs, log):
    import numpy as np
    from differender_tpu import render, render_nondiff
    from differender_tpu.plotting import plot_comp_render_tf, save_histogram
    if not (args.log_figures_every and i % args.log_figures_every == 0):
        return
    img = render(vol_j, tf, lfs[0], cfg, args.sampling_rate).image
    gt = render_nondiff(vol_gt_j, tf, lfs[0], cfg,
                        args.gt_sampling_rate).image
    plot_comp_render_tf(
        [(np.asarray(img), np.asarray(tf), "Prediction"),
         (np.asarray(gt), np.asarray(tf), "Target")],
        path=f"{args.results}/comparison_plot_{i:03d}.png",
        suptitle=log)
    save_histogram(np.asarray(vol_j), f"{args.results}/hist_{i:03d}.png")


if __name__ == "__main__":
    main()
