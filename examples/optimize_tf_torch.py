"""TF optimization in a PURE TORCH training loop via the interop bridge.

The reference's user workflow is torch end to end: a ``Raycaster``
``nn.Module`` inside a torch optimizer loop
(`/root/reference/examples/test_opt_tf.py:38-76`).  This example runs that
exact shape of loop — torch tensors, ``loss.backward()``,
``torch.optim.Adam`` — with the rendering and gradients computed by
differender_tpu (TPU when available; CPU otherwise):

    python examples/optimize_tf_torch.py --iterations 60

A reference user migrating here changes the import line, nothing else.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch


def make_volume(res):
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    g = np.meshgrid(xs, xs, xs, indexing="ij")
    r = np.sqrt(sum(x * x for x in g))
    shell = np.exp(-((r - 0.6) ** 2) / 0.004) * 0.5
    core = 1.0 / (1.0 + np.exp((r - 0.3) * 25.0)) * 0.3
    return (shell + core).astype(np.float32)


def main():
    ap = argparse.ArgumentParser("torch-loop TF optimization")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--vol-res", type=int, default=64)
    ap.add_argument("--tf-res", type=int, default=64)
    ap.add_argument("--iterations", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--sampling-rate", type=float, default=1.0)
    ap.add_argument("--out", type=str, default="tf_torch_opt.png")
    args = ap.parse_args()

    from differender_tpu.torch_interop import TorchRaycaster
    from differender_tpu.transfer import get_tf_torch_layout

    vol_np = make_volume(args.vol_res)                      # (D, H, W)
    volume = torch.from_numpy(vol_np[None].copy())          # (1, D, H, W)
    target_tf = torch.from_numpy(
        np.array(get_tf_torch_layout("tf1", args.tf_res)))  # (4, R)
    look_from = torch.tensor([1.2, 0.8, 2.0])

    rc = TorchRaycaster(volume.shape[1:], (args.res, args.res), args.tf_res,
                        sampling_rate=args.sampling_rate, jitter=True,
                        max_samples=512)
    print(rc)

    with torch.no_grad():
        target = rc(volume, target_tf, look_from)

    tf = torch.full_like(target_tf, 0.3).requires_grad_(True)
    opt = torch.optim.Adam([tf], lr=args.lr)
    for it in range(args.iterations):
        opt.zero_grad()
        img = rc(volume, tf, look_from)
        loss = torch.nn.functional.mse_loss(img, target)
        loss.backward()
        opt.step()
        with torch.no_grad():                 # TF textures live in [0, 1]
            tf.clamp_(0.0, 1.0)
        if it % 10 == 0 or it == args.iterations - 1:
            print(f"iter {it:4d}  loss {float(loss.detach()):.6f}")

    from differender_tpu.plotting import plot_tfs
    plot_tfs([(np.array(target_tf).T, "target"),
              (tf.detach().numpy().T, "optimized")], path=args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
