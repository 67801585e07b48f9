"""Torch interop: the reference's ``torch.nn.Module`` API, TPU-rendered.

The reference's user-facing surface is a torch module —
``Raycaster(torch.nn.Module)``
(`/root/reference/differender/volume_raycaster.py:478-548`) whose autograd
bridge ``RaycastFunction`` re-renders inside ``backward`` (`:440-476`).
This module serves torch training loops the same surface on top of
differender_tpu:

* :class:`TorchRaycaster` takes/returns **torch tensors** with the
  reference's exact layouts — volume ``([BS,] 1, D, H, W)``, transfer
  function ``([BS,] 4, R)``, camera ``([BS,] 3)``, image ``([BS,] 4, H,
  W)`` — and runs the render on whatever backend JAX is configured for
  (TPU in production, CPU in tests).  Tensors cross host memory (torch in
  this environment is CPU-only), which for training-scale workloads is
  negligible next to the march itself.
* autograd is bridged through ``jax.vjp``: like the reference, the
  backward **recomputes** the forward (the reference replays the whole
  raycast before its gradient kernels, `:450-461`) rather than pinning
  residuals across the torch graph.
* the jitter PRNG key chosen in ``forward`` is *replayed* in ``backward``
  — jittered gradients are exact, fixing the reference's fresh-RNG
  backward replay (`:456` jitters anew; SURVEY §2.6).
* gradients are ``nan_to_num``-scrubbed exactly like the reference
  (`:463-464,474-475`); inputs are cast to f32 like the reference's
  ``@custom_fwd(cast_inputs=torch.float32)`` (`:394`).
* ``look_from`` gets ``None`` grad by default, matching the reference
  (`:465,473`); construct with ``camera_grads=True`` to receive the camera
  gradient the functional AD path provides (requires ``march_vjp="ad"`` —
  the hand-written sorted/tiled VJPs drop sample-position terms).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .raycaster import Raycaster

try:  # torch is baked into this environment, but keep the import soft so
    import torch  # the rest of the package never depends on it.
except ImportError:  # pragma: no cover
    torch = None


def _require_torch():
    if torch is None:  # pragma: no cover
        raise ImportError("differender_tpu.torch_interop requires torch")


def _to_jax(t) -> jax.Array:
    """torch tensor -> f32 jax array (host copy; reference casts to f32 at
    the autograd boundary, `volume_raycaster.py:394`)."""
    return jnp.asarray(
        np.ascontiguousarray(t.detach().cpu().numpy(), dtype=np.float32))


def _to_torch(a, like):
    """jax array -> contiguous f32 torch tensor on ``like``'s device."""
    # np.array(copy=True): jax arrays expose read-only buffers, and torch
    # tensors must own writable memory.
    return torch.from_numpy(np.array(a, dtype=np.float32)).to(
        device=like.device, dtype=torch.float32)


class _RaycastFunction(torch.autograd.Function if torch is not None
                       else object):
    """The reference's ``RaycastFunction`` (`:392-476`) over jax.vjp.

    Forward runs the jitted render; backward re-renders under ``jax.vjp``
    with the SAME jitter key and pulls the image cotangent back to
    (volume, tf[, look_from]) gradients.
    """

    @staticmethod
    def forward(ctx, module, volume, tf, look_from, key):
        ctx.module = module
        ctx.key = key
        ctx.save_for_backward(volume, tf, look_from)
        img = module._fwd(_to_jax(volume), _to_jax(tf), _to_jax(look_from),
                          key)
        return _to_torch(img, volume).contiguous()

    @staticmethod
    def backward(ctx, grad_output):
        volume, tf, look_from = ctx.saved_tensors
        m = ctx.module
        grads = m._vjp(_to_jax(volume), _to_jax(tf), _to_jax(look_from),
                       ctx.key, _to_jax(grad_output))
        need = ctx.needs_input_grad

        def out(i, g, like):
            if not need[i] or g is None:
                return None
            # the reference's nan scrub (`:463-464,474-475`)
            return torch.nan_to_num(_to_torch(g, like))

        g_lf = grads[2] if m.camera_grads else None
        return (None, out(1, grads[0], volume), out(2, grads[1], tf),
                out(3, g_lf, look_from), None)


class TorchRaycaster(torch.nn.Module if torch is not None else object):
    """Drop-in torch module with the reference ``Raycaster`` contract
    (`/root/reference/differender/volume_raycaster.py:478-548`), rendered
    by differender_tpu.

    Constructor args match the reference (`:479`); extra keyword args are
    forwarded to :class:`differender_tpu.RenderConfig` (e.g.
    ``march_vjp="sorted"`` for the fast hand-written volume-grad path).

    Args:
        volume_shape: user-convention ``(D, H, W)``.
        output_shape: ``(W, H)`` render resolution (reference convention).
        tf_shape: transfer-function resolution R.
        sampling_rate / jitter / max_samples / fov / near / far: as in the
            reference.
        seed: seed of the jitter-key stream (the reference uses Taichi's
            implicit RNG; here randomness is an explicit replayable key).
        camera_grads: also return a ``look_from`` gradient (beyond the
            reference, which always passes ``None``); needs
            ``march_vjp="ad"`` (default) or ``"sorted"`` (round 5: the
            sorted VJPs emit exact position cotangents when asked).
    """

    def __init__(self, volume_shape, output_shape, tf_shape: int,
                 sampling_rate: float = 1.0, jitter: bool = True,
                 max_samples: int = 512, fov: float = 30.0,
                 near: float = 0.1, far: float = 100.0, seed: int = 0,
                 camera_grads: bool = False, **config_kwargs):
        _require_torch()
        super().__init__()
        if camera_grads and config_kwargs.get("march_vjp") == "sorted":
            # The sorted VJPs emit position cotangents only when the
            # config declares the intent (SampleSpec.camera_grads).
            config_kwargs.setdefault("camera_grads", True)
        self._rc = Raycaster(volume_shape, output_shape, tf_shape,
                             sampling_rate=sampling_rate, jitter=jitter,
                             max_samples=max_samples, fov=fov, near=near,
                             far=far, seed=seed, **config_kwargs)
        if camera_grads and self._rc.config.march_vjp not in ("ad",
                                                              "sorted"):
            raise ValueError(
                "camera_grads=True needs march_vjp='ad' or 'sorted' (the "
                "'tiled' VJP drops camera terms); got "
                f"{self._rc.config.march_vjp!r}")
        self.camera_grads = camera_grads
        self.jitter = jitter
        self.sampling_rate = sampling_rate
        self.volume_shape = self._rc.volume_shape
        self.output_shape = self._rc.output_shape
        self.tf_shape = tf_shape

        sr = sampling_rate

        def run(v, t, lf, key):
            return self._rc.forward_with_aux(v, t, lf, key=key,
                                             sampling_rate=sr).image

        argnums = (0, 1, 2) if camera_grads else (0, 1)

        def vjp_run(v, t, lf, key, ct):
            args = (v, t, lf)
            diff = tuple(args[i] for i in argnums)

            def f(*d):
                full = list(args)
                for i, x in zip(argnums, d):
                    full[i] = x
                return run(*full, key)

            _, pull = jax.vjp(f, *diff)
            g = pull(ct)
            return (g + (None,)) if not camera_grads else g

        # One jitted callable each; jax.jit handles shape/batching
        # polymorphism, and a ``key=None`` call specializes on the empty
        # pytree (the key, when used, is an ARGUMENT — never a traced-in
        # constant; CLAUDE.md rule 2).
        self._fwd = jax.jit(run)
        self._vjp = jax.jit(vjp_run)

    # -- torch API ---------------------------------------------------------
    def forward(self, volume, tf, look_from):
        """Differentiable render: ``([BS,] 1, D, H, W) x ([BS,] 4, R) x
        ([BS,] 3) -> ([BS,] 4, H, W)`` (`:525-548`)."""
        key = self._rc.next_key() if self.jitter else None
        # the key replayed by backward; exposed for reproducibility tests
        self._last_key = key
        return _RaycastFunction.apply(self, volume, tf, look_from, key)

    def raycast_nondiff(self, volume, tf, look_from,
                        sampling_rate: Optional[float] = None):
        """Inference render, default rate ``4 * sampling_rate``, jitter off
        (`:490-523`)."""
        with torch.no_grad():
            img = self._rc.raycast_nondiff(
                _to_jax(volume), _to_jax(tf), _to_jax(look_from),
                sampling_rate=sampling_rate)
            return _to_torch(img, volume).contiguous()

    def raycast_fast(self, volume, tf, look_from,
                     intermediate: Optional[int] = None,
                     planes_per_voxel: float = 2.0):
        """Shear-warp approximate render (beyond the reference), no grads
        through torch (use the JAX API for differentiable fast-path
        training)."""
        with torch.no_grad():
            img = self._rc.raycast_fast(
                _to_jax(volume), _to_jax(tf), _to_jax(look_from),
                intermediate=intermediate, planes_per_voxel=planes_per_voxel)
            return _to_torch(img, volume).contiguous()

    def extra_repr(self) -> str:
        return self._rc.extra_repr()
