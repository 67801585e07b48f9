"""differender_tpu — a TPU-native differentiable direct-volume-rendering
framework (JAX / XLA / Pallas).

Built from scratch with the capabilities of nanovis/Differender
(reference mounted at `/root/reference`): scalar volume + 1D RGBA transfer
function + camera in, RGBA image out, with exact gradients w.r.t. the volume
and the transfer function (and, beyond the reference, the camera).
"""

__version__ = "0.1.0"

from .config import RenderConfig
from .geometry import RayBundle, make_rays, ray_directions, ray_aabb
from .render import (RenderOutput, render, render_nondiff, render_jit,
                     render_nondiff_jit, render_nondiff_strips,
                     render_strips, render_depth_sorted,
                     choose_diff_renderer,
                     march_diff, march_nondiff, value_and_grad_blockwise,
                     value_and_grad_render)
from .raycaster import (Raycaster, volume_to_internal, volume_from_internal,
                        tf_to_internal, tf_from_internal)
from .transfer import get_tf, get_tf_torch_layout, tex_from_pts
from .losses import mse_loss, ssim, dssim_mse_loss
from .optim import (tf_momentum, project_nonneg, project_unit,
                    nan_to_num_grads, value_and_clean_grad, adamw_onecycle)
from .utils.camera import in_circles, get_rand_pos
from .fastpath import render_fast, render_fast_sharded, FastRenderOutput
from .video import VideoWriter, save_video


def __getattr__(name):
    # Lazy: importing the torch bridge must not make the core package
    # depend on torch (PEP 562).
    if name == "TorchRaycaster":
        from .torch_interop import TorchRaycaster
        return TorchRaycaster
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "TorchRaycaster",
    "RenderConfig", "RayBundle", "make_rays", "ray_directions", "ray_aabb",
    "RenderOutput", "render", "render_nondiff", "render_jit",
    "render_nondiff_jit", "render_nondiff_strips", "render_strips",
    "render_depth_sorted", "choose_diff_renderer", "march_diff",
    "march_nondiff", "value_and_grad_blockwise",
    "value_and_grad_render",
    "Raycaster", "volume_to_internal", "volume_from_internal",
    "tf_to_internal", "tf_from_internal",
    "get_tf", "get_tf_torch_layout", "tex_from_pts",
    "mse_loss", "ssim", "dssim_mse_loss",
    "tf_momentum", "project_nonneg", "project_unit", "nan_to_num_grads",
    "value_and_clean_grad", "adamw_onecycle",
    "in_circles", "get_rand_pos",
    "render_fast", "render_fast_sharded", "FastRenderOutput",
    "VideoWriter", "save_video",
]
