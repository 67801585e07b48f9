"""Utility re-exports, mirroring `/root/reference/differender/utils/__init__.py:1`."""
from ..transfer import get_tf, get_tf_torch_layout, tex_from_pts, random_peaks_tf
from .camera import in_circles, get_rand_pos

__all__ = [
    "get_tf", "get_tf_torch_layout", "tex_from_pts", "random_peaks_tf",
    "in_circles", "get_rand_pos",
]
