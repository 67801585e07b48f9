"""Pallas TPU kernels for the hot ops."""
from .tf_lookup import tf_lookup_pallas, tf_lookup_reference

__all__ = ["tf_lookup_pallas", "tf_lookup_reference"]
