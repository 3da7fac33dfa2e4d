"""Compatibility adapters for reference/anipose-style APIs."""

from macaque_tpu.compat.aniposelib import CameraGroup

__all__ = ["CameraGroup"]
