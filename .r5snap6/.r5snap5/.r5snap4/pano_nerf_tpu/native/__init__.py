"""Native (C++) acceleration layer, loaded lazily via ctypes.

Components build on first use with the system toolchain and fall back to
pure-Python implementations when unavailable — the framework never *requires*
the native layer, it just gets faster with it.
"""

from pano_nerf_tpu.native.build import load_exr_decoder  # noqa: F401
