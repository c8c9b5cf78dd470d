from pano_nerf_tpu.ops import mip, shading  # noqa: F401
