from pano_nerf_tpu.core.rays import Rays, rays_map  # noqa: F401
from pano_nerf_tpu.core.config import load_config, merge_from_list  # noqa: F401
