from pano_nerf_tpu.engine.schedule import mip_lr_decay  # noqa: F401
from pano_nerf_tpu.engine.system import MipNeRFSystem, PanoNeRFSystem, build_system  # noqa: F401
