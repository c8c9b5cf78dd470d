from pano_nerf_tpu.data.io_exr import read_exr, write_exr  # noqa: F401
from pano_nerf_tpu.data.pano_dataset import PanoDataset, generate_lit_rays  # noqa: F401
