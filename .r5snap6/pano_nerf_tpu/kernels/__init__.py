from pano_nerf_tpu.kernels.fused_mlp import fused_mlp_apply, pack_params  # noqa: F401
from pano_nerf_tpu.kernels.fused_mlp_ipe import fused_mlp_ipe_apply  # noqa: F401
