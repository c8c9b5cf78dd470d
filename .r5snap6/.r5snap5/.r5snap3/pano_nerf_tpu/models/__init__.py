from pano_nerf_tpu.models.mlp import NerfMLP  # noqa: F401
from pano_nerf_tpu.models.mip_nerf import MipNeRF, LevelOutput  # noqa: F401
from pano_nerf_tpu.models.pano_mip_nerf import PanoMipNeRF  # noqa: F401


def build_model(hparams: dict):
    """Model factory keyed on `nerf.mlp_name`, mirroring the reference's
    system registry (/root/reference/systems/base_system.py:19-24)."""
    name = hparams["nerf.mlp_name"]
    if name == "mipnerf":
        return MipNeRF.from_hparams(hparams)
    if name == "panonerf":
        return PanoMipNeRF.from_hparams(hparams)
    raise ValueError(f"Unknown nerf.mlp_name: {name!r}")
