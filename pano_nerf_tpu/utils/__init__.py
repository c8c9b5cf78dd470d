from pano_nerf_tpu.utils import metrics, vis  # noqa: F401
