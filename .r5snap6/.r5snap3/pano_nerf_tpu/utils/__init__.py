from pano_nerf_tpu.utils import metrics, profiling, rotation, spherical, vis  # noqa: F401
