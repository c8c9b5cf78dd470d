"""Native C++ EXR decoder: parity with the pure-Python codec + fallback."""

import numpy as np
import pytest

from pano_nerf_tpu.data import io_exr
from pano_nerf_tpu.native import build as native_build


@pytest.fixture(scope="module")
def native_available():
    return native_build.load_exr_decoder() is not None


class TestNativeDecoder:
    @pytest.mark.parametrize("pixel_type", ["half", "float"])
    @pytest.mark.parametrize("compression", ["zip", "none"])
    def test_parity_with_python(self, tmp_path, native_available, pixel_type,
                                compression, monkeypatch):
        if not native_available:
            pytest.skip("toolchain unavailable")
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 30, (33, 64, 3)).astype(np.float32)
        f = str(tmp_path / "x.exr")
        io_exr.write_exr(f, img, pixel_type=pixel_type,
                         compression=compression)

        native = io_exr.read_exr(f)

        # Force the pure-Python path and compare.
        monkeypatch.setattr(native_build, "native_read_exr", lambda buf: None)
        python = io_exr.read_exr(f)
        np.testing.assert_array_equal(native, python)

    def test_python_fallback_always_works(self, tmp_path, monkeypatch):
        monkeypatch.setattr(native_build, "native_read_exr", lambda buf: None)
        img = np.full((5, 7, 3), 2.5, np.float32)
        f = str(tmp_path / "y.exr")
        io_exr.write_exr(f, img, pixel_type="float")
        np.testing.assert_allclose(io_exr.read_exr(f), 2.5, atol=1e-6)

    def test_probe_rejects_garbage(self, native_available):
        if not native_available:
            pytest.skip("toolchain unavailable")
        assert native_build.native_read_exr(b"not an exr file at all") is None
