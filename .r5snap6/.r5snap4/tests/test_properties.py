"""Property-based fuzz of the core math invariants (hypothesis).

The deterministic suites pin reference parity at specific points; these
fuzz structural invariants over random inputs — monotonicity of the loss
tonemap, finiteness of safe_normalize's backward everywhere (the round-3
NaN root cause class), resampler output ordering/bounds, and the config
flatten/merge round trip. Each property runs a small number of examples
(the host has one CPU core); failures shrink to minimal cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from pano_nerf_tpu.core.config import flatten, merge_from_list
from pano_nerf_tpu.ops.mip import safe_normalize, sorted_piecewise_constant_pdf
from pano_nerf_tpu.ops.shading import hdr_to_ldr

COMMON = dict(max_examples=25, deadline=None)

finite_f32 = st.floats(min_value=0.0, max_value=1e4, width=32,
                       allow_nan=False, allow_infinity=False)


class TestTonemapProperties:
    @given(x=finite_f32, y=finite_f32)
    @settings(**COMMON)
    def test_unclipped_monotone(self, x, y):
        """The unclipped ACES+gamma curve (the loss tonemap for
        predictions) is monotone non-decreasing over all radiances."""
        lo, hi = sorted((x, y))
        a = float(hdr_to_ldr(jnp.asarray([lo]), clamp=False)[0])
        b = float(hdr_to_ldr(jnp.asarray([hi]), clamp=False)[0])
        assert a <= b + 1e-6

    @given(x=finite_f32)
    @settings(**COMMON)
    def test_clamped_in_unit_interval_and_agrees_below_knee(self, x):
        from pano_nerf_tpu.engine.losses import SATURATION_KNEE
        c = float(hdr_to_ldr(jnp.asarray([x]))[0])
        assert 0.0 <= c <= 1.0
        if x < SATURATION_KNEE - 1e-3:
            u = float(hdr_to_ldr(jnp.asarray([x]), clamp=False)[0])
            np.testing.assert_allclose(c, u, rtol=1e-6, atol=1e-6)

    @given(x=finite_f32)
    @settings(**COMMON)
    def test_quantize_floors_to_8bit_grid(self, x):
        """Quantization floors PRE-gamma (reference parity,
        surface_rendering.py:332-334): q**gamma lands on the 1/255 grid,
        and flooring can only darken."""
        q = float(hdr_to_ldr(np.asarray([x]), quantize=True)[0])
        lin = (q ** 2.2) * 255.0
        assert abs(lin - round(lin)) < 1e-3
        assert q <= float(hdr_to_ldr(np.asarray([x]))[0]) + 1e-6


class TestSafeNormalizeProperties:
    @given(v=arrays(np.float32, (4, 3),
                    elements=st.floats(min_value=-1e3, max_value=1e3,
                                       width=32, allow_nan=False)))
    @settings(**COMMON)
    def test_forward_and_backward_finite_everywhere(self, v):
        """Unit (or exactly-zero) outputs with finite gradients for ANY
        input, including exact zeros — the class of inputs whose naive
        normalize NaN'd whole training steps (NOTES.md spike forensics)."""
        x = jnp.asarray(v)
        out = safe_normalize(x)
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        assert np.all((norms < 1.0 + 1e-4)
                      & ((norms > 0.99) | (norms == 0.0)))
        g = jax.grad(lambda a: jnp.sum(safe_normalize(a) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestResamplerProperties:
    @given(w=arrays(np.float32, (2, 8),
                    elements=st.floats(min_value=0.0, max_value=10.0,
                                       width=32, allow_nan=False)),
           randomized=st.booleans())
    @settings(**COMMON)
    def test_samples_sorted_and_bounded(self, w, randomized):
        bins = jnp.broadcast_to(jnp.linspace(1.0, 5.0, 9), (2, 9))
        s = sorted_piecewise_constant_pdf(jax.random.PRNGKey(0), bins,
                                          jnp.asarray(w), 16, randomized)
        s = np.asarray(s)
        assert np.all(np.diff(s, axis=-1) >= -1e-6)
        assert np.all(s >= 1.0 - 1e-5) and np.all(s <= 5.0 + 1e-5)


class TestConfigProperties:
    keys = st.text(alphabet="abcdef_", min_size=1, max_size=8)
    scalars = st.one_of(st.integers(-1000, 1000), st.booleans(),
                        st.floats(allow_nan=False, allow_infinity=False,
                                  width=32))

    @given(d=st.dictionaries(keys, st.dictionaries(keys, scalars,
                                                   min_size=1, max_size=3),
                             min_size=1, max_size=3))
    @settings(**COMMON)
    def test_flatten_then_merge_roundtrip(self, d):
        """flatten() produces dot keys that merge_from_list() writes back
        to the same values (the CLI override contract)."""
        flat = flatten(d)
        target = dict(flat)
        pairs = []
        for k, v in flat.items():
            pairs += [k, repr(v)]
        merge_from_list(target, pairs)
        for k, v in flat.items():
            got = target[k]
            if isinstance(v, float):
                assert got == v or abs(got - v) < 1e-6 * max(1.0, abs(v))
            else:
                assert got == v
