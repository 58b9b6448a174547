"""Synthesis building blocks: windows, tone phases, WOLA, conversions."""

import jax
import jax.numpy as jnp
import numpy as np

from mbe_tpu.ops import synth
from mbe_tpu.tables import T


def test_windows_match_reference_tables():
    """Ws (mbelib_const.h) is a 321-tap trapezoid; Ws_synthesis
    (mbe_unvoiced_fft.c:48-67) has the deliberate duplicated 0.300 in its
    down-ramp that makes it asymmetric — both must come from the dump."""
    ws = np.asarray(T.Ws)
    assert ws.shape == (321,)
    assert ws[160] == 1.0 and ws[56] == np.float32(0.02)
    wsyn = np.asarray(T.Ws_synthesis)
    assert wsyn.shape == (211,)
    # the asymmetry quirk: the down-ramp repeats 0.300 (indices +89, +90),
    # so the window is NOT symmetric — it must come from the dump, not a
    # formula (mbe_unvoiced_fft.c:64-66)
    assert wsyn[105 + 89] == np.float32(0.300)
    assert wsyn[105 + 90] == np.float32(0.300)
    assert wsyn[105 - 89] != wsyn[105 + 90]


def test_tone_phase_accumulator_exact():
    """Tone phases are exact uint32 accumulation (mbelib.c:692-736)."""
    c = 3
    tid = jnp.asarray([10, 128, 200])  # single, dual, invalid
    ad = jnp.asarray([127, 64, 50])
    swn = jnp.asarray(np.array([0, 5, 9], np.uint32))
    tp = jnp.asarray(np.array([0, 7, 11], np.uint32))
    samples, swn2, tp2 = jax.jit(synth.render_tone)(tid, ad, swn, tp)
    samples = np.asarray(samples)

    # lane 0: freq = 31.25*10 Hz; exact phase check
    freq = 31.25 * 10
    step = np.uint64(freq / 8000.0 * 4294967296.0 + 0.5)
    assert np.asarray(swn2)[0] == np.uint32(np.uint64(0) + step * 160)
    expect = np.sin((np.float32(np.uint32(step))
                     * np.float32(2 * np.pi / 4294967296.0))
                    - np.float32(np.pi / 2)) * (127 / 127.0) * synth.SOFT_CLIP
    assert abs(samples[0, 0] - expect) < 1e-3

    # lane 1: dual tone advances both phases
    assert np.asarray(tp2)[1] != 7
    # lane 2: invalid id -> silence, state preserved (samples are [160, C])
    np.testing.assert_array_equal(samples[:, 2], 0.0)
    assert np.asarray(swn2)[2] == 9 and np.asarray(tp2)[2] == 11


def test_float_to_short_special_values():
    """NaN -> 0, ±Inf -> ±clip, truncation toward zero (mbelib.c:1148-1177)."""
    x = jnp.asarray([[np.nan, np.inf, -np.inf, 1.0, -1.0, 1e9, -1e9, 0.4]],
                    jnp.float32)
    out = np.asarray(jax.jit(synth.float_to_short)(x))[0]
    clip = int(np.float32(32767.0 * 0.95))  # 31128
    np.testing.assert_array_equal(
        out, [0, clip, -clip, 7, -7, clip, -clip, 2])


def test_clip_float():
    x = jnp.asarray([[1e6, -1e6, 10.0]], jnp.float32)
    out = np.asarray(synth.clip_float(x))[0]
    assert out[0] == synth.SOFT_CLIP and out[1] == -synth.SOFT_CLIP
    assert out[2] == 10.0


def test_wola_weights_cover_frame():
    """WOLA denominators are strictly positive over all 160 samples."""
    synth._lazy_tables()
    assert (synth._W_DENOM > 1e-10).all()


def test_fmodf_2pi_exact_vs_libm():
    """The PSIl wrap must equal libm fmodf bit-for-bit (np.fmod IS the
    C fmod): the Sterbenz conditional-subtraction ladder is exact, while
    the jnp.mod it replaced rounded twice per wrap and drifted the PSIl
    chain to the audit's 62.6 dB worst case (tools/t_snr185.py, round 5)."""
    rng = np.random.default_rng(42)
    # full PSIl dynamic range: wrapped value + (pw0+cw0)*l*80 < 2^12
    x = np.concatenate([
        rng.uniform(0.0, 4096.0, 20000).astype(np.float32),
        np.float32(2 * np.pi) * np.arange(660, dtype=np.float32),  # boundaries
        np.nextafter(np.float32(2 * np.pi) * np.arange(1, 660, dtype=np.float32),
                     np.float32(0.0)),
        np.array([0.0, 1e-30, 6.2831855, 6.2831850], np.float32),
    ])
    got = np.asarray(jax.jit(synth.fmodf_2pi)(jnp.asarray(x)))
    want = np.fmod(x, np.float32(2 * np.pi))
    np.testing.assert_array_equal(got, want)
