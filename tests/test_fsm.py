"""Behavioral spec tests ported from the reference's tests/test_params.c —
frame classification, state-machine side effects, and threshold rules."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mbe_tpu.models import ambe, imbe, speech
from mbe_tpu.models import state as st
from mbe_tpu.ops import enhance
from mbe_tpu.tables import T


def _ambe_d_with_b0(b0, fill=0):
    """49-bit AMBE vector with the 2450 b0 bit positions set
    (ambe3600x2450.c:461-472)."""
    d = np.full(49, fill, np.int32)
    for pos, shift in zip([0, 1, 2, 3, 37, 38, 39], range(6, -1, -1)):
        d[pos] = (b0 >> shift) & 1
    return d


def test_imbe_fundamental_tables():
    """IMBE w0/L/K derivation from b0 (test_params.c:226-253)."""
    L = np.asarray(T.imbe_L_by_b0)
    K = np.asarray(T.imbe_K_by_b0)
    w0 = np.asarray(T.imbe_w0_by_b0)
    for b0 in range(208):
        w = np.float32(4 * np.pi) / np.float32(np.float32(b0) + 39.5)
        assert w0[b0] == w
        l_expect = int(0.9254 * int((np.pi / w) + 0.25))
        assert L[b0] == l_expect
        assert K[b0] == (int((l_expect + 2) / 3) if l_expect < 37 else 12)
    assert L.min() >= 9 and L.max() <= 56


def test_ambe2450_silence_models():
    """W124 -> L=15, W125 -> L=14 silence frames (test_params.c:322-341)."""
    state = st.init_state(2)
    d = np.stack([_ambe_d_with_b0(124), _ambe_d_with_b0(125)], axis=1)

    @jax.jit
    def run(d, cur, prev):
        return ambe.decode_ambe2450_parms(d, cur, prev,
                                          jnp.zeros(2, jnp.int32))

    cur, prev, bad = run(d, state.cur, state.prev)
    np.testing.assert_array_equal(np.asarray(bad), 0)
    np.testing.assert_array_equal(np.asarray(cur.L), [15, 14])
    vl = np.asarray(cur.Vl)  # [57, C]
    assert (vl[1:16, 0] == 0).all()
    assert (vl[1:15, 1] == 0).all()
    w0 = np.asarray(cur.w0)
    assert abs(w0[0] - (np.pi / 32) * 2 * np.pi) < 1e-5


def test_ambe2450_tone_ber_gate():
    """Tone-pattern frames with total BER >= 6 are NOT classified as tone
    and fall through to erasure via b0 (test_params.c:435-460)."""
    d = np.zeros((2, 49), np.int32)
    d[:, 0:6] = 1  # u0 high 6 bits = 63 -> tone check passes
    # u3 low nibble zero already
    te = jnp.array([0, 8], jnp.int32)
    state = st.init_state(2)

    @jax.jit
    def run(d, cur, prev, te):
        return ambe.decode_ambe2450_parms(d, cur, prev, te)

    _, _, bad = run(d.T, state.cur, state.prev, te)
    bad = np.asarray(bad)
    assert bad[0] == 7  # tone
    # b0 with bits 0..3 set = 0b1111000+... = (15<<3)=120 -> erasure
    assert bad[1] == 2


def test_erasure_model_w120():
    """Erasure frames carry the W120 model: w0=0, L=9, Ml=1, continuity from
    prev (ambe_common.c:231-260)."""
    state = st.init_state(1)
    prev = dataclasses.replace(
        state.prev,
        PHIl=jnp.full((57, 1), 0.5, jnp.float32),
        noiseSeed=jnp.full((1,), 777.0, jnp.float32))
    cur = dataclasses.replace(state.cur, repeatCount=jnp.zeros(1, jnp.int32))
    out = st.erasure_parms(cur, prev)
    assert float(out.w0[0]) == 0.0
    assert int(out.L[0]) == 9
    np.testing.assert_array_equal(np.asarray(out.Ml), 1.0)
    np.testing.assert_array_equal(np.asarray(out.PHIl), 0.5)
    assert float(out.noiseSeed[0]) == 777.0


def test_repeat_decision_without_c0_context():
    """Data-only paths repeat on totals alone: AMBE total>3, IMBE total>5
    (test_params.c:343-395)."""
    c = 4
    state = st.init_state(c)
    d = np.tile(_ambe_d_with_b0(40)[:, None], (1, c))
    totals = jnp.array([0, 3, 4, 10], jnp.int32)
    zeros = jnp.zeros(c, jnp.int32)
    novalid = jnp.zeros(c, bool)

    @jax.jit
    def run(d, te, c0, c0v, s):
        return ambe.process_ambe2450(d, te, c0, c0v, s.cur, s.prev, s.enh,
                                     s.comfort_rng, s.lcg_prime)

    out = run(d, totals, zeros, novalid, state)
    rep = np.asarray(out[6]["repeat"])
    np.testing.assert_array_equal(rep, [False, False, True, True])


def test_mute_policy_imbe_vs_ambe():
    """IMBE mutes on error rate; AMBE only on max repeats
    (mbelib.c:895-899, test_params.c:514-534)."""
    state = st.init_state(2)
    cur = dataclasses.replace(
        state.cur,
        errorRate=jnp.array([0.2, 0.2], jnp.float32),
        mutingThreshold=jnp.array([0.0875, 0.096], jnp.float32))
    m = np.asarray(speech.should_mute(cur))
    assert m[0] and not m[1]
    cur2 = dataclasses.replace(cur, repeatCount=jnp.array([0, 4], jnp.int32))
    m2 = np.asarray(speech.should_mute(cur2))
    assert m2[1]


def test_amplitude_threshold_may_go_negative():
    """Tm = 6000 - 300*errors + prev may go negative (test_params.c:573-594)."""
    Ml = jnp.ones((57, 1), jnp.float32)
    Vl = jnp.zeros((57, 1), jnp.int32)
    L = jnp.full((1,), 20, jnp.int32)
    _, _, _, tm = enhance.adaptive_smoothing(
        Ml, Vl, L,
        error_rate=jnp.full((1,), 0.2, jnp.float32),
        error_total=jnp.full((1,), 100, jnp.int32),
        error_count4=jnp.zeros((1,), jnp.int32),
        prev_local_energy=jnp.full((1,), 75000.0, jnp.float32),
        prev_amplitude_threshold=jnp.full((1,), 100, jnp.int32),
        rm0=jnp.full((1,), 1000.0, jnp.float32))
    assert int(tm[0]) == 6000 - 300 * 100 + 100  # negative


def test_psil_wrap():
    """PSIl wraps into [0, 2pi) during phase update (test_params.c:551-571)."""
    from mbe_tpu.ops import synth
    c = 1
    psi_old = jnp.full((57, c), -1.0, jnp.float32)
    phi_old = jnp.zeros((57, c), jnp.float32)
    prev_psi = jnp.full((57, c), 100.0, jnp.float32)
    nb = jnp.zeros((256, c), jnp.float32)
    cur_psi, cur_phi, wrapped = synth.update_phases(
        jnp.full((c,), 0.3, jnp.float32), jnp.full((c,), 20, jnp.int32),
        psi_old, phi_old, jnp.full((c,), 0.3, jnp.float32), prev_psi, nb,
        jnp.zeros((c,), jnp.int32))
    w = np.asarray(wrapped)[1:, 0]
    assert (w >= 0).all() and (w < 2 * np.pi).all()


def test_num_uv_counts_index_zero():
    """numUv includes band index 0 (test_params.c:620-642)."""
    from mbe_tpu.ops import synth
    Vl = np.ones((57, 1), np.int32)
    Vl[0, 0] = 0  # index 0 unvoiced
    n = int(np.asarray(synth.count_unvoiced(jnp.asarray(Vl),
                                            jnp.full((1,), 10, jnp.int32)))[0])
    assert n == 1


def test_imbe_headroom_reset_defaults():
    """Repeat overflow resets to the L=39 default model
    (imbe7200x4400.c:56-81, test_params.c:717-740)."""
    state = st.init_state(1)
    mp = dataclasses.replace(
        state.cur,
        L=jnp.full((1,), 56, jnp.int32),
        errorRate=jnp.full((1,), 0.5, jnp.float32),
        noiseSeed=jnp.full((1,), 123.0, jnp.float32))
    out = st.imbe_headroom_reset(mp)
    assert int(out.L[0]) == 39 and int(out.K[0]) == 12
    assert int(out.repeatCount[0]) == 0
    # error metrics and synthesis continuity preserved
    assert float(out.errorRate[0]) == np.float32(0.5)
    assert float(out.noiseSeed[0]) == 123.0


def test_seed_drives_both_rngs():
    """set seed: comfort RNG reseeded, LCG primes with seed%53125
    (test_params.c:596-618)."""
    s = st.init_state(2, rng_seed=jnp.array([100000, 0], jnp.uint32))
    assert float(s.lcg_prime[0]) == 100000 % 53125
    # zero seed maps to 0x6d25357b
    assert float(s.lcg_prime[1]) == 0x6D25357B % 53125


def test_hard_soft_c0_equivalence():
    """Clean frames decode identically through hard and max-reliability soft
    paths (test_params.c:409-433)."""
    rng = np.random.default_rng(21)
    frame = rng.integers(0, 2, (4, 4, 24)).astype(np.int32)
    rel = np.full((4, 4, 24), 255, np.int32)

    @jax.jit
    def run(fr, rl):
        dh, c0h, ph = ambe.decode_ambe3600_frame(fr)
        ds, c0s, ps = ambe.decode_ambe3600_frame(fr, rl)
        return dh, c0h, ph, ds, c0s, ps

    dh, c0h, ph, ds, c0s, ps = jax.tree.map(np.asarray, run(frame, rel))
    np.testing.assert_array_equal(dh, ds)
    np.testing.assert_array_equal(c0h, c0s)
    np.testing.assert_array_equal(ph, ps)


def test_tone_id_validity_independent_of_u1_low_nibble():
    """A valid tone frame is classified tone whether U3's low nibble is zero
    or U1's nibbles match (test_params.c:462-512)."""
    d = np.zeros((2, 49), np.int32)
    d[:, 0:6] = 1          # u0 tone check
    # lane 0: u3 low nibble zero (default)
    # lane 1: u3 low nibble nonzero but u1 high nibble == low nibble
    d[1, 45:49] = [1, 0, 0, 1]      # u3 low nibble = 9
    d[1, 12:16] = [0, 1, 0, 1]      # u1 high nibble = 5
    d[1, 20:24] = [0, 1, 0, 1]      # u1 low nibble = 5
    state = st.init_state(2)

    @jax.jit
    def run(dd, cur, prev):
        return ambe.decode_ambe2450_parms(dd, cur, prev,
                                          jnp.zeros(2, jnp.int32))

    _, _, bad = run(d.T, state.cur, state.prev)
    np.testing.assert_array_equal(np.asarray(bad), [7, 7])


def test_muted_frames_advance_smoothing_state():
    """Muted frames still update localEnergy/amplitudeThreshold
    (mbelib.c:1057-1064, test_params.c:536-549)."""
    from mbe_tpu.ops import noise as noise_ops
    state = st.init_state(1)
    cur = dataclasses.replace(
        state.cur,
        repeatCount=jnp.full((1,), 4, jnp.int32),  # forces mute
        errorRate=jnp.full((1,), 0.2, jnp.float32),
        errorCountTotal=jnp.full((1,), 50, jnp.int32))
    cn = jnp.zeros((160, 1), jnp.float32)
    rm0 = jnp.full((1,), 12345.0, jnp.float32)

    @jax.jit
    def run(c, p):
        return speech.synthesize_speech_core(c, p, cn, state.lcg_prime, rm0)

    audio, cur2, prev2, aux = run(cur, state.prev)
    assert bool(np.asarray(aux["mute"])[0])
    # localEnergy updated by the IIR even though the frame was muted
    expect = np.float32(0.95) * np.float32(75000.0) + np.float32(0.05) * np.float32(12345.0)
    assert abs(float(cur2.localEnergy[0]) - float(expect)) < 1.0
    # amplitudeThreshold recomputed (6000 - 300*50 + 20480)
    assert int(cur2.amplitudeThreshold[0]) == 6000 - 300 * 50 + 20480
    # noise LCG NOT advanced on muted lanes
    assert float(cur2.noiseSeed[0]) == float(cur.noiseSeed[0])


def test_imbe_recovers_from_ambe_threshold_contamination():
    """IMBE prepare always restores the IMBE muting threshold even if the
    state carries AMBE's 0.096 (test_params.c:742-764)."""
    state = st.init_state(1)
    contaminated = dataclasses.replace(
        state.cur, mutingThreshold=jnp.full((1,), 0.096, jnp.float32))
    d = np.zeros((88, 1), np.int32)  # b0=0 -> valid voice frame
    te = jnp.zeros((1,), jnp.int32)
    tm = jnp.ones((1,), bool)

    @jax.jit
    def run(dd, c, p, e, rng, lcgp):
        return imbe.process_imbe4400(dd, te, te, tm, te, tm, c, p, e, rng,
                                     lcgp)

    out = run(d, contaminated, state.prev, state.enh, state.comfort_rng,
              state.lcg_prime)
    cur2 = out[1]
    np.testing.assert_allclose(float(cur2.mutingThreshold[0]), 0.0875,
                               rtol=1e-6)


def test_c4_context_drives_error_count4():
    """IMBE prepare copies c4_errors into errorCount4 only when the C4
    context flag is valid (imbe7200x4400.c:798-801, test_params.c:644-703)."""
    state = st.init_state(2)
    d = np.zeros((88, 2), np.int32)
    te = jnp.zeros((2,), jnp.int32)
    c4 = jnp.array([3, 3], jnp.int32)
    c4v = jnp.array([True, False])
    tm = jnp.ones((2,), bool)

    @jax.jit
    def run(dd, c, p, e, rng, lcgp):
        return imbe.process_imbe4400(dd, te, te, tm, c4, c4v, c, p, e, rng,
                                     lcgp)

    out = run(d, state.cur, state.prev, state.enh, state.comfort_rng,
              state.lcg_prime)
    cur2 = out[1]
    np.testing.assert_array_equal(np.asarray(cur2.errorCount4), [3, 0])


def test_select_cases_matches_nested_select():
    """select_cases must be bit-identical to the nested first-match-wins
    select chain it replaced (models/state.py), including overlapping
    masks (earlier case shadows later), shared-leaf branches (the
    dataclasses.replace pattern), and NaN/Inf payloads."""
    rng = np.random.default_rng(5)
    C = 64
    mk = lambda: rng.standard_normal((3, C)).astype(np.float32)  # noqa: E731
    base = {"a": jnp.asarray(mk()), "b": jnp.asarray(mk()),
            "s": jnp.asarray(rng.integers(0, 9, C).astype(np.int32))}
    nan_leaf = mk()
    nan_leaf[0, ::3] = np.nan
    nan_leaf[1, ::5] = np.inf
    t1 = {**base, "a": jnp.asarray(nan_leaf)}          # shares b, s
    t2 = {**base, "s": base["s"] + 1}                  # shares a, b
    t3 = {"a": jnp.asarray(mk()), "b": jnp.asarray(mk()),
          "s": jnp.asarray(rng.integers(0, 9, C).astype(np.int32))}
    m1 = jnp.asarray(rng.integers(0, 2, C).astype(bool))
    m2 = jnp.asarray(rng.integers(0, 2, C).astype(bool))  # overlaps m1
    m3 = jnp.asarray(rng.integers(0, 2, C).astype(bool))

    got = jax.jit(lambda: st.select_cases(
        [(m1, t1), (m2, t2), (m3, t3)], base))()
    want = jax.jit(lambda: st.select_tree(
        m1, t1, st.select_tree(m2, t2, st.select_tree(m3, t3, base))))()
    for k in base:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]))
