"""Integer-domain RNG parity: unvoiced LCG, demod PRNG, Java-Random comfort
noise — all bit-exact vs pure-Python big-int oracles (the same recurrences as
mbe_unvoiced_fft.c:287-292, ambe_common.c:88, mbe_adaptive.c:51-60)."""

import jax
import jax.numpy as jnp
import numpy as np

from mbe_tpu.ops import demod, noise


def test_lcg_block_exact():
    rng = np.random.default_rng(0)
    st = rng.integers(0, 53125, 64).astype(np.int32)
    samp, nxt = jax.jit(lambda s: noise.lcg_block(s, 160))(st)
    samp, nxt = np.asarray(samp), np.asarray(nxt)  # samp [160, C]
    for i in range(64):
        s = int(st[i])
        for k in range(160):
            assert samp[k, i] == s
            s = (171 * s + 11213) % 53125
        assert nxt[i] == s


def test_demod_prng_exact():
    rng = np.random.default_rng(1)
    seeds = (rng.integers(0, 4096, 64) * 16).astype(np.int32)
    out = np.asarray(jax.jit(lambda s: demod.prng_bits(s, 114))(seeds))
    for i in range(64):  # out [114, C]
        pr = int(seeds[i])
        for k in range(114):
            pr = (173 * pr + 13849) % 65536
            assert out[k, i] == (pr >> 15)


def test_java_random_exact():
    seed = 12345

    @jax.jit
    def run(s):
        return noise.comfort_noise(noise.java_random_init(s), 160)

    samp, _ = run(jnp.full((2,), seed, jnp.uint32))
    samp = np.asarray(samp)  # [160, C]

    seed48 = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)
    gain = np.float32((0.003 * 32767.0) / 7.0)
    for k in range(160):
        seed48 = (seed48 * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        v = seed48 >> 24
        u = (np.float32(v) / np.float32(16777216.0)) * np.float32(2.0) \
            - np.float32(1.0)
        assert samp[k, 0] == np.float32(u * gain)
    np.testing.assert_array_equal(samp[:, 0], samp[:, 1])


def test_cold_start_emits_zero_buffer_then_primes():
    """mbe_unvoiced_fft.c:311-321: seed<0 -> all-zero buffer, seed primed."""
    c = 4

    @jax.jit
    def run(seed, prev_seed, prime):
        return noise.generate_noise_with_overlap(seed, prev_seed, prime)

    seed = jnp.array([-1.0, -1.0, 100.0, 0.0], jnp.float32)
    prev_seed = jnp.array([-1.0, -1.0, 200.0, -1.0], jnp.float32)
    prime = jnp.array([3147.0, 555.0, 3147.0, 3147.0], jnp.float32)
    buf, new_seed, new_ps = jax.tree.map(
        np.asarray, run(seed, prev_seed, prime))

    np.testing.assert_array_equal(buf[:, 0], 0.0)
    assert new_ps[0] == -1.0  # post-cold-start: overlap region is zeros
    assert new_seed[0] == 3147.0
    assert new_seed[1] == 555.0
    # warm lane: head = overlap (= LCG samples 64..159 of the prev seed),
    # tail = LCG from seed
    s = 200
    for _ in range(64):
        s = (171 * s + 11213) % 53125
    for j in range(96):
        assert buf[j, 2] == np.float32(s)
        s = (171 * s + 11213) % 53125
    assert buf[96, 2] == 100.0
    assert new_seed[2] == np.float32((171 ** 160 * 100 + _b160()) % 53125)
    assert new_ps[2] == 100.0  # next overlap comes from the seed just used
    # prev_seed < 0 with a warm seed (the frame right after a cold start):
    # overlap region must be zeros
    np.testing.assert_array_equal(buf[:96, 3], 0.0)
    assert buf[96, 3] == 0.0 and buf[97, 3] == np.float32(11213.0)


def test_overlap_scalarization_matches_carried_array():
    """The carried noisePrevSeed scalar reproduces the reference's carried
    96-float overlap array bit-for-bit across consecutive warm frames: the
    tail of frame N's buffer must equal the head (overlap region) of frame
    N+1's buffer (mbe_unvoiced_fft.c:330-338)."""
    c = 8
    rng = np.random.default_rng(3)
    seeds = rng.integers(0, 53125, c).astype(np.float32)

    @jax.jit
    def two_frames(seed):
        ps = jnp.full((c,), -1.0, jnp.float32)
        prime = jnp.full((c,), 3147.0, jnp.float32)
        b1, s1, ps1 = noise.generate_noise_with_overlap(seed, ps, prime)
        b2, s2, ps2 = noise.generate_noise_with_overlap(s1, ps1, prime)
        return b1, b2

    b1, b2 = jax.tree.map(np.asarray, two_frames(jnp.asarray(seeds)))
    np.testing.assert_array_equal(b1[160:, :], b2[:96, :])


def _b160():
    b = 0
    for _ in range(160):
        b = (171 * b + 11213) % 53125
    return b
