"""FSM-path golden sequences: crafted parameter-bit streams that walk the
tone (valid + invalid), silence, erasure-streak, repeat-to-mute/reinit,
headroom-reset, and error-rate-muting paths — compared against the
reference's mbe_process*Dataf outputs (tools/gen_fsm_vectors.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbe_tpu import api
from mbe_tpu.models import state as st

from conftest import snr_db

PROCESS = {
    "ambe2450": api.process_ambe2450_dataf,
    "ambe2400": api.process_ambe2400_dataf,
    "imbe7200": lambda d, s, te: api.process_imbe4400_dataf(d, s, te),
}


@pytest.mark.parametrize("codec", ["ambe2450", "ambe2400", "imbe7200"])
def test_fsm_paths_match_reference(vectors, codec):
    vec = vectors(f"fsm_{codec}")
    dbits = vec["dbits"]
    totals = vec["totals"]
    T = dbits.shape[0]

    state = st.init_state(1, rng_seed=np.uint32(vec["seed"]))
    fn = PROCESS[codec]
    run = jax.jit(lambda d, s, te: fn(d, s, te))

    hit = set()
    for t in range(T):
        audio, state, fsm = run(dbits[t][None], state,
                                jnp.asarray([totals[t]], jnp.int32))
        audio = np.asarray(audio)[0]

        flags = 0
        for name, bit in (("erasure", api.PROCESS_FLAG_ERASURE),
                          ("tone", api.PROCESS_FLAG_TONE),
                          ("repeat", api.PROCESS_FLAG_REPEAT),
                          ("mute", api.PROCESS_FLAG_MUTE)):
            if name in fsm and bool(np.asarray(fsm[name])[0]):
                flags |= bit
                hit.add(name)
        assert flags == int(vec["flags"][t]), \
            f"t={t}: flags {flags:#x} != ref {int(vec['flags'][t]):#x}"

        s = snr_db(vec["pcm"][t], audio)
        assert s >= 60.0, f"t={t}: SNR {s:.1f} dB (flags {flags:#x})"

    # the sequence must actually exercise the concealment machinery
    assert "repeat" in hit and "mute" in hit
    if codec == "ambe2450":
        assert "tone" in hit and "erasure" in hit
