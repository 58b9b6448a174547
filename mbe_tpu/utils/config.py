"""Decoder configuration (the reference's CMake-option equivalents).

The reference's runtime knobs are compile definitions (CMakeLists.txt:41-74):
NOTONES -> DISABLE_AMBE_TONES (tone synthesis compiled to silence,
mbelib.c:747-751), plus the RNG seed. Here they are a frozen dataclass that
drives jit specialization — a different config compiles a different
executable, same as a different #define builds a different library.
"""

import dataclasses


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Static configuration for pipeline.step / run_sequence.

    Attributes:
      codec: one of pipeline.CODECS.
      tones_enabled: False mirrors DISABLE_AMBE_TONES — tone frames render
        silence but the FSM classification/flags are unchanged.
      int16_output: convert PCM to int16 on-device (the `short` API).
      validate_lanes: per-lane MBE_STATUS_INVALID_BITS masking inside the
        jitted step (invalid lanes -> silence + state rollback + status=-2).
        True mirrors the reference, which validates every frame on entry;
        False is for trusted in-pipeline inputs already known to be 0/1.
    """

    codec: str = "imbe7200"
    tones_enabled: bool = True
    int16_output: bool = False
    validate_lanes: bool = True


DEFAULT = DecoderConfig()
