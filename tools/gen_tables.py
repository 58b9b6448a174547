#!/usr/bin/env python3
"""Build + run the reference table dumper and package the tables as an .npz.

Usage:
    python tools/gen_tables.py [--ref /root/reference] [--build /tmp/refbuild] \
        [--out mbe_tpu/data/tables.npz]

The output npz is committed to the repo so tests/runtime never need the
reference tree. Also derives a few small tables (D-STAR tone scramble LUTs,
demod PRNG affine-jump tables, unvoiced-LCG jump tables) that are pure
integer math.
"""

import argparse
import os
import subprocess
import sys

import numpy as np


def run_dumper(ref: str, build: str) -> str:
    src = os.path.join(os.path.dirname(__file__), "dump_tables.c")
    exe = "/tmp/mbe_dump_tables"
    cmd = [
        "gcc", "-O1",
        f"-I{ref}/src/internal",
        f"-I{ref}/include",
        f"-I{build}/include",  # generated version.h if any
        src,
        os.path.join(build, "libmbe-neo.a"),
        "-lm", "-o", exe,
    ]
    subprocess.run(cmd, check=True)
    return subprocess.run([exe], check=True, capture_output=True, text=True).stdout


def parse_dump(text: str) -> dict:
    out = {}
    lines = text.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        parts = line.split()
        name, dtype, ndim = parts[0], parts[1], int(parts[2])
        dims = [int(x) for x in parts[3 : 3 + ndim]]
        n = int(np.prod(dims))
        vals = lines[i : i + n]
        i += n
        if dtype == "f32":
            arr = np.array([float.fromhex(v) for v in vals], dtype=np.float32)
        else:
            arr = np.array([int(v) for v in vals], dtype=np.int32)
        out[name] = arr.reshape(dims)
    return out


def derived_tables() -> dict:
    """Small tables derived from the reference algorithms (pure integer math)."""
    t = {}

    # D-STAR AMBE2400 tone-index scramble LUTs (ambe3600x2400.c:179-181).
    t["dstar_t7tab"] = np.array([1, 0, 0, 0, 0, 1, 1, 1], dtype=np.int32)
    t["dstar_t6tab"] = np.array([0, 0, 0, 1, 1, 1, 1, 0], dtype=np.int32)
    t["dstar_t5tab"] = np.array([0, 0, 1, 0, 1, 1, 0, 1], dtype=np.int32)

    # Demod PRNG affine jump: pr[k] = (A[k]*pr0 + B[k]) mod 2^16 where
    # pr' = 173*pr + 13849 mod 2^16 (ambe_common.c:88, imbe7200x4400.c:652).
    K = 115
    A = np.zeros(K, dtype=np.int64)
    B = np.zeros(K, dtype=np.int64)
    A[0], B[0] = 1, 0
    for k in range(1, K):
        A[k] = (173 * A[k - 1]) % 65536
        B[k] = (173 * B[k - 1] + 13849) % 65536
    t["demod_prng_A"] = A.astype(np.int32)
    t["demod_prng_B"] = B.astype(np.int32)

    # Unvoiced-noise LCG jump: state_{n+k} = (A[k]*state_n + B[k]) mod 53125
    # for x' = 171x + 11213 mod 53125 (mbe_unvoiced_fft.c:287-292).
    K = 161  # offsets 0..160 (160 = one frame advance)
    A = np.zeros(K, dtype=np.int64)
    B = np.zeros(K, dtype=np.int64)
    A[0], B[0] = 1, 0
    for k in range(1, K):
        A[k] = (171 * A[k - 1]) % 53125
        B[k] = (171 * B[k - 1] + 11213) % 53125
    t["lcg_A"] = A.astype(np.int32)
    t["lcg_B"] = B.astype(np.int32)

    return t


def golay_codebook(golay_generator: np.ndarray) -> dict:
    """All 4096 Golay(23,12) codewords as bit arrays, LSB-first bit index 0..22.

    Encoding per golay_encode_data_word (ecc.c:69-83): data bit i (MSB-first
    over 12 bits) lands at position 22-i; parity = XOR of generator rows for
    set data bits, placed at positions 10..0.
    """
    cw = np.zeros((4096, 23), dtype=np.int8)
    gen = golay_generator.astype(np.int64)
    for data in range(4096):
        ecc = 0
        for i in range(12):
            bit = (data >> (11 - i)) & 1
            cw[data, 22 - i] = bit
            if bit:
                ecc ^= int(gen[i])
        for j in range(11):
            cw[data, j] = (ecc >> j) & 1
    return {"golay_codewords": cw}


def hamming_codebook(generator: np.ndarray, data_pos, parity_pos) -> np.ndarray:
    """All 2048 Hamming(15,11) codewords, LSB-first positions (ecc.c:138-155)."""

    def syndrome(block: int) -> int:
        s = 0
        for i in range(4):
            v = block & int(generator[i])
            s |= (bin(v).count("1") & 1) << i
        return s

    cw = np.zeros((2048, 15), dtype=np.int8)
    ok = np.zeros(2048, dtype=bool)
    for data in range(2048):
        cand = np.zeros(15, dtype=np.int8)
        for i in range(11):
            cand[data_pos[i]] = (data >> i) & 1
        for p in range(16):
            for i in range(4):
                cand[parity_pos[i]] = (p >> i) & 1
            block = 0
            for i in range(14, -1, -1):
                block = (block << 1) | int(cand[i])
            if syndrome(block) == 0:
                cw[data] = cand
                ok[data] = True
                break
    assert ok.all()
    return cw


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--build", default="/tmp/refbuild")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "mbe_tpu", "data", "tables.npz"))
    args = ap.parse_args()

    tables = parse_dump(run_dumper(args.ref, args.build))
    tables.update(derived_tables())
    tables.update(golay_codebook(tables["golayGenerator"]))
    tables["hamming_codewords_std"] = hamming_codebook(
        tables["hammingGenerator"],
        data_pos=[2, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14],
        parity_pos=[0, 1, 3, 7],
    )
    tables["hamming_codewords_7100"] = hamming_codebook(
        tables["imbe7100x4400hammingGenerator"],
        data_pos=[4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14],
        parity_pos=[0, 1, 2, 3],
    )

    # Hamming syndrome->bitmask LUTs (ecc.c:28-36).
    tables["ham1511_lut"] = np.array(
        [0, 8, 4, 2048, 2, 512, 64, 8192, 1, 256, 32, 4096, 16, 1024, 128, 16384],
        dtype=np.int32)
    tables["ham1511_7100_lut"] = np.array(
        [0, 8, 4, 64, 2, 512, 32, 2048, 1, 16384, 256, 8192, 16, 128, 1024, 4096],
        dtype=np.int32)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **tables)
    print(f"wrote {out} with {len(tables)} tables:")
    for k, v in sorted(tables.items()):
        print(f"  {k}: {v.dtype} {v.shape}")


if __name__ == "__main__":
    main()
