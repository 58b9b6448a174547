/*
 * Host-side native helpers for the TPU decode farm.
 *
 * The TPU computes on [C, rows, cols] int32 bit arrays; radio stacks deliver
 * packed bytes. These helpers do the hot host-side transforms without
 * Python-loop overhead so the feeder thread can keep thousands of channels
 * saturated while the device computes (double-buffered streaming,
 * mbe_tpu/parallel/streaming.py):
 *
 *  - unpack_frames_bits: packed bytes -> int32 0/1 bit lanes (MSB-first)
 *  - pack_pcm_interleave: per-channel int16 PCM -> interleaved output
 *  - deinterleave_bits / scatter helpers for protocol-specific layouts
 *
 * Build: tools/build_native.sh -> mbe_tpu/data/libmbehost.so, loaded via
 * ctypes (mbe_tpu/native.py). No external dependencies.
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#if defined(__GNUC__)
#define MBE_EXPORT __attribute__((visibility("default")))
#else
#define MBE_EXPORT
#endif

/* Unpack n_bits MSB-first bits from each of n_frames packed byte strings
 * (stride_bytes apart) into int32 0/1 values. */
MBE_EXPORT void
mbe_host_unpack_bits(const uint8_t* packed, size_t stride_bytes,
                     int32_t* out, size_t n_frames, size_t n_bits) {
    for (size_t f = 0; f < n_frames; f++) {
        const uint8_t* src = packed + f * stride_bytes;
        int32_t* dst = out + f * n_bits;
        for (size_t i = 0; i < n_bits; i++) {
            dst[i] = (src[i >> 3] >> (7 - (i & 7))) & 1;
        }
    }
}

/* Pack int32 0/1 bit lanes back to MSB-first bytes. */
MBE_EXPORT void
mbe_host_pack_bits(const int32_t* bits, uint8_t* out, size_t n_frames,
                   size_t n_bits, size_t stride_bytes) {
    for (size_t f = 0; f < n_frames; f++) {
        const int32_t* src = bits + f * n_bits;
        uint8_t* dst = out + f * stride_bytes;
        memset(dst, 0, stride_bytes);
        for (size_t i = 0; i < n_bits; i++) {
            dst[i >> 3] = (uint8_t)(dst[i >> 3]
                                    | ((src[i] & 1) << (7 - (i & 7))));
        }
    }
}

/* Interleave per-channel PCM: in [channels][samples] -> out
 * [samples][channels] (for multi-channel audio sinks). */
MBE_EXPORT void
mbe_host_interleave_pcm(const int16_t* in, int16_t* out, size_t channels,
                        size_t samples) {
    for (size_t c = 0; c < channels; c++) {
        const int16_t* src = in + c * samples;
        for (size_t s = 0; s < samples; s++) {
            out[s * channels + c] = src[s];
        }
    }
}

/* Scatter flat bit strings into the codec bitplane layout given an index
 * table: out[f][k] = in[f][index[k]] with -1 meaning "fill zero". Used to
 * adapt arbitrary radio interleave orders to the [rows*cols] layout. */
MBE_EXPORT void
mbe_host_scatter_bits(const int32_t* in, const int32_t* index, int32_t* out,
                      size_t n_frames, size_t n_in, size_t n_out) {
    for (size_t f = 0; f < n_frames; f++) {
        const int32_t* src = in + f * n_in;
        int32_t* dst = out + f * n_out;
        for (size_t k = 0; k < n_out; k++) {
            int32_t idx = index[k];
            dst[k] = (idx >= 0 && (size_t)idx < n_in) ? src[idx] : 0;
        }
    }
}

MBE_EXPORT int
mbe_host_version(void) {
    return 1;
}
