/*
 * Mechanical table extractor for the reference library (/root/reference).
 *
 * Emits every quantization/ECC/window constant table needed by the TPU
 * rebuild to stdout as text:  "name dtype ndim d0 d1 ... \n" followed by one
 * value per token (hex floats via %a for bit-exactness).
 *
 * This is a data-extraction tool, not part of the shipped framework. The
 * tables themselves are codec constants (ultimately from the JMBE/IMBE
 * specifications) that any compatible implementation must share.
 *
 * Build:
 *   gcc -O1 -I$REF/src/internal -I$REF/include tools/dump_tables.c \
 *       $REF_BUILD/libmbe-neo.a -lm -o /tmp/dump_tables
 */
#include <stdio.h>
#include <math.h>

#include "mbelib-neo/mbelib.h"

/* const-table headers (tables are `static const`, so visible here) */
#include "ambe3600x2450_const.h"
#include "ambe3600x2400_const.h"
#include "imbe7200x4400_const.h"
#include "mbelib_const.h"
#include "mbe_tone.h"
#include "ecc_const.h"
#include "mbe_unvoiced_fft.h"

static void
dump_f32(const char* name, const float* data, int ndim, const int* dims) {
    long n = 1;
    printf("%s f32 %d", name, ndim);
    for (int i = 0; i < ndim; i++) {
        printf(" %d", dims[i]);
        n *= dims[i];
    }
    printf("\n");
    for (long i = 0; i < n; i++) {
        printf("%a\n", (double)data[i]);
    }
}

static void
dump_i32(const char* name, const int* data, int ndim, const int* dims) {
    long n = 1;
    printf("%s i32 %d", name, ndim);
    for (int i = 0; i < ndim; i++) {
        printf(" %d", dims[i]);
        n *= dims[i];
    }
    printf("\n");
    for (long i = 0; i < n; i++) {
        printf("%d\n", data[i]);
    }
}

#define DUMP_F(name, ...)                          \
    do {                                           \
        int dims[] = {__VA_ARGS__};                \
        dump_f32(#name, (const float*)name,        \
                 (int)(sizeof(dims) / sizeof(int)), dims); \
    } while (0)

#define DUMP_I(name, ...)                          \
    do {                                           \
        int dims[] = {__VA_ARGS__};                \
        dump_i32(#name, (const int*)name,          \
                 (int)(sizeof(dims) / sizeof(int)), dims); \
    } while (0)

int
main(void) {
    /* AMBE+2 3600x2450 tables */
    DUMP_F(AmbeW0table, 120);
    DUMP_F(AmbeLtable, 120);
    DUMP_I(AmbeVuv, 32, 8);
    DUMP_I(AmbeLmprbl, 57, 4);
    DUMP_F(AmbeDg, 32);
    DUMP_F(AmbePRBA24, 512, 3);
    DUMP_F(AmbePRBA58, 128, 4);
    DUMP_F(AmbeHOCb5, 32, 4);
    DUMP_F(AmbeHOCb6, 16, 4);
    DUMP_F(AmbeHOCb7, 16, 4);
    DUMP_F(AmbeHOCb8, 8, 4);

    /* AMBE 3600x2400 tables */
    DUMP_F(AmbePlusLtable, 126);
    DUMP_I(AmbePlusVuv, 16, 8);
    DUMP_I(AmbePlusLmprbl, 57, 4);
    DUMP_F(AmbePlusDg, 64);
    DUMP_F(AmbePlusPRBA24, 512, 3);
    DUMP_F(AmbePlusPRBA58, 128, 4);
    DUMP_F(AmbePlusHOCb5, 16, 4);
    DUMP_F(AmbePlusHOCb6, 16, 4);
    DUMP_F(AmbePlusHOCb7, 16, 4);
    DUMP_F(AmbePlusHOCb8, 16, 4);

    /* IMBE 7200x4400 tables */
    DUMP_F(quantstep, 11);
    DUMP_F(standdev, 9);
    DUMP_F(B2, 64);
    DUMP_F(ba, 48, 5, 2);
    DUMP_I(hoba, 48, 50);
    DUMP_I(bo, 48, 79, 2);
    DUMP_I(ImbeJi, 48, 6);

    /* Voiced synthesis window (321 taps) */
    DUMP_F(Ws, 321);

    /* ECC generators + Golay syndrome table (extern, linked from lib) */
    DUMP_I(hammingGenerator, 4);
    DUMP_I(imbe7100x4400hammingGenerator, 4);
    DUMP_I(golayGenerator, 12);
    DUMP_I(golayMatrix, 2048);

    /* Unvoiced synthesis window via public accessor (mbe_unvoiced_fft.c:202) */
    {
        float w[211];
        for (int n = -105; n <= 105; n++) {
            w[n + 105] = mbe_synthesisWindow(n);
        }
        int dims[] = {211};
        dump_f32("Ws_synthesis", w, 1, dims);
    }

    /* Tone id -> (freq1, freq2) map + validity for id 0..255 (mbe_tone.h) */
    {
        float freqs[256][2];
        int valid[256];
        for (int id = 0; id < 256; id++) {
            valid[id] = mbe_tone_lookup_freqs(id, &freqs[id][0], &freqs[id][1]);
        }
        int d2[] = {256, 2};
        int d1[] = {256};
        dump_f32("tone_freqs", (const float*)freqs, 2, d2);
        dump_i32("tone_valid", valid, 1, d1);
    }

    /* DCT cosine tables exactly as the codecs precompute them with cosf()
     * (ambe3600x2450.c:60-74, ambe3600x2400.c:59-73, imbe7200x4400.c:97-111) */
    {
        float ri8[9][9] = {{0}};
        for (int m = 1; m <= 8; m++) {
            for (int i = 1; i <= 8; i++) {
                ri8[m][i] = cosf((float)((M_PI * (float)(m - 1) * ((float)i - 0.5f)) / 8.0f));
            }
        }
        int d[] = {9, 9};
        dump_f32("ambe_ri_cos", (const float*)ri8, 2, d);
    }
    {
        static float idct[18][18][18] = {{{0}}};
        for (int ji = 1; ji <= 17; ji++) {
            for (int j = 1; j <= ji; j++) {
                for (int k = 1; k <= ji; k++) {
                    idct[ji][j][k] = cosf((float)((M_PI * (float)(k - 1) * ((float)j - 0.5f)) / (float)ji));
                }
            }
        }
        int d[] = {18, 18, 18};
        dump_f32("ambe_idct_cos", (const float*)idct, 3, d);
    }
    {
        float ri6[7][7] = {{0}};
        for (int m = 1; m <= 6; m++) {
            for (int i = 1; i <= 6; i++) {
                ri6[m][i] = cosf((float)((M_PI * (float)(m - 1) * ((float)i - 0.5f)) / 6.0f));
            }
        }
        int d[] = {7, 7};
        dump_f32("imbe_ri_cos", (const float*)ri6, 2, d);
    }
    {
        static float idct[11][11][11] = {{{0}}};
        for (int ji = 1; ji <= 10; ji++) {
            for (int j = 1; j <= ji; j++) {
                for (int k = 1; k <= ji; k++) {
                    idct[ji][j][k] = cosf((float)((M_PI * (float)(k - 1) * ((float)j - 0.5f)) / (float)ji));
                }
            }
        }
        int d[] = {11, 11, 11};
        dump_f32("imbe_idct_cos", (const float*)idct, 3, d);
    }

    /* Per-b0 derived model tables, replicating the exact mixed float/double
     * arithmetic of the decoders so the rebuild can gather instead of
     * recomputing with (possibly differently-rounded) transcendentals. */
    {
        /* IMBE 4400: w0/L/K from b0 (imbe7200x4400.c:132-148) */
        float w0[208];
        int L[208], K[208];
        for (int b0 = 0; b0 < 208; b0++) {
            w0[b0] = ((float)(4 * M_PI) / (float)((float)b0 + 39.5));
            L[b0] = (int)(0.9254 * (int)((M_PI / w0[b0]) + 0.25));
            K[b0] = (L[b0] < 37) ? (int)((float)(L[b0] + 2) / (float)3) : 12;
        }
        int d[] = {208};
        dump_f32("imbe_w0_by_b0", w0, 1, d);
        dump_i32("imbe_L_by_b0", L, 1, d);
        dump_i32("imbe_K_by_b0", K, 1, d);
    }
    {
        /* AMBE 2450: w0 from AmbeW0table (ambe3600x2450.c:548-549),
         * plus the silence model w0 (ambe3600x2450.c:496-498). */
        float w0[120];
        for (int b0 = 0; b0 < 120; b0++) {
            w0[b0] = AmbeW0table[b0] * (float)2 * M_PI;
        }
        int d[] = {120};
        dump_f32("ambe2450_w0_by_b0", w0, 1, d);
        float sil_f0 = (float)M_PI / 32.0f;
        float sil[2] = {sil_f0, sil_f0 * (float)(2.0 * M_PI)};
        int d2[] = {2};
        dump_f32("ambe2450_silence_f0_w0", sil, 1, d2);
    }
    {
        /* AMBE 2400: f0/w0 from b0 (ambe3600x2400.c:238-239),
         * plus silence w0 (ambe3600x2400.c:204). */
        float f0[126], w0[126];
        for (int b0 = 0; b0 < 126; b0++) {
            f0[b0] = exp2f(-4.311767578125f - (2.1336e-2f * ((float)b0 + 0.5f)));
            w0[b0] = f0[b0] * (float)2 * M_PI;
        }
        int d[] = {126};
        dump_f32("ambe2400_f0_by_b0", f0, 1, d);
        dump_f32("ambe2400_w0_by_b0", w0, 1, d);
        float sil[1] = {((float)2 * M_PI) / (float)32};
        int d1[] = {1};
        dump_f32("ambe2400_silence_w0", sil, 1, d1);
    }
    {
        /* AMBE W124 default / erasure fundamentals (ambe_common.c:200,241)
         * and IMBE default fundamental (mbelib.c:378-379). */
        float v[3];
        v[0] = (float)((M_PI / 32.0) * (2.0 * M_PI)); /* W124 default w0 */
        v[1] = 0.0f;                                   /* erasure w0 */
        v[2] = (float)((4.0 * M_PI) / (134.0 + 39.5)); /* IMBE default w0 */
        int d[] = {3};
        dump_f32("default_w0", v, 1, d);
    }

    return 0;
}
