/* JPEG baseline entropy-decode kernel (T.81 F.2.2) — the per-symbol
 * Huffman chain that cannot be vectorized (each symbol's bit length is
 * known only after decoding the previous one).  Compiled on demand by
 * functions/native.py with the system C compiler and loaded via ctypes;
 * functions/jpeg.py keeps a pure-Python fallback with identical
 * semantics (equality-pinned by tests/test_jpeg.py) for hosts without a
 * compiler.
 *
 * Inputs are fully pre-digested by the Python caller so the kernel is a
 * plain array walk with no JPEG container knowledge:
 *   data      entropy bytes of ONE restart segment, stuffing already
 *             stripped, padded with >= 8 zero bytes past nbits
 *   dc_len/dc_sym, ac_len/ac_sym
 *             flat 2^16-entry (length, symbol) lookups per scan
 *             component, stacked: table t occupies [t*65536, (t+1)*65536)
 *   slot_tab  per-slot scan-component index (selects the table pair)
 *   slot_comp per-slot component index (selects the DC predictor)
 *   slot_dst  per-slot destination offset into coef_out (block_row * 64
 *             + component base), one slot per data unit in MCU order
 *   coef_out  zero-initialised zigzag coefficient store
 *
 * Returns 0 on success or a negative error code the caller maps back to
 * the same ValueError messages the Python path raises.
 */
#include <stdint.h>

#define ERR_TRUNCATED -1
#define ERR_BAD_DC -2
#define ERR_BAD_AC -3
#define ERR_RUN_PAST_END -4

/* 32-bit window whose MSB is bit `pos` of the stream; only the top 25
 * bits are valid (off <= 7), and callers never need more than 16. */
static inline uint32_t win32(const uint8_t *d, int64_t pos) {
    int64_t i = pos >> 3;
    uint32_t b = ((uint32_t)d[i] << 24) | ((uint32_t)d[i + 1] << 16) |
                 ((uint32_t)d[i + 2] << 8) | (uint32_t)d[i + 3];
    return b << (pos & 7);
}

int decode_scan_segment(
    const uint8_t *data, int64_t nbits,
    const uint8_t *dc_len, const int16_t *dc_sym,
    const uint8_t *ac_len, const int16_t *ac_sym,
    const int32_t *slot_tab, const int32_t *slot_comp,
    const int64_t *slot_dst, int64_t n_slots,
    int32_t *coef_out)
{
    int64_t pos = 0;
    int32_t pred[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int64_t s = 0; s < n_slots; s++) {
        const int64_t tb = (int64_t)slot_tab[s] << 16;
        const int c = slot_comp[s];
        int32_t *blk = coef_out + slot_dst[s];
        /* ---- DC ---- */
        if (pos >= nbits) return ERR_TRUNCATED;
        uint32_t w = win32(data, pos);
        uint32_t w16 = w >> 16;
        int ln = dc_len[tb + w16];
        if (!ln) return ERR_BAD_DC;
        int size = dc_sym[tb + w16];
        if (size > 15) return ERR_BAD_DC; /* corrupt DHT (baseline max 11) */
        pos += ln;
        if (size) {
            if (pos >= nbits) return ERR_TRUNCATED;
            int32_t v = (int32_t)(win32(data, pos) >> (32 - size));
            pos += size;
            if (v < (1 << (size - 1))) v -= (1 << size) - 1;
            pred[c] += v;
        }
        blk[0] = pred[c];
        /* ---- AC ---- */
        int k = 1;
        while (k < 64) {
            if (pos >= nbits) return ERR_TRUNCATED;
            w16 = win32(data, pos) >> 16;
            ln = ac_len[tb + w16];
            if (!ln) return ERR_BAD_AC;
            int sym = ac_sym[tb + w16];
            pos += ln;
            if (sym == 0x00) break; /* EOB */
            if (sym == 0xF0) {      /* ZRL */
                k += 16;
                continue;
            }
            k += sym >> 4;
            size = sym & 15;
            if (!size) return ERR_BAD_AC; /* (run,0) is not a valid symbol */
            if (k > 63) return ERR_RUN_PAST_END;
            if (pos >= nbits) return ERR_TRUNCATED;
            int32_t v = (int32_t)(win32(data, pos) >> (32 - size));
            pos += size;
            if (v < (1 << (size - 1))) v -= (1 << size) - 1;
            blk[k] = v;
            k++;
        }
    }
    return 0;
}
