// Host runtime: batched byte <-> limb conversions and hash-block packing.
//
// This is the framework's native (C++) layer — the host-side analog of the
// reference's word/byte machinery (src/nn/nn.c nn_init_from_buf :479 /
// nn_export_to_buf :511, and the hash block ingestion). In a serving
// deployment the device computes millions of signatures per second and the
// host must marshal keys/signatures/messages at matching rate; these loops
// are the host hot path, so they are implemented natively (unaligned-load
// + byteswap inner loops, OpenMP across the batch) and exposed to Python
// via ctypes (pybind11 is deliberately avoided — plain C ABI).
//
// Layouts match libecc_tpu.nn.core: little-endian 15-bit limbs in uint32,
// batch-major output shape (k, n) stored row-major (limb index outer).

#include <cstdint>
#include <cstring>
#include <cstddef>

static const int LIMB_BITS = 15;

static inline uint32_t load_be32(const uint8_t* p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return __builtin_bswap32(v);
}

extern "C" {

// in:  n items of item_len big-endian bytes, contiguous
// out: uint32[k][n] row-major 15-bit limbs (little-endian limb order)
void be_bytes_to_limbs(const uint8_t* in, size_t n, size_t item_len,
                       uint32_t* out, int k) {
    const size_t total_bits = item_len * 8;
#pragma omp parallel for schedule(static) if (n > 1024)
    for (size_t i = 0; i < n; ++i) {
        const uint8_t* p = in + i * item_len;
        for (int j = 0; j < k; ++j) {
            const size_t lo_bit = (size_t)j * LIMB_BITS;
            uint32_t v = 0;
            if (lo_bit < total_bits) {
                const size_t byte_lo = lo_bit >> 3;   // from LSB end
                const int sh = (int)(lo_bit & 7);
                // read the 4 bytes ending at (item_len-1 - byte_lo)
                const ptrdiff_t end = (ptrdiff_t)(item_len - byte_lo);
                uint32_t acc;
                if (end >= 4) {
                    acc = load_be32(p + end - 4);
                } else {
                    acc = 0;
                    for (ptrdiff_t b = 0; b < end; ++b)
                        acc = (acc << 8) | p[b];
                }
                // sh <= 7, so the 32-bit window always covers all
                // 15 limb bits: no straddle handling needed
                v = (acc >> sh) & 0x7FFF;
            }
            out[(size_t)j * n + i] = v;
        }
    }
}

// in:  uint32[k][n] row-major canonical 15-bit limbs
// out: n items of item_len big-endian bytes
void limbs_to_be_bytes(const uint32_t* in, size_t n, int k,
                       uint8_t* out, size_t item_len) {
    memset(out, 0, n * item_len);
#pragma omp parallel for schedule(static) if (n > 1024)
    for (size_t i = 0; i < n; ++i) {
        uint8_t* p = out + i * item_len;
        for (int j = 0; j < k; ++j) {
            uint32_t v = in[(size_t)j * n + i] & 0x7FFF;
            if (!v) continue;
            size_t lo_bit = (size_t)j * LIMB_BITS;
            size_t byte_lo = lo_bit >> 3;
            int sh = (int)(lo_bit & 7);
            uint32_t acc = v << sh;   // fits 15+7 = 22 bits
            for (int b = 0; b < 3 && byte_lo + (size_t)b < item_len; ++b) {
                p[item_len - 1 - (byte_lo + (size_t)b)] |=
                    (uint8_t)((acc >> (8 * b)) & 0xFF);
            }
        }
    }
}

// Merkle-Damgard pad+pack for 64-byte-block hashes (SHA-256/SM3 layout):
// n messages of mlen bytes -> uint32[nblk][16][n] big-endian words.
// Returns the number of blocks, or -1 if out_cap is too small.
int md_pad_pack_be64(const uint8_t* in, size_t n, size_t mlen,
                     uint32_t* out, size_t out_cap) {
    size_t padded = mlen + 1 + 8;
    size_t nblk = (padded + 63) / 64;
    size_t padlen = nblk * 64;
    if (out_cap < nblk * 16 * n) return -1;
    uint64_t bitlen = (uint64_t)mlen * 8;
    // padding template beyond the message bytes
#pragma omp parallel for schedule(static) if (n > 256)
    for (size_t i = 0; i < n; ++i) {
        const uint8_t* m = in + i * mlen;
        const size_t full_words = mlen / 4;
        size_t w = 0;
        for (; w < full_words; ++w)
            out[w * n + i] = load_be32(m + w * 4);
        for (; w < nblk * 16; ++w) {
            uint32_t acc = 0;
            for (int b = 0; b < 4; ++b) {
                size_t pos = w * 4 + (size_t)b;
                uint8_t byte;
                if (pos < mlen) byte = m[pos];
                else if (pos == mlen) byte = 0x80;
                else if (pos >= padlen - 8)
                    byte = (uint8_t)(bitlen >> (8 * (padlen - 1 - pos)));
                else byte = 0;
                acc = (acc << 8) | byte;
            }
            out[w * n + i] = acc;
        }
    }
    return (int)nblk;
}

}  // extern "C"
