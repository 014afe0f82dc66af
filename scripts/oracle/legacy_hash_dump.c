/*
 * Oracle driver: dump KATs for the reference's EXAMPLES-tier legacy hash
 * family (MD2/MD4/MD5/SHA-0/SHA-1/MDC2/GOST R 34.11-94 — reference
 * src/examples/hash/*.c, non-production digests kept for RSA/X.509
 * compatibility per examples/hash/hash.c) as JSON lines.
 *
 * Provenance of tests/vectors/legacy_hash_kats.jsonl: every digest here is
 * computed by the reference example code itself (compiled from
 * /root/reference/src/examples/hash), so the TPU build's extras-tier
 * implementations are parity-checked against the reference bit-for-bit
 * and the vectors are regenerable with `make -C scripts/oracle legacy`.
 */
#include <stdio.h>
#include <string.h>

#include "md2.h"
#include "md4.h"
#include "md5.h"
#include "sha0.h"
#include "sha1.h"
#include "mdc2.h"
#include "gostr34_11_94.h"

typedef int (*oneshot)(const unsigned char *in, u32 ilen, u8 *out);

static void emit(const char *alg, unsigned int len,
                 const unsigned char *d, unsigned int dlen)
{
	unsigned int k;
	printf("{\"alg\": \"%s\", \"len\": %u, \"digest\": \"", alg, len);
	for (k = 0; k < dlen; k++)
		printf("%02x", d[k]);
	printf("\", \"digest_size\": %u}\n", dlen);
}

int main(void)
{
	static unsigned char bufs[8][1000];
	unsigned int lens[8] = {0, 3, 55, 56, 64, 65, 137, 1000};
	unsigned int nb = 8, i, j;
	unsigned char d[64];

	memcpy(bufs[1], "abc", 3);
	for (i = 2; i < nb; i++)
		for (j = 0; j < lens[i]; j++)
			bufs[i][j] = (unsigned char)((j * 7 + i * 31) & 0xFF);

	for (i = 0; i < nb; i++) {
		if (md2(bufs[i], lens[i], d)) return 1;
		emit("MD2", lens[i], d, MD2_DIGEST_SIZE);
		if (md4(bufs[i], lens[i], d)) return 1;
		emit("MD4", lens[i], d, MD4_DIGEST_SIZE);
		if (md5(bufs[i], lens[i], d)) return 1;
		emit("MD5", lens[i], d, MD5_DIGEST_SIZE);
		if (sha0(bufs[i], lens[i], d)) return 1;
		emit("SHA0", lens[i], d, SHA0_DIGEST_SIZE);
		if (sha1(bufs[i], lens[i], d)) return 1;
		emit("SHA1", lens[i], d, SHA1_DIGEST_SIZE);
		if (mdc2_padding1(bufs[i], lens[i], d)) return 1;
		emit("MDC2_PAD1", lens[i], d, MDC2_DIGEST_SIZE);
		if (mdc2_padding2(bufs[i], lens[i], d)) return 1;
		emit("MDC2_PAD2", lens[i], d, MDC2_DIGEST_SIZE);
		if (gostr34_11_94_norm(bufs[i], lens[i], d)) return 1;
		emit("GOST34_11_94_NORM", lens[i], d,
		     GOSTR34_11_94_DIGEST_SIZE);
		if (gostr34_11_94_rfc4357(bufs[i], lens[i], d)) return 1;
		emit("GOST34_11_94_RFC4357", lens[i], d,
		     GOSTR34_11_94_DIGEST_SIZE);
	}
	return 0;
}
