/* Dump hash KATs from the reference library as JSON lines. */
#include <libsig.h>
#include <stdio.h>
#include <string.h>

static const char *names[] = {
  "SHA224","SHA256","SHA384","SHA512","SHA512_224","SHA512_256",
  "SHA3_224","SHA3_256","SHA3_384","SHA3_512","SM3","SHAKE256",
  "STREEBOG256","STREEBOG512","RIPEMD160","BELT_HASH",
  "BASH224","BASH256","BASH384","BASH512"
};

int main(void) {
  /* test messages: empty, "abc", 55/56/64/65/1000-byte patterned */
  unsigned char bufs[8][1000];
  unsigned int lens[8] = {0, 3, 55, 56, 64, 65, 137, 1000};
  unsigned int nb = 8, i, j, a;
  memcpy(bufs[1], "abc", 3);
  for (i = 2; i < nb; i++)
    for (j = 0; j < lens[i]; j++) bufs[i][j] = (unsigned char)((j * 7 + i * 31) & 0xFF);
  for (a = 0; a < sizeof(names)/sizeof(names[0]); a++) {
    const hash_mapping *hm;
    if (get_hash_by_name(names[a], &hm) || hm == NULL) {
      fprintf(stderr, "skip %s\n", names[a]); continue;
    }
    for (i = 0; i < nb; i++) {
      hash_context ctx; unsigned char d[128]; unsigned int k;
      if (hm->hfunc_init(&ctx)) return 1;
      /* split update to exercise streaming */
      unsigned int half = lens[i] / 2;
      if (hm->hfunc_update(&ctx, bufs[i], half)) return 1;
      if (hm->hfunc_update(&ctx, bufs[i] + half, lens[i] - half)) return 1;
      if (hm->hfunc_finalize(&ctx, d)) return 1;
      printf("{\"alg\": \"%s\", \"len\": %u, \"digest\": \"", names[a], lens[i]);
      for (k = 0; k < hm->digest_size; k++) printf("%02x", d[k]);
      printf("\", \"digest_size\": %u, \"block_size\": %u}\n", hm->digest_size, hm->block_size);
    }
  }
  return 0;
}
