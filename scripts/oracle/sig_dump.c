/* Dump signature KATs (fixed key, fixed nonce) from the reference library
 * as JSON lines, for every (scheme, curve, hash) in a chosen matrix. */
#include <libsig.h>
#include <stdio.h>
#include <string.h>

static const unsigned char FIXED_K[] = {
  0x0a,0x5c,0x1e,0x77,0x23,0x9b,0x4d,0x12,0x5f,0x60,0x71,0x88,0x93,0xa4,0xb5,0xc6,
  0xd7,0xe8,0xf9,0x01,0x12,0x23,0x34,0x45,0x56,0x67,0x78,0x89,0x9a,0xab,0xbc,0xcd,
  0xde,0xef,0xf0,0x0f,0x1e,0x2d,0x3c,0x4b,0x5a,0x69,0x78,0x87,0x96,0xa5,0xb4,0xc3,
  0xd2,0xe1,0xf0,0x10,0x21,0x32,0x43,0x54,0x65,0x76,0x87,0x98,0xa9,0xba,0xcb,0xdc,
  0x11,0x22 };

static int fixed_rand(nn_t out, nn_src_t q)
{
  /* reduce FIXED_K mod q to get a deterministic in-range nonce */
  nn k;
  int ret;
  ret = nn_init_from_buf(&k, FIXED_K, sizeof(FIXED_K)); if (ret) return ret;
  ret = nn_mod(out, &k, q); if (ret) return ret;
  return 0;
}

static const unsigned char PRIV[] = {
  0x00,0x9c,0x32,0x45,0x33,0x99,0xe1,0x26,0xd8,0x42,0x15,0x67,0x2c,0xaf,0x9e,0x84,
  0x40,0x96,0x67,0x83,0x4d,0x16,0x29,0x0e,0x73,0x61,0x5a,0x13,0x9b,0x07,0x2d,0x44,
  0x92,0x75,0xee,0x88,0xc7,0x9f,0x70,0x41,0x38,0x53,0x3a,0xbe,0x12,0x90,0x61,0xcd,
  0x12,0x9d,0x91,0x44,0xf6,0x77,0xb2,0xa8,0x2e,0x96,0x1c,0x55,0x09,0x12,0xab,0x11,
  0x33,0x44 };

static void hexout(const unsigned char *b, unsigned int n)
{
  unsigned int i;
  for (i = 0; i < n; i++) printf("%02x", b[i]);
}

struct combo { ec_alg_type alg; const char *alg_name; const char *curve; hash_alg_type hash; const char *hash_name; };

int main(void)
{
  /* message and adata */
  const unsigned char msg[] = "sample batched tpu message";
  const unsigned char adata[] = "1234567812345678";  /* SM2 user ID / ctx */
  struct combo combos[] = {
#ifdef WITH_SIG_ECDSA
    {ECDSA, "ECDSA", "SECP256R1", SHA256, "SHA256"},
    {ECDSA, "ECDSA", "SECP256K1", SHA256, "SHA256"},
    {ECDSA, "ECDSA", "SECP384R1", SHA384, "SHA384"},
    {ECDSA, "ECDSA", "SECP521R1", SHA512, "SHA512"},
    {ECDSA, "ECDSA", "BRAINPOOLP256R1", SHA256, "SHA256"},
    {ECDSA, "ECDSA", "FRP256V1", SHA256, "SHA256"},
    {ECDSA, "ECDSA", "SECP256R1", SHA3_256, "SHA3_256"},
    {ECDSA, "ECDSA", "SECP256R1", SM3, "SM3"},
    {ECDSA, "ECDSA", "SECP192R1", SHA224, "SHA224"},
    {ECDSA, "ECDSA", "SECP224R1", SHA224, "SHA224"},
    {ECDSA, "ECDSA", "BRAINPOOLP512R1", SHA512, "SHA512"},
#endif
#ifdef WITH_SIG_DECDSA
    {DECDSA, "DECDSA", "SECP256R1", SHA256, "SHA256"},
    {DECDSA, "DECDSA", "SECP384R1", SHA384, "SHA384"},
#endif
#ifdef WITH_SIG_ECGDSA
    {ECGDSA, "ECGDSA", "SECP256R1", SHA256, "SHA256"},
    {ECGDSA, "ECGDSA", "BRAINPOOLP256R1", SHA256, "SHA256"},
    {ECGDSA, "ECGDSA", "BRAINPOOLP384R1", SHA384, "SHA384"},
#endif
#ifdef WITH_SIG_ECKCDSA
    {ECKCDSA, "ECKCDSA", "SECP256R1", SHA256, "SHA256"},
    {ECKCDSA, "ECKCDSA", "BRAINPOOLP256R1", SHA256, "SHA256"},
    {ECKCDSA, "ECKCDSA", "SECP224R1", SHA512, "SHA512"},
#endif
#ifdef WITH_SIG_ECSDSA
    {ECSDSA, "ECSDSA", "SECP256R1", SHA256, "SHA256"},
    {ECSDSA, "ECSDSA", "BRAINPOOLP512R1", SHA512, "SHA512"},
#endif
#ifdef WITH_SIG_ECOSDSA
    {ECOSDSA, "ECOSDSA", "SECP256R1", SHA256, "SHA256"},
#endif
#ifdef WITH_SIG_ECFSDSA
    {ECFSDSA, "ECFSDSA", "SECP256R1", SHA256, "SHA256"},
    {ECFSDSA, "ECFSDSA", "BRAINPOOLP256R1", SHA256, "SHA256"},
#endif
#ifdef WITH_SIG_ECRDSA
    {ECRDSA, "ECRDSA", "GOST_R3410_2012_256_PARAMSETA", STREEBOG256, "STREEBOG256"},
    {ECRDSA, "ECRDSA", "GOST_R3410_2012_512_PARAMSETA", STREEBOG512, "STREEBOG512"},
    {ECRDSA, "ECRDSA", "SECP256R1", SHA256, "SHA256"},
#endif
#ifdef WITH_SIG_SM2
    {SM2, "SM2", "SM2P256V1", SM3, "SM3"},
    {SM2, "SM2", "SM2P256V1", SHA256, "SHA256"},
#endif
#ifdef WITH_SIG_BIGN
    {BIGN, "BIGN", "BIGN256V1", BELT_HASH, "BELT_HASH"},
    {BIGN, "BIGN", "BIGN384V1", BELT_HASH, "BELT_HASH"},
#endif
#ifdef WITH_SIG_DBIGN
    {DBIGN, "DBIGN", "BIGN256V1", BELT_HASH, "BELT_HASH"},
#endif
#ifdef WITH_SIG_BIP0340
    {BIP0340, "BIP0340", "SECP256K1", SHA256, "SHA256"},
#endif
  };
  unsigned int i;
  for (i = 0; i < sizeof(combos)/sizeof(combos[0]); i++) {
    const ec_str_params *sp;
    ec_params params;
    ec_key_pair kp;
    u8 sig[256], pub[512];
    u8 siglen;
    u8 publen;
    int ret;
    const struct combo *cb = &combos[i];
    ret = ec_get_curve_params_by_name((const u8*)cb->curve,
                                      (u8)(strlen(cb->curve)+1), &sp);
    if (ret) { fprintf(stderr, "no curve %s\n", cb->curve); continue; }
    ret = import_params(&params, sp);
    if (ret) { fprintf(stderr, "import %s failed\n", cb->curve); continue; }
    {
      u8 privlen = (u8)((params.ec_gen_order_bitlen + 7) / 8);
      ret = ec_key_pair_import_from_priv_key_buf(&kp, &params, PRIV, privlen, cb->alg);
      if (ret) { fprintf(stderr, "key import %s %s failed\n", cb->alg_name, cb->curve); continue; }
      ret = ec_get_sig_len(&params, cb->alg, cb->hash, &siglen);
      if (ret) { fprintf(stderr, "siglen %s failed\n", cb->alg_name); continue; }
      {
        const unsigned char bign_adata[] = {0x00,0x0b,0x00,0x00,0x06,0x09,0x2A,0x70,0x00,0x02,0x00,0x22,0x65,0x1F,0x51};
        const unsigned char *ad = adata; u16 adl = (u16)(sizeof(adata)-1);
        if (cb->alg == BIGN || cb->alg == DBIGN) { ad = bign_adata; adl = sizeof(bign_adata); }
        if (cb->alg == BIP0340) { ad = NULL; adl = 0; }
        ret = _ec_sign(sig, siglen, &kp, msg, (u32)(sizeof(msg)-1), fixed_rand,
                     cb->alg, cb->hash, ad, adl);
      }
      if (ret) { fprintf(stderr, "sign %s/%s failed\n", cb->alg_name, cb->curve); continue; }
      /* sanity: verify must accept */
      {
        const unsigned char bign_adata[] = {0x00,0x0b,0x00,0x00,0x06,0x09,0x2A,0x70,0x00,0x02,0x00,0x22,0x65,0x1F,0x51};
        const unsigned char *ad = adata; u16 adl = (u16)(sizeof(adata)-1);
        if (cb->alg == BIGN || cb->alg == DBIGN) { ad = bign_adata; adl = sizeof(bign_adata); }
        if (cb->alg == BIP0340) { ad = NULL; adl = 0; }
        ret = ec_verify(sig, siglen, &(kp.pub_key), msg, (u32)(sizeof(msg)-1),
                      cb->alg, cb->hash, ad, adl);
      }
      if (ret) { fprintf(stderr, "self-verify %s/%s failed\n", cb->alg_name, cb->curve); continue; }
      publen = (u8)(3 * ((params.ec_fp.p_bitlen + 7) / 8));
      ret = ec_pub_key_export_to_buf(&(kp.pub_key), pub, publen);
      if (ret) { fprintf(stderr, "pub export failed\n"); continue; }
      printf("{\"alg\": \"%s\", \"curve\": \"%s\", \"hash\": \"%s\", \"priv_len\": %u, "
             "\"msg\": \"sample batched tpu message\", \"adata\": \"1234567812345678\", \"pub\": \"",
             cb->alg_name, cb->curve, cb->hash_name, (unsigned)((params.ec_gen_order_bitlen + 7) / 8));
      hexout(pub, publen);
      printf("\", \"sig\": \"");
      hexout(sig, siglen);
      printf("\"}\n");
    }
  }
  return 0;
}
