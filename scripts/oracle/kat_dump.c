/*
 * Oracle driver: dump the reference libecc's ENTIRE fixed-vector KAT matrix
 * (src/tests/ec_self_tests_core.h:4915 ec_fixed_vector_tests[] — every
 * signature case with its fixed nonce — plus ecdh_fixed_vector_tests[] at
 * :5294) as JSON lines, one per case.
 *
 * This is the provenance of tests/vectors/kats_full.jsonl: the expected
 * signatures are computed BY THE REFERENCE LIBRARY itself (we re-sign with
 * the case's injected nonce callback and cross-check against the case's
 * exp_sig, reporting ref_ok), so our bit-exactness claim is regenerable
 * from any libecc checkout with `make -C scripts/oracle kats`.
 *
 * Build: see Makefile in this directory (links against the reference's
 * libsign.a; include path points into the reference src/tests).
 */
#include <stdio.h>
#include <string.h>

/* Pull in the whole reference test-vector matrix (self-contained header:
 * includes ../libsig.h and all per-scheme *_test_vectors.h files). */
#include "ec_self_tests_core.h"

static void hexout(const unsigned char *b, unsigned int n)
{
	unsigned int i;
	for (i = 0; i < n; i++)
		printf("%02x", b[i]);
}

static void jstr(const char *k, const char *v, int comma)
{
	printf("\"%s\": \"%s\"%s", k, v, comma ? ", " : "");
}

static int dump_sig_case(const ec_test_case *c)
{
	ec_params params;
	ec_key_pair kp;
	u8 sig[EC_MAX_SIGLEN];
	u8 pub[3 * ((NN_MAX_BIT_LEN / 8) + 1)];
	u8 noncebuf[128];
	u8 qlen = 0, publen;
	const ec_sig_mapping *sm = NULL;
	const hash_mapping *hm = NULL;
	int ret, check, have_nonce = 0, ref_ok = 0, is_eddsa = 0;

	if (c == NULL || c->sig_type == UNKNOWN_ALG)
		return 0;
	ret = get_sig_by_type(c->sig_type, &sm);
	if (ret || sm == NULL) return 0;
	ret = get_hash_by_type(c->hash_type, &hm);
	if (ret || hm == NULL) return 0;
	ret = import_params(&params, c->ec_str_p);
	if (ret) return -1;
	qlen = (u8)((params.ec_gen_order_bitlen + 7) / 8);

#if defined(WITH_SIG_EDDSA25519)
	if ((c->sig_type == EDDSA25519) || (c->sig_type == EDDSA25519CTX) ||
	    (c->sig_type == EDDSA25519PH))
		is_eddsa = 1;
#endif
#if defined(WITH_SIG_EDDSA448)
	if ((c->sig_type == EDDSA448) || (c->sig_type == EDDSA448PH))
		is_eddsa = 1;
#endif
#if defined(WITH_SIG_EDDSA25519) || defined(WITH_SIG_EDDSA448)
	if (is_eddsa) {
		ret = eddsa_import_key_pair_from_priv_key_buf(&kp, c->priv_key,
				c->priv_key_len, &params, c->sig_type);
	} else
#endif
	{
		ret = ec_key_pair_import_from_priv_key_buf(&kp, &params,
				c->priv_key, c->priv_key_len, c->sig_type);
	}
	if (ret) {
		fprintf(stderr, "key import failed: %s\n", c->name);
		return -1;
	}

	/* Recompute the signature with the case's injected nonce and check
	 * it matches the case's expected signature — proves the dump is
	 * faithful to the reference's own self-test semantics. */
	memset(sig, 0, sizeof(sig));
	ret = _ec_sign(sig, c->exp_siglen, &kp, (const u8 *)c->msg, c->msglen,
		       c->nn_random, c->sig_type, c->hash_type,
		       c->adata, c->adata_len);
	if (ret == 0) {
		check = 0;
		if (are_equal(sig, c->exp_sig, c->exp_siglen, &check) == 0 && check)
			ref_ok = 1;
	}

	/* Export the fixed nonce value (if this scheme takes an external
	 * nonce): run the case's nn_random against the curve order. */
	if (c->nn_random != NULL) {
		nn nonce;
		int usable;
		ret = c->nn_random(&nonce, &(params.ec_gen_order));
		/* BIP0340's "nonce" is raw 32-byte aux data, not reduced mod q:
		 * its 4th official vector is 0xFF..FF >= q, making the callback
		 * report -1 while the value is still the intended aux bytes. */
		usable = (ret == 0);
#ifdef WITH_SIG_BIP0340
		if (c->sig_type == BIP0340)
			usable = 1;
#endif
		if (usable && qlen <= sizeof(noncebuf)) {
			if (nn_export_to_buf(noncebuf, qlen, &nonce) == 0)
				have_nonce = 1;
		}
		nn_uninit(&nonce);
	}

	publen = (u8)(3 * ((params.ec_fp.p_bitlen + 7) / 8));
	ret = ec_pub_key_export_to_buf(&(kp.pub_key), pub, publen);
	if (ret) {
		fprintf(stderr, "pub export failed: %s\n", c->name);
		return -1;
	}

	printf("{");
	jstr("name", c->name, 1);
	jstr("alg", sm->name, 1);
#ifdef USE_ISO14888_3_ECRDSA
	/* the ISO 14888-3 big-endian digest convention changes ECRDSA's
	 * signature bytes — tag these cases so the runner selects the mode */
	if (c->sig_type == ECRDSA)
		printf("\"iso14888\": true, ");
#endif
	jstr("hash", hm->name, 1);
	jstr("curve", (const char *)c->ec_str_p->name->buf, 1);
	printf("\"priv\": \"");
	hexout(c->priv_key, c->priv_key_len);
	printf("\", \"msg_hex\": \"");
	hexout((const unsigned char *)c->msg, c->msglen);
	printf("\", \"adata_hex\": ");
	if (c->adata != NULL) {
		printf("\"");
		hexout(c->adata, c->adata_len);
		printf("\"");
	} else {
		printf("null");
	}
	printf(", \"nonce\": ");
	if (have_nonce) {
		printf("\"");
		hexout(noncebuf, qlen);
		printf("\"");
	} else {
		printf("null");
	}
	printf(", \"pub\": \"");
	hexout(pub, publen);
	printf("\", \"sig\": \"");
	hexout(c->exp_sig, c->exp_siglen);
	printf("\", \"ref_ok\": %s}\n", ref_ok ? "true" : "false");
	return ref_ok ? 0 : -1;
}

static int dump_ecdh_case(const ecdh_test_case *c)
{
	const char *tname;
	if (c == NULL)
		return 0;
	switch (c->ecdh_type) {
#ifdef WITH_ECCCDH
	case ECCCDH: tname = "ECCCDH"; break;
#endif
#ifdef WITH_X25519
	case X25519: tname = "X25519"; break;
#endif
#ifdef WITH_X448
	case X448: tname = "X448"; break;
#endif
	default: return 0;
	}
	printf("{");
	jstr("name", c->name, 1);
	jstr("ecdh", tname, 1);
	printf("\"curve\": ");
	if (c->ec_str_p != NULL)
		printf("\"%s\"", (const char *)c->ec_str_p->name->buf);
	else
		printf("null");
	printf(", \"priv\": \"");
	hexout(c->our_priv_key, c->our_priv_key_len);
	printf("\", \"peer_pub\": \"");
	hexout(c->peer_pub_key, c->peer_pub_key_len);
	printf("\", \"our_pub\": \"");
	hexout(c->exp_our_pub_key, c->exp_our_pub_key_len);
	printf("\", \"shared\": \"");
	hexout(c->exp_shared_secret, c->exp_shared_secret_len);
	printf("\"}\n");
	return 0;
}

int main(int argc, char *argv[])
{
	unsigned int i;
	int bad = 0, ecdh_only = 0, sig_only = 0;

	if (argc > 1 && strcmp(argv[1], "ecdh") == 0)
		ecdh_only = 1;
	if (argc > 1 && strcmp(argv[1], "sig") == 0)
		sig_only = 1;

	if (!ecdh_only) {
		for (i = 0; i < EC_FIXED_VECTOR_NUM_TESTS; i++) {
			const ec_test_case *c = ec_fixed_vector_tests[i];
#ifdef DUMP_ONLY_ECRDSA
			/* iso-variant binary: every non-ECRDSA case is identical
			 * to the default build's dump — emit only what differs */
			if (c == NULL || c->sig_type != ECRDSA)
				continue;
#endif
			if (dump_sig_case(c) != 0)
				bad++;
		}
	}
#ifndef DUMP_ONLY_ECRDSA
	if (!sig_only) {
		for (i = 0; i < ECDH_FIXED_VECTOR_NUM_TESTS; i++) {
			if (dump_ecdh_case(ecdh_fixed_vector_tests[i]) != 0)
				bad++;
		}
	}
#endif
	if (bad) {
		fprintf(stderr, "%d cases failed reference cross-check\n", bad);
		return 1;
	}
	return 0;
}
