"""Examples tier: non-ECC schemes built on the NN/Fp layers, proving they
are usable standalone (reference: src/examples/ — RSA, DSA, KCDSA, SDSA,
GOST R 34.10-94, Shamir Secret Sharing, primality tooling;
README_original.md:145-156 'USER_NN_BIT_LEN' story)."""
