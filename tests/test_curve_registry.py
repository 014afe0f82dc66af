"""Known-curve registry parity: the reference's full 45-curve inventory
(src/curves/known/*.h via curves_list.h ec_maps[]) must be registered,
mathematically valid, and usable end-to-end.
"""

import pytest

from libecc_tpu.curves import params
from libecc_tpu.ref import hostref


def test_inventory_complete():
    names = set(params.list_curves())
    expected = {
        "SECP192K1", "SECP192R1", "SECP224K1", "SECP224R1", "SECP256K1",
        "SECP256R1", "SECP384R1", "SECP521R1",
        "BRAINPOOLP192R1", "BRAINPOOLP192T1", "BRAINPOOLP224R1",
        "BRAINPOOLP224T1", "BRAINPOOLP256R1", "BRAINPOOLP256T1",
        "BRAINPOOLP320R1", "BRAINPOOLP320T1", "BRAINPOOLP384R1",
        "BRAINPOOLP384T1", "BRAINPOOLP512R1", "BRAINPOOLP512T1",
        "GOST256", "GOST512",
        "GOST_R3410_2001_CRYPTOPRO_A_PARAMSET",
        "GOST_R3410_2001_CRYPTOPRO_B_PARAMSET",
        "GOST_R3410_2001_CRYPTOPRO_C_PARAMSET",
        "GOST_R3410_2001_CRYPTOPRO_XCHA_PARAMSET",
        "GOST_R3410_2001_CRYPTOPRO_XCHB_PARAMSET",
        "GOST_R3410_2001_TESTPARAMSET",
        "GOST_R3410_2012_256_PARAMSETA", "GOST_R3410_2012_256_PARAMSETB",
        "GOST_R3410_2012_256_PARAMSETC", "GOST_R3410_2012_256_PARAMSETD",
        "GOST_R3410_2012_512_PARAMSETA", "GOST_R3410_2012_512_PARAMSETB",
        "GOST_R3410_2012_512_PARAMSETC", "GOST_R3410_2012_512_PARAMSETTEST",
        "SM2P192TEST", "SM2P256TEST", "SM2P256V1",
        "BIGN256V1", "BIGN384V1", "BIGN512V1",
        "FRP256V1", "WEI25519", "WEI448",
    }
    assert expected <= names, expected - names


@pytest.mark.parametrize("name", sorted(params.list_curves()))
def test_curve_valid(name):
    """Generator on curve, prime-ish p/q sanity, and q*G == infinity
    (host oracle; the analog of the reference's import_params checks +
    check_prj_pt_order, prj_pt.c:1909)."""
    c = params.get_curve(name)
    p, q = c.fp_ctx.p_int, c.q
    ref = hostref.WCurve(p=p, a=c.a, b=c.b, gx=c.gx, gy=c.gy, q=q, h=c.h)
    assert ref.on_curve((c.gx, c.gy))
    # q (and p) must be odd primes for our Montgomery/Fermat machinery
    assert p % 2 == 1 and q % 2 == 1
    assert pow(2, p - 1, p) == 1 and pow(2, q - 1, q) == 1  # Fermat check
    assert hostref.ec_mul(ref, q, (c.gx, c.gy)) is None


def test_aliases():
    assert params.get_curve("P-256").name == "SECP256R1"
    assert params.get_curve("prime256v1").name == "SECP256R1"
    assert params.get_curve("brainpoolp256r1").name == "BRAINPOOLP256R1"


def test_transfer_coefficients():
    """WEI25519 carries the Montgomery/Edwards transfer constants used by
    the reference's isogeny machinery (ec_params_wei25519.h)."""
    c = params.get_curve("WEI25519")
    assert c.alpha_montgomery != 0
    assert c.alpha_edwards != 0


def test_unknown_curve():
    with pytest.raises(KeyError):
        params.get_curve("NOT_A_CURVE")
