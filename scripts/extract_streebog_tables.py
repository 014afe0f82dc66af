"""Extract the standard GOST R 34.11-2012 (Streebog) precomputed LPS tables
and round constants into a binary .npz consumed by libecc_tpu.hash.streebog.

These are public standard constants (the combined S-box pi + linear
transform L tables that every table-driven Streebog implementation ships;
defined by the GOST standard / RFC 6986). Source parsed: a C header laying
out `C_STREEBOG[12][8]` and `PI[8][256]` as u64 initializers (e.g. the
libecc reference's src/hash/streebog.h).

Usage: python scripts/extract_streebog_tables.py <path/to/streebog.h>
Writes libecc_tpu/hash/_streebog_tables.npz.
"""

import re
import sys
import os

import numpy as np


def main(path):
    text = open(path).read()
    # All u64 hex literals in file order: first 12*8 are C_STREEBOG,
    # next 8*256 are PI.
    start_c = text.index("C_STREEBOG")
    lits = re.findall(r"0x[0-9a-fA-F]{1,16}", text[start_c:])
    vals = [int(x, 16) for x in lits]
    need = 12 * 8 + 8 * 256
    assert len(vals) >= need, f"found {len(vals)} literals, need {need}"
    c = np.array(vals[: 12 * 8], dtype=np.uint64).reshape(12, 8)
    pi = np.array(vals[12 * 8: need], dtype=np.uint64).reshape(8, 256)
    out = os.path.join(os.path.dirname(__file__), "..", "libecc_tpu",
                       "hash", "_streebog_tables.npz")
    np.savez_compressed(out, C=c, PI=pi)
    print(f"wrote {out}: C{c.shape} PI{pi.shape}")


if __name__ == "__main__":
    main(sys.argv[1])
