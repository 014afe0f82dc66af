"""Runtime configuration (the analog of the reference's compile-time
lib_ecc_config.h toggles — here a handful of runtime switches; algorithm
enablement is registry contents, SURVEY §7.8).

Environment variables:
  LIBECC_TPU_PALLAS=0|1   force-disable/enable the fused Pallas kernels
                          (default: auto — enabled on TPU backends for
                          batch shapes the kernels support)
  LIBECC_TPU_MEGAMUL=0|1  force-disable/enable the whole-scalar-mult
                          Pallas mega-kernel (ops/pallas/megamul.py);
                          default follows LIBECC_TPU_PALLAS
  LIBECC_TPU_NO_NATIVE=1  disable the native C++ host runtime
  LIBECC_TPU_ECRDSA_ISO14888=1  default EC-RDSA digest convention to the
                          ISO 14888-3 big-endian import (the reference's
                          USE_ISO14888_3_ECRDSA build mode,
                          common.mk:262-265); per-call kwarg overrides
"""

from __future__ import annotations

import os

_PALLAS_CACHE: bool | None = None


def use_megamul() -> bool:
    """Whether the whole-scalar-mult mega-kernel may be dispatched."""
    env = os.environ.get("LIBECC_TPU_MEGAMUL")
    if env is not None:
        return env not in ("0", "false", "")
    return use_pallas()


def use_pallas() -> bool:
    """Whether fused Pallas TPU kernels should be used (shape permitting)."""
    global _PALLAS_CACHE
    env = os.environ.get("LIBECC_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    if _PALLAS_CACHE is None:
        import jax
        _PALLAS_CACHE = jax.default_backend() not in ("cpu",)
    return _PALLAS_CACHE
