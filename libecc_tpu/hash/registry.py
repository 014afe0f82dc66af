"""Hash registry: name -> HashAlg.

Reference: hash_mapping table + get_hash_by_type / get_hash_by_name
(src/hash/hash_algs.h:241-258, :549). Algorithms self-register; lookups are
case/punctuation-insensitive.
"""

from __future__ import annotations

from .base import HashAlg

_REGISTRY: dict[str, HashAlg] = {}


def _canon(name: str) -> str:
    return name.replace("-", "").replace("_", "").replace("/", "").upper()


def register(alg: HashAlg):
    _REGISTRY[_canon(alg.name)] = alg
    for al in alg.aliases:
        _REGISTRY[_canon(al)] = alg


def get_hash(name) -> HashAlg:
    if isinstance(name, HashAlg):
        return name
    key = _canon(name)
    if key not in _REGISTRY:
        raise KeyError(f"unknown hash {name!r}; known: {sorted(set(a.name for a in _REGISTRY.values()))}")
    return _REGISTRY[key]


def list_hashes():
    return sorted({a.name for a in _REGISTRY.values()})


def _register_builtin():
    from . import sha2
    for alg in sha2.ALGS:
        register(alg)
    try:
        from . import sha3
        for alg in sha3.ALGS:
            register(alg)
    except ImportError:
        pass
    try:
        from . import sm3
        for alg in sm3.ALGS:
            register(alg)
    except ImportError:
        pass
    try:
        from . import ripemd160
        for alg in ripemd160.ALGS:
            register(alg)
    except ImportError:
        pass
    try:
        from . import streebog
        for alg in streebog.ALGS:
            register(alg)
    except ImportError:
        pass
    try:
        from . import belt_bash
        for alg in belt_bash.ALGS:
            register(alg)
    except ImportError:
        pass
    # examples-tier legacy digests (MD2/MD4/MD5/SHA-0/SHA-1/MDC2/GOST94):
    # registered like the reference's extended hash enum for RSA/X.509
    # compatibility (src/examples/hash/hash.c HASH_MD5 etc.)
    try:
        from ..extras import legacy_hash  # noqa: F401  (self-registers)
    except ImportError:
        pass


_register_builtin()
