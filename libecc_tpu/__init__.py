"""libecc_tpu — a TPU-native elliptic-curve cryptography framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference C library (big-number + prime-field arithmetic, short-Weierstrass/
Montgomery/twisted-Edwards curves, the ECDSA/EdDSA/Schnorr/SM2/BIGN signature
families, ECDH/X25519, 20 hash functions, batch verification), built around
batched fixed-limb tensor arithmetic: a batch of field elements is a
uint32[K, N] limb tensor with the batch in the TPU lane dimension.

Throughput model: one verification is ~10^6 scalar 16x16 multiplies; the VPU
executes each limb operation across the whole lane batch, so ops/sec scales
with batch size, and across chips with `jax.sharding` over the batch axis.
"""

import os as _os

_CPU_FP = None


def _host_cpu_fingerprint() -> str:
    """Identity of the PHYSICAL CPU, read with the CPUID instruction.

    /proc/cpuinfo is NOT sufficient: on microVMs (Firecracker etc.) it is
    a fixed template that survives migration of the VM across different
    physical hosts, while XLA:CPU cache entries contain AOT-compiled
    executables whose machine features (e.g. LLVM's prefer-no-gather /
    prefer-no-scatter, set from the real CPU model) must match the
    executing host — a stale entry can SIGILL or hang at dispatch. LLVM
    derives those features from CPUID, so the raw CPUID leaves (vendor,
    brand string, family/model/stepping, feature leaves) are exactly the
    inputs that must key the cache."""
    global _CPU_FP
    if _CPU_FP is not None:
        return _CPU_FP
    import hashlib
    import platform as _platform
    words = None
    try:
        if _platform.machine() != "x86_64":
            raise OSError("no cpuid")
        import ctypes
        import struct as _st
        so = _os.path.join(_os.path.expanduser("~"), ".cache",
                           "libecc_tpu_cpuid.so")
        if not _os.path.exists(so):
            import subprocess
            src = _os.path.join(_os.path.dirname(__file__), "..",
                                "native", "cpuid_probe.c")
            _os.makedirs(_os.path.dirname(so), exist_ok=True)
            subprocess.run(["cc", "-O1", "-fPIC", "-shared", src,
                            "-o", so], check=True, capture_output=True,
                           timeout=60)
        lib = ctypes.CDLL(so)
        lib.ecc_cpuid.argtypes = [ctypes.c_uint, ctypes.c_uint,
                                  ctypes.POINTER(ctypes.c_uint * 4)]
        out = (ctypes.c_uint * 4)()
        words = []
        # vendor, family/model/stepping, feature leaves, brand string —
        # the inputs LLVM's host detection derives machine features from
        for leaf, sub in ((0, 0), (1, 0), (7, 0), (7, 1),
                          (0x80000001, 0), (0x80000002, 0),
                          (0x80000003, 0), (0x80000004, 0)):
            lib.ecc_cpuid(leaf, sub, ctypes.byref(out))
            words.extend(out)
        _CPU_FP = hashlib.sha256(
            _st.pack(f"<{len(words)}I", *words)).hexdigest()[:10]
        return _CPU_FP
    except Exception:
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            flags = ""
        _CPU_FP = hashlib.sha256(
            ("v2" + flags + _platform.machine()).encode()).hexdigest()[:10]
        return _CPU_FP


def _setup_compilation_cache():
    """Persistent XLA compilation cache: our graphs are wide (unrolled limb
    arithmetic), so compiles are expensive but highly repetitive.

    CPU-platform runs get a per-host subdirectory (platform + CPU-flags
    fingerprint): CPU executables are AOT-compiled for the exact machine,
    and loading an entry produced elsewhere (e.g. by a remote-compile
    service with different machine features) can SIGSEGV/SIGILL in the
    cache deserializer. Accelerator-platform runs share the flat dir."""
    try:
        import jax
        cache_dir = _os.environ.get(
            "LIBECC_TPU_JAX_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "libecc_tpu_jax"),
        )
        plat = _os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip()
        # the env var is NOT authoritative: a sitecustomize hook or the
        # caller may have set jax.config.jax_platforms directly (observed:
        # env=axon while the script forces the cpu backend via config —
        # CPU AOT executables then land in / load from the shared axon
        # cache dir with foreign machine features and SIGILL/SIGSEGV).
        # If EITHER source names a non-accelerator platform first, apply
        # the strict CPU rules.
        try:
            conf = (getattr(jax.config, "jax_platforms", None) or "")
            conf = conf.split(",")[0].strip()
        except Exception:
            conf = ""
        for src in (conf, plat):
            if src and src.lower() not in ("axon", "tpu"):
                plat = src
                break
        if plat and plat.lower() not in ("axon", "tpu"):
            # CPU platform: the persistent cache is DISABLED outright
            # unless explicitly opted in (LIBECC_TPU_JAX_CACHE_CPU=1).
            # Even with the per-host CPUID-fingerprint subdirectory, this
            # jaxlib's CPU AOT serialize->deserialize round trip proved
            # unsound in round 4: freshly-written entries deterministically
            # SIGSEGV the cache loader on the SAME machine (observed in
            # compilation_cache.put_executable_and_time and on subsequent
            # loads). Cold compiles are slower but deterministic.
            if _os.environ.get("LIBECC_TPU_JAX_CACHE_CPU", "0") != "1":
                return
            tag = _host_cpu_fingerprint()
            cache_dir = _os.path.join(cache_dir, f"{plat.lower()}-{tag}")
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()

__version__ = "0.1.0"
