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
        if plat and plat.lower() not in ("axon", "tpu"):
            import hashlib
            try:
                with open("/proc/cpuinfo") as f:
                    flags = next((l for l in f if l.startswith("flags")), "")
            except OSError:
                flags = ""
            import platform as _platform
            tag = hashlib.sha256(
                (flags + _platform.machine()).encode()).hexdigest()[:10]
            cache_dir = _os.path.join(cache_dir, f"{plat.lower()}-{tag}")
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()

__version__ = "0.1.0"
