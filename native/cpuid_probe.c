/* Tiny baseline-ISA CPUID probe for the per-host compilation-cache key.
 *
 * Why this exists: on microVM fleets /proc/cpuinfo is a fixed template
 * that survives migration of the VM image across different physical
 * hosts, but XLA:CPU (and our -march=native host runtime) AOT-compile
 * for the REAL CPU, whose identity LLVM reads with the CPUID
 * instruction. Loading a cache entry produced on a different physical
 * CPU can SIGILL or hang. This probe exposes the same raw CPUID leaves
 * so the Python side can key caches on the true machine.
 *
 * Compiled WITHOUT -march=native (baseline ISA only), so a stale copy of
 * this .so is always safe to execute on any x86-64 host.
 */
#if defined(__x86_64__) || defined(__i386__)
#include <cpuid.h>

void ecc_cpuid(unsigned leaf, unsigned sub, unsigned out[4]) {
    unsigned a = 0, b = 0, c = 0, d = 0;
    __cpuid_count(leaf, sub, a, b, c, d);
    out[0] = a; out[1] = b; out[2] = c; out[3] = d;
}
#else
void ecc_cpuid(unsigned leaf, unsigned sub, unsigned out[4]) {
    out[0] = out[1] = out[2] = out[3] = 0;
    (void)leaf; (void)sub;
}
#endif
