"""Persistent-compilation-cache setup shared by every entry point.

The TPU behind the axon tunnel compiles slowly (~20-40 s per program),
so all drivers/benches/tests use jax's persistent cache.  One hazard:
XLA:CPU entries are AOT artifacts compiled for the *build machine's*
LLVM feature set, and this workspace migrates across heterogeneous
hosts — loading a foreign CPU artifact ranges from E-log noise
("machine features don't match") to a hard CHECK abort inside
deserialization, which killed a full pytest run.  /proc/cpuinfo *flags*
alone proved insufficient as a discriminator (two hosts with identical
flag sets still aborted), so CPU cache dirs are keyed by flags + model
name, and TPU runs keep one shared dir (TPU executables are serialized
for the device, not the host).
"""

import hashlib
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def host_fingerprint() -> str:
    """Short digest of the host CPU identity (model name + flags)."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) == 2:
                        break
    except OSError:
        import platform
        parts = [platform.processor() or "unknown", platform.machine()]
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def setup(cpu: bool = None, min_compile_secs: float = 5.0) -> str:
    """Point jax's persistent cache at the right directory.

    ``cpu=None`` sniffs JAX_PLATFORMS (the driver's dryrun and the test
    suite force the CPU backend through it or through jax.config before
    any compile).  Returns the chosen directory ("" = cache disabled).

    XLA:CPU AOT serialization proved unstable on this image even
    same-host (segfault inside put_executable_and_time at cache-write,
    abort inside get_executable_and_time at cache-read), so CPU runs
    DISABLE the persistent cache unless MPMA_CPU_CACHE=1 opts back in
    for local iteration; TPU executables serialize fine and keep the
    shared dir (the tunnel's ~20-40 s remote compiles need it)."""
    import jax

    if cpu is None:
        plats = os.environ.get("JAX_PLATFORMS", "")
        try:
            plats = plats or (jax.config.jax_platforms or "")
        except AttributeError:
            pass
        cpu = "cpu" in plats
    if cpu:
        if not os.environ.get("MPMA_CPU_CACHE"):
            jax.config.update("jax_enable_compilation_cache", False)
            return ""
        path = os.path.join(_REPO_ROOT,
                            f".jax_cache_cpu_{host_fingerprint()}")
    else:
        path = os.path.join(_REPO_ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
