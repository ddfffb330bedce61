"""Host-keyed JAX compile-cache directories.

XLA:CPU AOT executables are machine-code artifacts: loading an entry
compiled under a different CPU feature profile emits "Target machine
feature ... is not supported on the host machine ... could lead to
execution errors such as SIGILL" and can segfault inside
backend_compile_and_load (observed once in CI on this repo's shared
cache).  Keying the cache directory by the host's CPU flag set makes a
different machine rebuild instead of loading incompatible blobs.

Pure stdlib — safe to import before jax.
"""
import hashlib
import os
import platform


def host_cache_dir(base):
    """Return (and create) a per-host-CPU subdirectory of ``base``."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        pass
    if not flags:
        flags = f"{platform.machine()}-{platform.processor()}"
    fp = hashlib.sha1(flags.encode()).hexdigest()[:10]
    d = os.path.join(base, fp)
    os.makedirs(d, exist_ok=True)
    return d
