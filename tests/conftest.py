"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

The reference verifies multi-GPU behavior only by running real 4-GPU DDP
(reference README.md:129-135); we instead simulate an 8-device mesh on CPU so
every sharding/collective path is exercised in CI without TPU hardware.
"""
import os

# force-override: the container exports JAX_PLATFORMS=axon (live TPU tunnel);
# unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA:CPU's LLVM passes recurse deeply on the big SPMD training modules;
# with the default 8 MB stack the FIRST train-step compile late in a long
# suite run segfaulted intermittently (backend_compile_and_load) while the
# same compile passes in isolation — classic stack headroom.  Main-thread
# stacks grow on demand up to RLIMIT_STACK, so lift the cap.
try:
    import resource

    resource.setrlimit(resource.RLIMIT_STACK,
                       (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except Exception:
    pass

# persistent XLA compile cache: the suite is compile-dominated (dozens of
# jitted programs), so re-runs drop from ~15 min to the few minutes of
# actual execution once the cache is warm.  Keyed per host CPU profile —
# XLA:CPU AOT entries from a different machine can SIGILL/segfault on
# load (droid_slam_reserch_tpu/utils/cachedir.py).  Loaded by file path
# so the package (and with it jax) is not imported before the env setup.
import importlib.util

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "_droid_cachedir",
    os.path.join(_repo, "droid_slam_reserch_tpu", "utils", "cachedir.py"),
)
_cachedir = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cachedir)
_cache = _cachedir.host_cache_dir(os.path.join(_repo, ".jax_cache_tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already captured — override the live config too.
# (Same for the compile cache: the env vars above are read at import time,
# which already happened, so set the live config explicitly or the cache
# silently stays disabled and every suite run recompiles everything.)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
