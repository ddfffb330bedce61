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

# NO persistent compile cache for the suite.  It was tried (host-CPU-keyed
# dir) and removed: jax's cache-READ path segfaulted
# xdist workers while deserializing XLA:CPU AOT executables on the very
# host that wrote them (r5, twice: faulthandler stack ends in
# compilation_cache.get_executable_and_time -> compiler._cache_read, with
# cpu_aot_loader "+prefer-no-scatter ... not supported on the host
# machine" warnings).  Cold-compiling every run (~27 min on the 2-core
# host) is slower but has been green end-to-end; a crashed worker fails
# the whole suite.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already captured — override the live config too.
import jax

jax.config.update("jax_platforms", "cpu")
