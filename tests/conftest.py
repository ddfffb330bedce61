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

# XLA:CPU's LLVM passes recurse deeply on the big SPMD/engine modules and
# intermittently segfault (backend_compile_and_load) late in a long run —
# classic stack headroom, and the compiles run on POSIX THREADS: glibc
# sizes a new thread's stack at the soft RLIMIT_STACK, EXCEPT when the
# limit is unlimited, which falls back to the 8 MB default.  So the cap
# must be raised to a large FINITE value (r5: an earlier RLIM_INFINITY
# version still crashed a worker inside an LLVM compile).
try:
    import resource

    _want = 512 * 1024 * 1024
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    if _hard != resource.RLIM_INFINITY:
        _want = min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
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

# ---------------------------------------------------------------------------
# Self-healing for the XLA:CPU compile segfault (see the RLIMIT_STACK note
# above — the crash is environmental, intermittent, and strikes BIG module
# compiles late in a worker's life; the same compile always passes in a
# young process).  When an xdist worker segfaults, dsession already
# replaces the worker AND loadscope.remove_node() re-queues the crashed
# file's incomplete tests onto the replacement — so the test RERUNS on a
# fresh process.  The only thing that turned those crashes into red suites
# was the phantom "failed" TestReport that handle_crashitem() emits for
# the in-flight test.  Mark that report "rerun" (a non-failed outcome, so
# maxfail/-x doesn't trip) and let the rescheduled execution report the
# real result.  Capped per-test so a test that genuinely segfaults every
# time still fails the suite.
_CRASH_RERUNS: dict = {}
_MAX_CRASH_RERUNS = 2


def pytest_handlecrashitem(crashitem, report, sched):
    n = _CRASH_RERUNS.get(crashitem, 0)
    if n < _MAX_CRASH_RERUNS:
        _CRASH_RERUNS[crashitem] = n + 1
        report.outcome = "rerun"


def pytest_report_teststatus(report, config):
    if getattr(report, "outcome", None) == "rerun":
        return "rerun", "R", ("RERUN", {"yellow": True})
