"""Test configuration: run JAX on a virtual 8-device CPU mesh with f64 enabled.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); real-TPU execution is exercised by
bench.py and the driver's compile checks instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: the persistent compilation cache is intentionally NOT enabled here.
# This jaxlib's cache writer (compilation_cache.put_executable_and_time ->
# zstandard) segfaults when cache files are corrupted or written concurrently
# by two pytest processes, killing the whole suite.  Opt back in explicitly:
if os.environ.get("RACTIP_TPU_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["RACTIP_TPU_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# ---------------------------------------------------------------------------
# Per-file process isolation for multi-file runs.
#
# This image's jaxlib has a deterministic memory-corruption bug in the XLA:CPU
# compile path: after the compilations done by tests/test_accessibility.py +
# tests/test_batched.py, the next large compile (ops.cofold's while_loop) dies
# inside backend_compile_and_load with SIGSEGV/SIGABRT.  It reproduces with
# the thunk runtime disabled, with XLA optimizations disabled, and with an
# unlimited stack; each file passes in a fresh process.  Until the jaxlib bug
# is fixed, a full-suite invocation (`pytest tests/ -x -q`) shards itself one
# subprocess per test file; single-file invocations run in-process as usual.
# Opt out with RACTIP_TPU_NO_SHARD=1.
# ---------------------------------------------------------------------------


def pytest_runtestloop(session):
    if os.environ.get("_RACTIP_TPU_SUITE_CHILD") \
            or os.environ.get("RACTIP_TPU_NO_SHARD"):
        return None
    if getattr(session.config.option, "collectonly", False):
        return None
    if any("::" in a for a in session.config.args):
        return None  # node-id-filtered run: don't expand to whole files
    files: list[str] = []
    for item in session.items:
        f = str(item.fspath)
        if f not in files:
            files.append(f)
    if len(files) <= 1:
        return None

    import subprocess
    # pytest's -x stores into dest "maxfail" (value 1), not "exitfirst"
    xfirst = session.config.getoption("maxfail", default=0) == 1
    env = {**os.environ, "_RACTIP_TPU_SUITE_CHILD": "1"}
    # the same jaxlib XLA:CPU bug occasionally HANGS a compile instead of
    # crashing it (seen on test_contraduplex, untouched code, 40+ min at 99%
    # CPU); bound each file and retry once in a fresh process before failing
    file_timeout = int(os.environ.get("RACTIP_TPU_FILE_TIMEOUT", "1800"))
    failed = []
    markexpr = session.config.getoption("-m", default="") or ""
    keyword = session.config.getoption("-k", default="") or ""
    for f in files:
        args = [sys.executable, "-m", "pytest", f, "-q"]
        if markexpr:
            args += ["-m", markexpr]   # keep e.g. the `-m smoke` fast tier
        if keyword:
            args += ["-k", keyword]
        if xfirst:
            args.append("-x")
        rc = None
        for attempt in range(2):
            try:
                rc = subprocess.call(args, env=env, timeout=file_timeout)
                break
            except subprocess.TimeoutExpired:
                print(f"\n[conftest shard] {Path(f).name} timed out after "
                      f"{file_timeout}s (attempt {attempt + 1}); "
                      f"{'retrying in a fresh process' if attempt == 0 else 'marking failed'}")
                rc = 124
        if rc != 0:
            failed.append((f, rc))
            if xfirst:
                break
    if failed:
        session.testsfailed = len(failed)
        names = ", ".join(Path(f).name for f, _ in failed)
        print(f"\n[conftest shard] failing files: {names}")
    return True  # skip the in-process loop

