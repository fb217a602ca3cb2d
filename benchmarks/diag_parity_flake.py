"""Root-cause probe for the executed-reference weights-parity flake.

VERDICT r4 weak #1: tests/test_reference_parity.py::test_weights_after_steps_parity
failed in the judge's FULL-suite run (gen up2_bn/bias mean residual 3.77e-4
vs the 3.5e-4 bound) yet passed SOLO at the same commit. Both sides of the
comparison are candidate nondeterminism sources:

  (a) the TF reference worker (already single-threaded since round 3 — one
      thread = one reduction order);
  (b) OUR jitted 3-step run on XLA:CPU, whose intra-op Eigen thread pool
      could split reductions load-dependently;
  (c) the comparison environment (none: pure numpy).

This script measures each in isolation, with and without a competing CPU
hog (the full-suite condition on this 1-core host):

  1. run the reference worker twice -> max |post-step weight delta|;
  2. run our fused 3-step program twice in ONE process -> bitwise delta;
  3. run it again in TWO fresh processes, one of them next to a CPU hog
     -> delta vs the in-process result.

Verdict from 2026-08-20 run (recorded in the test's docstring): see stdout.

Usage: python benchmarks/diag_parity_flake.py  (CPU backend, ~6 min)
"""

from __future__ import annotations

import json
import multiprocessing
import os
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORKER = REPO / "tests" / "_reference_worker.py"
REF = "/root/reference/sndcgan"

RUN_OURS = """
import sys, json
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from imagegeneration_tpu.compat.keras_import import (
    import_sndcgan_discriminator, import_sndcgan_generator)
from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
from imagegeneration_tpu.train.sndcgan_step import (
    SNDCGANTrainConfig, init_state, make_train_step)

art = __ART__
a = np.load(art + "/arrays.npz")
cfg = SNDCGANConfig(image_size=(48, 80, 3), dropout_rate=0.0,
                    quirk_eval_bn=True, dtype=jnp.float32)
tcfg = SNDCGANTrainConfig(model=cfg, batch_size=4, loss="bce",
                          dropout_impl="threefry")
g = import_sndcgan_generator(art + "/gen_init.h5")
d = import_sndcgan_discriminator(art + "/disc_init.h5")
step = jax.jit(make_train_step(tcfg))

def run():
    state = init_state(tcfg)
    state = state.replace(g_params=g["params"], g_batch_stats=g["batch_stats"],
                          d_params=d["params"])
    for s in range(3):
        state, _ = step(state, jnp.asarray(a["real_u8"]),
                        jnp.asarray(a["z_steps"][s]))
    return jax.device_get((state.g_params, state.d_params))

r1, r2 = run(), run()
d12 = max(float(np.max(np.abs(x - y)))
          for x, y in zip(jax.tree.leaves(r1), jax.tree.leaves(r2)))
flat = [np.asarray(x).ravel() for x in jax.tree.leaves(r1)]
print("OURS " + json.dumps({
    "inproc_repeat_maxdelta": d12,
    "digest": float(np.sum([np.abs(f).sum() for f in flat])),
    "concat_head": [float(v) for v in np.concatenate(flat)[:8]],
}), flush=True)
"""


def run_worker(out: pathlib.Path) -> None:
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1", TF_CPP_MIN_LOG_LEVEL="2",
               JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, str(WORKER), REF, str(out)], env=env, check=True,
        capture_output=True, text=True, timeout=560,
    )


def load_after(out: pathlib.Path):
    sys.path.insert(0, str(REPO))
    from imagegeneration_tpu.compat.keras_import import (
        import_sndcgan_discriminator,
        import_sndcgan_generator,
    )
    import jax

    g = import_sndcgan_generator(out / "gen_after.h5")["params"]
    d = import_sndcgan_discriminator(out / "disc_after.h5")["params"]
    return jax.tree.leaves((g, d))


def _hog(stop):
    x = 1.0
    while not stop.is_set():
        x = x * 1.0000001 + 1e-9


def run_ours_subprocess(art: pathlib.Path, with_hog: bool) -> dict:
    code = RUN_OURS.replace("__REPO__", repr(str(REPO))).replace(
        "__ART__", repr(str(art)))
    stop = multiprocessing.Event()
    hogs = []
    if with_hog:
        for _ in range(2):
            p = multiprocessing.Process(target=_hog, args=(stop,), daemon=True)
            p.start()
            hogs.append(p)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=900, env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
    finally:
        stop.set()
        for p in hogs:
            p.join(timeout=5)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("OURS ")][-1]
    return json.loads(line[5:])


def main() -> None:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="parity_flake_"))
    w1, w2 = tmp / "w1", tmp / "w2"
    print("running reference worker twice ...", flush=True)
    run_worker(w1)
    run_worker(w2)
    l1, l2 = load_after(w1), load_after(w2)
    wdelta = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                 for a, b in zip(l1, l2))
    print(f"[1] reference-worker repeat: max |post-step weight delta| = {wdelta:.3e}")

    print("running our 3-step program (quiet) ...", flush=True)
    quiet = run_ours_subprocess(w1, with_hog=False)
    print(f"[2] ours, in-process repeat (quiet): max delta = "
          f"{quiet['inproc_repeat_maxdelta']:.3e}")
    print("running our 3-step program (2 CPU hogs) ...", flush=True)
    loaded = run_ours_subprocess(w1, with_hog=True)
    print(f"[3] ours, in-process repeat (loaded): max delta = "
          f"{loaded['inproc_repeat_maxdelta']:.3e}")
    cross = abs(quiet["digest"] - loaded["digest"])
    head = np.max(np.abs(np.asarray(quiet["concat_head"])
                         - np.asarray(loaded["concat_head"])))
    print(f"[4] ours, quiet-vs-loaded process: |digest delta| = {cross:.3e}, "
          f"head max delta = {head:.3e}")
    print(json.dumps({"worker_repeat": wdelta,
                      "ours_quiet": quiet["inproc_repeat_maxdelta"],
                      "ours_loaded": loaded["inproc_repeat_maxdelta"],
                      "ours_cross_process_digest": cross}))


if __name__ == "__main__":
    main()
