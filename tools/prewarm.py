"""Pre-warm the repo-local persistent XLA compile cache.

Compiles (and runs once) the EXACT headline program (bench.headline_setup
— one source of truth) plus the parity-gate DDA reference, so a later
`python bench.py` or `tools/tpu_parity.py --bench` — including the
driver's end-of-round capture — skips the multi-minute XLA compiles even
in a fresh process.  Run whenever the TPU tunnel is up:

    timeout 1800 python tools/prewarm.py

The cache lives at .jax_cache/ (see bench.py run_inner) and is committed
to the repo so it survives across sessions.
"""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from bench import headline_setup
    from wavefront_tpu.render.renderer import Renderer

    scene, settings, basis, prefs = headline_setup()
    programs = [
        ("headline (bench.py + tpu_parity --bench)", settings),
        ("parity DDA reference (tpu_parity --bench)",
         dataclasses.replace(
             settings, use_column_trace=False, max_trace_steps=512,
             trace_audit=False, trace_presort=False,
         )),
    ]
    for name, s in programs:
        t0 = time.time()
        img = Renderer(s).render(scene, basis, prefs, frame_count=0)
        ok = bool(np.all(np.isfinite(img)))
        print(f"prewarm {name}: {time.time()-t0:.1f}s finite={ok}",
              flush=True)

    # the timed loop's batched program (bench.py run_inner: k frames per
    # dispatch)
    k = int(os.environ.get("BENCH_BATCH", "5"))
    t0 = time.time()
    out = Renderer(settings).render_batch(
        scene, basis, prefs, frame_count=1, k=k, as_numpy=False
    )
    ok = bool(np.all(np.isfinite(np.asarray(out[0]))))
    print(f"prewarm headline batch k={k}: {time.time()-t0:.1f}s "
          f"finite={ok}", flush=True)


if __name__ == "__main__":
    main()
