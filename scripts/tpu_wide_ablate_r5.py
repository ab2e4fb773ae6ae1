#!/usr/bin/env python
"""Round-5 wide-PF firing-path stage attribution (VERDICT r4 item 3).

STATUS r4 left the 1024x10k wide path at 1.30e9 p-steps/s with a claimed
~1.45e9 structural ceiling, attributing the 1.75x per-resampled-particle
premium (vs the single-filter merge) to "slot gather/quantize glue and
pass C's fused merge selects" WITHOUT a per-stage table.  This script
produces that table via ``pf_batch_wide_step(_rs_stop=...)`` truncations
(same production code path up to the cut, un-resampled output with a live
dependence on the stage result):

  stop=transpose   packed->flat XLA transposes of the full carry
  stop=prologue    + fids weight-row gather, exp, quantize, row cumsum
  stop=passA       + pass A compact kernel
  stop=skip        + skip table build
  (full)           + pass B expand + fused pass C merge selects

Run with an always-firing gate (ess_threshold_frac > 1) so every step
pays the full firing path at a fixed burst (= B, the full-cap tier), and
with the default gate for the production mean.  The truncated variants
leave weights degenerate, which under the default gate changes firing
dynamics - attribution runs use always-fire only.

Usage: python scripts/tpu_wide_ablate_r5.py [stage ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("PF_B", 1024))
N = int(os.environ.get("PF_N", 10_000))
STEPS = int(os.environ.get("PF_STEPS", 100))
CALL_MS = 25.0


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *a, reps=3):
    float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(name, b=B, ess_frac=None, cap_tier=None, r_std=None, **kw):
    from tpuslam.filters import PfConfig
    from tpuslam.ops import pf_batch_wide_rollout

    cfg_kw = {}
    if ess_frac is not None:
        cfg_kw["ess_threshold_frac"] = ess_frac
    if r_std is not None:
        cfg_kw["r_std"] = r_std
    cfg = PfConfig(num_particles=N, weight_mode="log", **cfg_kw)
    if cap_tier is not None:
        kw["fire_cap"] = cap_tier
        kw["fire_cap_small"] = cap_tier

    @jax.jit
    def roll(key):
        final, outs = pf_batch_wide_rollout(cfg, key, batch=b,
                                            n_steps=STEPS, **kw)
        return (jnp.sum(final.particles) * 1e-20
                + jnp.sum(outs.resampled.astype(jnp.float32)))

    dt = timed(roll, jax.random.key(0))
    ms = dt * 1e3 / STEPS
    true_ms = (dt * 1e3 - CALL_MS) / STEPS
    rate = b * N * STEPS / dt
    log(f"{name:34s}: {ms:7.3f} ms/step ({true_ms:7.3f} true) "
        f"= {rate:.3e} p-steps/s")
    return true_ms


def ladder(b):
    """Stage ladder at batch=b, always-fire at cap=b (burst == cap, so
    per-resampled-particle numbers are exact for that tier)."""
    t = {}
    t["base"] = bench(f"B={b} no-fire control", b=b, ess_frac=1e-9)
    for st in ("transpose", "prologue", "passA", "skip", ""):
        nm = st if st else "full(B+C)"
        t[nm] = bench(f"B={b} always-fire stop={nm}", b=b,
                      ess_frac=2.0, cap_tier=b, _rs_stop=st)
    prev, base = t["base"], t["base"]
    for nm in ("transpose", "prologue", "passA", "skip", "full(B+C)"):
        d, cum = t[nm] - prev, t[nm] - base
        log(f"   stage {nm:12s}: +{d:7.3f} ms (cum firing "
            f"{cum:7.3f} ms = {cum / (b * N / 1e6):5.2f} ms/M resampled)")
        prev = t[nm]


def degen(b):
    """Pass B+C cost at the kernel tier: always-fire with a SHARP
    likelihood (r_std 0.05) keeps post-reset weights degenerate enough
    that survivor counts stay under the caps (healthy always-fire
    weights overflow t_k and the 'full' stage measures the XLA fallback
    instead - see the r5 log)."""
    kw = dict(b=b, ess_frac=2.0, cap_tier=b, r_std=(0.05, 0.05))
    t_skip = bench(f"B={b} degen stop=skip", _rs_stop="skip", **kw)
    t_full = bench(f"B={b} degen full", **kw)
    log(f"   B={b}: pass B+C = {t_full - t_skip:.3f} ms = "
        f"{(t_full - t_skip) / (b * N / 1e6):.2f} ms/M resampled")


def main():
    log(f"devices: {jax.devices()}  B={B} N={N} steps={STEPS}")
    args = sys.argv[1:] or ["prod", "nofire", "stages", "stages256",
                            "degen"]

    if "prod" in args:
        bench("production, default gate")
    if "nofire" in args:
        bench("no-fire floor (gate off)", ess_frac=1e-9)
    if "stages" in args:
        ladder(B)
    if "stages256" in args:
        # The cap_small-tier regime: 256 filters at cap 256 (the tier
        # the typical default-gate burst of ~215 pays); its own control
        # normalizes the smaller pass-C floor.
        ladder(256)
    if "degen" in args:
        degen(1024)
        degen(256)


if __name__ == "__main__":
    main()
