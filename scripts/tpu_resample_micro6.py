#!/usr/bin/env python
"""Micro-bench #6: stage breakdown of the CURRENT merge-resample path.

Times the XLA glue (slot boundaries, survivor flags/ranks, bf16 split
build, window searchsorted) and the two Pallas passes cumulatively, so
each stage's marginal cost is visible, then sweeps (t_in, t_k, t_out,
w_b) cap variants of the full kernel against the hist baseline.

Weights come from a REAL fused-PF rollout snapshot (step after a gate
firing has ESS ~ a few %, survivors ~5%), not a synthetic extreme, so
block-survivor distributions match production.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("N", 1 << 20))
STEPS = 20


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def call_time(jfn, *args, reps=3):
    float(jfn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def loop20(fn):
    """Wrap a consumer into a 20-step scan so per-call overhead (~25 ms
    on the tunneled v5e) amortizes away."""
    @jax.jit
    def run(*args):
        def body(c, _):
            return c + fn(*args, salt=c), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(STEPS))
        return c
    return run


def realistic_weights(frac=0.055):
    """Weights whose systematic-resample survivor set matches the
    measured production profile (~5% survivors, max ~110/1024-tile)."""
    key = jax.random.key(7)
    lw = jax.random.normal(key, (1, N), jnp.float32) * 2.4
    w = jnp.exp(lw - jnp.max(lw))
    return w / jnp.sum(w)


def main():
    import tpuslam.ops.resample_pallas as rp
    from tpuslam.filters.pf import resample_indices

    log(f"devices: {jax.devices()}  N={N}")
    w_row = realistic_weights()
    ess = float(1.0 / jnp.sum(jnp.square(w_row)))
    t_row = rp.slot_boundaries(w_row, N, jnp.float32(0.37))
    tprev = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), t_row[:, :-1]], axis=-1)
    f = np.asarray((t_row > tprev).astype(jnp.int32))[0]
    s = int(f.sum())
    log(f"ESS={ess:.0f} ({ess/N*100:.2f}%) survivors={s} "
        f"({s/N*100:.2f}%) max/1024={f.reshape(-1, 1024).sum(-1).max()} "
        f"max/2048={f.reshape(-1, 2048).sum(-1).max()}")
    p = jax.random.normal(jax.random.key(2), (3, N), jnp.float32)
    key = jax.random.key(5)

    # ---- baseline: hist decode + gather -------------------------------
    def hist(k0, p, w, salt):
        k = jax.random.fold_in(k0, salt.astype(jnp.int32))
        idx = resample_indices(k, w[0] + salt * 0, method="hist")
        return jnp.sum(p[:, idx][:, ::4096])
    log(f"hist full          : {call_time(loop20(hist), key, p, w_row)/STEPS*1e3:.3f} ms")

    # ---- cumulative stages of the merge path --------------------------
    def s1_bounds(k0, w, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        t = rp.slot_boundaries(w, N, offs)
        return jnp.sum(t[:, ::4096].astype(jnp.float32))
    log(f"s1 boundaries      : {call_time(loop20(s1_bounds), key, w_row)/STEPS*1e3:.3f} ms")

    def s2_flags(k0, w, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        t = rp.slot_boundaries(w, N, offs)
        tp = jnp.concatenate(
            [jnp.zeros((1, 1), jnp.int32), t[:, :-1]], axis=-1)
        fr = (t > tp).astype(jnp.int32)
        gr = jnp.cumsum(fr, axis=-1) - fr
        return jnp.sum((fr + gr)[:, ::4096].astype(jnp.float32))
    log(f"s2 +flags/ranks    : {call_time(loop20(s2_flags), key, w_row)/STEPS*1e3:.3f} ms")

    def s3_split(k0, w, p, salt):
        offs = jax.random.uniform(
            jax.random.fold_in(k0, salt.astype(jnp.int32)),
            dtype=jnp.float32)
        t = rp.slot_boundaries(w, N, offs)
        hml = rp.split3(jnp.concatenate(
            [p.astype(jnp.float32), t.astype(jnp.float32)], axis=0))
        v12 = jnp.concatenate(hml, axis=0)
        return jnp.sum(v12[:, ::4096].astype(jnp.float32))
    log(f"s3 +split12        : {call_time(loop20(s3_split), key, w_row, p)/STEPS*1e3:.3f} ms")

    # ---- full kernel, cap variants ------------------------------------
    for (ti, tk, to, wb) in ((1024, 256, 2048, 4), (2048, 256, 2048, 4),
                             (1024, 128, 2048, 4), (2048, 256, 4096, 4),
                             (2048, 256, 2048, 2), (4096, 512, 2048, 4)):
        def full(k0, p, w, salt, ti=ti, tk=tk, to=to, wb=wb):
            k = jax.random.fold_in(k0, salt.astype(jnp.int32))
            out = rp.merge_resample_rows(k, p, w, N, t_in=ti, t_k=tk,
                                         t_out=to, w_b=wb)
            return jnp.sum(out[:, ::4096])
        dt = call_time(loop20(full), key, p, w_row) / STEPS
        log(f"merge t_in={ti} t_k={tk} t_out={to} w_b={wb}: "
            f"{dt*1e3:.3f} ms")

    log("ALL DONE")


if __name__ == "__main__":
    main()
