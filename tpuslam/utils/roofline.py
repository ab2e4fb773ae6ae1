"""Roofline / MFU accounting for the bench harness.

The reference publishes no performance numbers (SURVEY.md section 6), so
"is it fast?" needs a hardware denominator: this module holds one TPU
v5e chip's peak envelope plus per-kernel-family analytic cost models
(op slots / HBM bytes / MXU flops per unit of work, hand-counted from
the kernel sources and documented inline), and renders a one-line bound
analysis per benchmark for bench.py's stderr.

Peaks are published v5e figures (datasheet / jax-ml scaling-book
values); the VPU figure is derived from the architecture (8x128 vreg
lanes x 4 ALUs x ~940 MHz ~= 3.9e12 op-slots/s; an FMA occupies one
slot).  Transcendentals are counted by the POLYNOMIAL cost of
ops/fastmath.py (sincos pair ~= 20 slots, log ~= 15, sqrt ~= 8,
exp ~= 10) since that is what the kernels execute.

The verdict per line is the binding resource at the measured rate:
whichever of VPU / HBM / MXU has the highest utilization — or, when all
are low, the sequential-dependency bound (scan/loop steps x per-step
latency), which is the real ceiling of the long-trajectory solvers.
"""

from __future__ import annotations

import dataclasses

#: One v5e chip. MXU: 197 TFLOP/s bf16 (f32-accumulate); full-f32
#: operand matmuls run at ~1/4 of that.  HBM: 16 GiB @ 819 GB/s.
VPU_SLOTS = 3.9e12  # op-slots/s (8x128 lanes x 4 ALUs x 0.94 GHz)
MXU_FLOPS_BF16 = 1.97e14
MXU_FLOPS_F32 = 4.9e13
HBM_BYTES = 8.19e11

#: Measured platform constants (CLAUDE.md; scripts/tpu_resample_micro*):
#: ~25 ms per jit call through the tunnel, ~0.14 ms per scan iteration
#: when iterations dispatch separate ops.
SCAN_STEP_LATENCY = 1.4e-4
JIT_CALL_LATENCY = 2.5e-2

# Polynomial transcendental costs in VPU slots (ops/fastmath.py).
SINCOS = 20.0  # quadrant fold + two odd/even polys, BOTH values
LOG = 15.0
SQRT = 8.0
EXP = 10.0
#: One Box-Muller normal PAIR: 2 prng_random_bits + u-conversion (~6)
#: + log + sqrt + sincos.
BOX_MULLER_PAIR = 6.0 + LOG + SQRT + SINCOS


@dataclasses.dataclass(frozen=True)
class KernelModel:
    """Analytic per-unit cost of one kernel family.

    ``vpu_slots``/``hbm_bytes``/``mxu_f32`` are per UNIT of work (one
    rollout-step, one particle-step, one pose); ``seq_steps_per_unit``
    counts sequential scan/loop iterations that cannot overlap across
    units (the depth bound of the banded solvers).
    """

    name: str
    vpu_slots: float = 0.0
    hbm_bytes: float = 0.0
    mxu_f32: float = 0.0
    seq_steps_per_unit: float = 0.0
    note: str = ""

    def analyze(self, rate: float) -> str:
        """Render the bound analysis at a measured ``rate`` units/s."""
        parts = []
        fracs = {}
        if self.vpu_slots:
            f = rate * self.vpu_slots / VPU_SLOTS
            fracs["VPU"] = f
            parts.append(f"{rate * self.vpu_slots:.2e} slots/s "
                         f"({100 * f:.0f}% VPU)")
        if self.hbm_bytes:
            f = rate * self.hbm_bytes / HBM_BYTES
            fracs["HBM"] = f
            parts.append(f"{rate * self.hbm_bytes / 1e9:.1f} GB/s "
                         f"({100 * f:.0f}% HBM)")
        if self.mxu_f32:
            f = rate * self.mxu_f32 / MXU_FLOPS_F32
            fracs["MXU"] = f
            parts.append(f"{rate * self.mxu_f32:.2e} FLOP/s "
                         f"({100 * f:.0f}% MXU f32)")
        bound, frac = max(fracs.items(), key=lambda kv: kv[1]) \
            if fracs else ("?", 0.0)
        if frac >= 0.33:
            verdict = f"{bound}-bound"
        elif self.seq_steps_per_unit:
            # All resource utilizations low: the sequential dependency
            # chain is the ceiling.
            verdict = (f"depth-bound (~{rate * self.seq_steps_per_unit:.0f}"
                       " seq steps/s)")
        else:
            verdict = f"latency/dependency-bound (top resource: {bound} " \
                      f"{100 * frac:.0f}%)"
        txt = f"#   roofline[{self.name}]: " + ", ".join(parts) \
            + f" -> {verdict}"
        if self.note:
            txt += f" ({self.note})"
        return txt


# ---------------------------------------------------------------------------
# Per-family models.  Slot counts are hand-tallied from the kernel
# bodies (an FMA = 1 slot; transcendental polys per the constants
# above); they are ESTIMATES for bound attribution, good to ~20%.

#: ops/ekf_pallas.py::_ekf_kernel per rollout-step (noise on):
#: 3 Box-Muller pairs (6 normals) + 2 poly sincos (dead-reckon +
#: predict) + ~150 FMA/add slots of 3x3 covariance/gain algebra
#: (lines 108-197).  Carries live in vregs/VMEM across the whole
#: rollout: HBM traffic is one state+cov+err write per ROLLOUT
#: (~68 B / n_steps ~ 0.2 B per step).
EKF_FUSED = KernelModel(
    name="ekf_fused",
    vpu_slots=3 * BOX_MULLER_PAIR + 2 * SINCOS + 150.0,
    hbm_bytes=0.2,
    note="state resident in vregs; HBM ~0")

#: ops/pf_pallas.py fused PF step per particle-step: 2 Box-Muller pairs
#: (3 predict normals), predict sincos, likelihood = 5 landmarks x
#: (world2robot rotate 4 FMA + diff 2 + quadratic form 5) + yaw sincos
#: + exp/log-weight update (~log-space: 1 exp-equivalent) + comb/
#: interval decode amortized.  HBM per step: particle state (3 f32)
#: + weight row read+write = 32 B.
PF_FUSED = KernelModel(
    name="pf_fused",
    vpu_slots=2 * BOX_MULLER_PAIR + 2 * SINCOS + 5 * 11 + EXP + 30.0,
    hbm_bytes=32.0,
    note="transcendental chain per step limits ILP")

#: Batched one-filter-per-tile PF: same per-particle math as PF_FUSED
#: plus the in-tile interval-decode matmul (MXU) and the ~0.5 us
#: per-grid-cell fixed cost (one cell per filter).
PF_BATCH = KernelModel(
    name="pf_batch",
    vpu_slots=2 * BOX_MULLER_PAIR + 2 * SINCOS + 5 * 11 + EXP + 40.0,
    hbm_bytes=32.0,
    note="in-tile resample + per-filter noise streams floor, see STATUS.md r5")

#: Wide (multi-tile-per-filter) batched PF: per-particle math as above;
#: firing steps additionally pay pass A/B + packed<->flat transposes
#: (~14 ms/firing step at 1024x10k, STATUS.md — the known bottleneck).
PF_WIDE = dataclasses.replace(
    PF_BATCH, name="pf_wide",
    note="firing path ~2.1 ms/M resampled, kernel-work-bound (STATUS.md r5 table)")

#: Two-pass Pallas merge resample, per particle per FIRING step: pass A
#: reads weights + writes compacted survivors (~2 values), pass C
#: expands (one read + one write of 3-f32 state + weight).
RESAMPLE_MERGE = KernelModel(
    name="resample_merge",
    vpu_slots=25.0,
    hbm_bytes=48.0,
    note="bytes-bound by design: compaction is the point")

#: Flat super-block tridiagonal Thomas per POSE (band W, super size S):
#: factor ~4*(3S)^3/S MXU f32 flops/pose (Cholesky + triangular inverse
#: + 3 dense (3S)^2x(3S) matmuls per S-pose block), stacked
#: invs/ws/up HBM traffic ~3*(3S)^2*4/S bytes/pose each way, and the
#: REAL ceiling: 2*T/S sequential scan steps (fwd + bwd).
def tridiag_model(band: int, super_size: int | None = None) -> KernelModel:
    s = super_size or max(band, 1)
    m = 3 * s
    return KernelModel(
        name=f"tridiag(S={s})",
        mxu_f32=4.0 * m ** 3 / s,
        hbm_bytes=3 * m * m * 4.0 * 2 / s,
        seq_steps_per_unit=2.0 / s,
        note="sequential block-Thomas scan is the ceiling")
