#!/usr/bin/env python
"""Generate the distributional-fidelity fixture from the LIVE reference.

Runs the executing reference (/root/reference) EKF and PF demos headless
for N independent seeds and records per-seed summary statistics into
``tests/fixtures/ref_distributions.json``.  The committed fixture is the
ground truth for ``tests/test_distributional.py`` (SURVEY.md §4.2's
"*distributional* match ... RMSE/NEES ... over N seeded rollouts" clause,
VERDICT r3 item 4): numpy MT19937 cannot be bit-matched from JAX, so
fidelity at the statistics level is asserted against bands measured from
the reference itself, not from the hand-written oracles.

Statistics (identical formulas on the tpuslam side):
  EKF (120 steps, seed-per-run):
    rmse_pos   sqrt(mean_t ||x_pre[t,:2] - x_true[t,:2]||^2)
               (x_pre is what main_ekf returns/plots,
                extended_kalman_filter.py:130)
    mean_nees  mean_t e_t' P_t^{-1} e_t, e = x_pre - x_true (yaw wrapped),
               P the returned posterior covariance
  PF (60 steps, NP=1000):
    rmse_pos   from the returned MAP-particle estimate
               (particle_filter.py:115-117)
    fire_count number of ESS-gate resample firings (rand draws at :214)
    mean_ess_frac  mean_t ESS(pw_t)/NP of the post-step weights (the next
               step's gate input, :200-224)

Usage: python scripts/gen_ref_distributions.py [N_SEEDS]
(~5-10 min for the PF side; run once, commit the fixture.)
"""

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF_DIR = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / \
    "fixtures" / "ref_distributions.json"

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
EKF_STEPS = 120
PF_STEPS = 60


def _mlab_bivariate_normal(X, Y, sigmax=1.0, sigmay=1.0, mux=0.0, muy=0.0,
                           sigmaxy=0.0):
    Xmu = X - mux
    Ymu = Y - muy
    rho = sigmaxy / (sigmax * sigmay)
    z = (Xmu ** 2 / sigmax ** 2 + Ymu ** 2 / sigmay ** 2
         - 2 * rho * Xmu * Ymu / (sigmax * sigmay))
    denom = 2 * np.pi * sigmax * sigmay * np.sqrt(1 - rho ** 2)
    return np.exp(-z / (2 * (1 - rho ** 2))) / denom


def import_reference():
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.mlab as mlab
    if not hasattr(mlab, "bivariate_normal"):
        mlab.bivariate_normal = _mlab_bivariate_normal
    old_flag = sys.dont_write_bytecode
    sys.dont_write_bytecode = True
    sys.path.insert(0, str(REF_DIR))
    try:
        import extended_kalman_filter as ekf_mod
        import particle_filter as pf_mod
    finally:
        sys.path.remove(str(REF_DIR))
        sys.dont_write_bytecode = old_flag
    return ekf_mod, pf_mod


def wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def run_ekf_seed(ekf_mod, seed):
    np.random.seed(seed)
    rekf = ekf_mod.ExtendedKalmanFilter(100)
    sq = []
    nees = []
    for _ in range(EKF_STEPS):
        x_true, x_dr, z, x_pre, P = rekf.main_ekf()
        e = (x_pre - x_true).ravel()
        e[2] = wrap(e[2])
        sq.append(float(e[0] ** 2 + e[1] ** 2))
        nees.append(float(e @ np.linalg.solve(P, e)))
    return {"rmse_pos": float(np.sqrt(np.mean(sq))),
            "mean_nees": float(np.mean(nees))}


def run_pf_seed(pf_mod, seed):
    np.random.seed(seed)
    rpf = pf_mod.ParticleFilter(100)

    fire = [0]
    orig_rand = np.random.rand

    def counting_rand(*a):
        fire[0] += 1
        return orig_rand(*a)

    np.random.rand = counting_rand
    sq = []
    ess_frac = []
    try:
        for _ in range(PF_STEPS):
            lm, x_true, x_est, px, Q, max_idx, max_w = rpf.main_pf()
            e = (np.asarray(x_est).ravel()[:2]
                 - np.asarray(x_true).ravel()[:2])
            sq.append(float(e @ e))
            pw = np.asarray(rpf._ParticleFilter__pw).ravel()
            ess_frac.append(float(1.0 / np.sum(pw ** 2) / pw.size))
    finally:
        np.random.rand = orig_rand
    return {"rmse_pos": float(np.sqrt(np.mean(sq))),
            "fire_count": fire[0],
            "mean_ess_frac": float(np.mean(ess_frac))}


def main():
    ekf_mod, pf_mod = import_reference()
    print(f"running live reference: {N_SEEDS} seeds "
          f"(EKF x{EKF_STEPS} steps, PF x{PF_STEPS} steps)", flush=True)
    ekf_rows = []
    for s in range(N_SEEDS):
        ekf_rows.append(run_ekf_seed(ekf_mod, 1000 + s))
    print("EKF done", flush=True)
    pf_rows = []
    for s in range(N_SEEDS):
        pf_rows.append(run_pf_seed(pf_mod, 2000 + s))
        if (s + 1) % 10 == 0:
            print(f"PF {s + 1}/{N_SEEDS}", flush=True)

    def summarize(rows):
        out = {}
        for k in rows[0]:
            v = np.array([r[k] for r in rows], float)
            out[k] = {"mean": float(v.mean()), "std": float(v.std(ddof=1)),
                      "min": float(v.min()), "max": float(v.max()),
                      "q10": float(np.quantile(v, 0.10)),
                      "q90": float(np.quantile(v, 0.90))}
        return out

    fixture = {
        "n_seeds": N_SEEDS,
        "ekf_steps": EKF_STEPS,
        "pf_steps": PF_STEPS,
        "ekf": summarize(ekf_rows),
        "pf": summarize(pf_rows),
        "ekf_rows": ekf_rows,
        "pf_rows": pf_rows,
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(fixture, indent=1))
    print(f"wrote {OUT}")
    for side in ("ekf", "pf"):
        for k, st in fixture[side].items():
            print(f"  {side}.{k}: mean={st['mean']:.4f} std={st['std']:.4f}"
                  f" [{st['min']:.4f}, {st['max']:.4f}]")


if __name__ == "__main__":
    main()
