"""Golden-trajectory regression tests (SURVEY.md section 4, item 5).

Fixed PRNG key -> scan -> digest of the trajectory buffer, to catch
numerical drift across JAX/XLA upgrades.  Goldens were generated on the
CPU backend (jax 0.9.0, f32); tolerate small float drift via rounded
sums rather than bit hashes.
"""

import numpy as np
import jax

from tpuslam.filters import EkfConfig, PfConfig, ekf_rollout, pf_rollout


def _digest(arr, decimals=3):
    """Drift-tolerant digest: rounded mean/std/first/last."""
    a = np.asarray(arr, np.float64)
    return np.round([a.mean(), a.std(), a.ravel()[0], a.ravel()[-1]],
                    decimals)


class TestGolden:
    def test_ekf_golden(self):
        _, outs = jax.jit(lambda k: ekf_rollout(EkfConfig(), k, 100))(
            jax.random.key(1234))
        d = _digest(outs.x_pre)
        # Golden generated on the CPU backend (jax 0.9.0, f32), bulk-noise
        # rollout stream.  Regenerate with: print(repr(_digest(outs.x_pre))).
        want = np.array([4.699, 3.623, 10.0, -2.936])
        np.testing.assert_allclose(d, want, atol=2e-3)
        # Structural invariants that any correct run must satisfy:
        assert np.all(np.abs(np.asarray(outs.x_pre)[:, :2]) < 20.0)
        assert np.isfinite(np.asarray(outs.cov)).all()

    def test_ekf_cross_run_determinism(self):
        f = jax.jit(lambda k: ekf_rollout(EkfConfig(), k, 60))
        _, a = f(jax.random.key(7))
        _, b = f(jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a.x_pre),
                                      np.asarray(b.x_pre))
        _, c = f(jax.random.key(8))
        assert not np.array_equal(np.asarray(a.x_pre), np.asarray(c.x_pre))

    def test_pf_cross_run_determinism(self):
        cfg = PfConfig(num_particles=200, weight_mode="log")
        f = jax.jit(lambda k: pf_rollout(cfg, k, 30))
        _, a = f(jax.random.key(5))
        _, b = f(jax.random.key(5))
        np.testing.assert_array_equal(np.asarray(a.x_est),
                                      np.asarray(b.x_est))
