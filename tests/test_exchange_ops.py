"""Exchange-operator regressions: batched khi alignment, the eager
conservation check's batch pairing, and _expm2 near-degeneracy accuracy.

Reference anchor: epgpy/exchange.py (note the reference CRASHES on a
batched khi from its own exchange_matrix(rates, axis=0) -- broadcast
error in exchange_operator -- so batched per-atom khi is validated here
against a per-atom loop oracle instead).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import epgpy_tpu as epg
from epgpy_tpu.ops.exchange import _expm2


def _run(khi, T2, B):
    X = epg.X(10.0, khi, axis=0, T1=1000.0, T2=T2)
    seq = []
    for _ in range(6):
        seq += [epg.T(np.asarray([10.0, 0.0]), 0.0), epg.ADC, X, epg.S(1)]
    return np.asarray(epg.simulate(seq, max_nstate=4, density=[0.8, 0.2],
                                   fisp_kernel=False))


@pytest.mark.parametrize("rates", [[0.005, 0.01, 0.02],
                                   [0.005, 0.02]])  # incl. B == ncomp
def test_batched_khi_matches_per_atom_loop(rates):
    """Per-atom khi (exchange_matrix(rate_array, axis=0) -> (C, B, C))
    must pair each atom's kinetic matrix with that atom's parameters.
    The B == ncomp case used to broadcast silently with misaligned
    axes; other batch sizes crashed."""
    B = len(rates)
    t2f = np.linspace(60, 100, B)
    T2 = np.stack([t2f, np.full(B, 0.012)])
    batched = _run(epg.exchange_matrix(np.asarray(rates), axis=0), T2, B)
    per_atom = np.stack(
        [_run(epg.exchange_matrix(float(rates[b])),
              np.asarray([t2f[b], 0.012]), 1) for b in range(B)],
        axis=-1)
    assert np.abs(batched - per_atom).max() == 0.0


def test_conservation_check_pairs_atoms():
    """Eager-mode conservation check: per-atom khi each conserving its
    OWN atom's density must pass (a tensordot would cross atoms and
    raise spuriously)."""
    dens = np.asarray([[0.9, 0.7], [0.1, 0.3]])       # (C, B)
    khis = np.stack([epg.exchange_matrix(0.005, densities=dens[:, b])
                     for b in range(2)], axis=1)       # (C, B, C)
    X = epg.X(10.0, khis, axis=0, T1=1000.0,
              T2=np.asarray([[80.0, 90.0], [0.012, 0.012]]))
    sm = epg.StateMatrix([0, 0, 1], nstate=2, density=dens)
    sm = sm.broadcast((2, 2))
    sm = epg.T(np.asarray([10.0, 0.0]), 0.0)(sm)
    out = X(sm)                                        # must not raise
    assert np.isfinite(np.asarray(out.states_re)).all()


def test_expm2_near_degeneracy_f32():
    """complex64 mixing matrices near the eigenvalue crossing (the
    old 1e-12 threshold was f64-calibrated: 14% error measured at
    |delta| ~ 2e-5 in f32)."""
    import scipy.linalg as sla

    x, b = 0.7, 1.3
    for delta in (0.0, 1e-6, 1e-4, 1e-2, 0.03, 0.05, 0.3, 2.0):
        c = -(x ** 2 - delta ** 2) / b
        m = np.array([[-1.0 + x, b], [c, -1.0 - x]], complex)
        truth = sla.expm(m)
        got32 = np.asarray(_expm2(jnp.asarray(m, jnp.complex64)))
        got64 = np.asarray(_expm2(jnp.asarray(m, jnp.complex128)))
        rel32 = np.abs(got32 - truth).max() / np.abs(truth).max()
        rel64 = np.abs(got64 - truth).max() / np.abs(truth).max()
        assert rel32 < 3e-6, (delta, rel32)
        assert rel64 < 1e-12, (delta, rel64)


def test_expm2_large_common_magnitude():
    """Eigenvalue pairs with a large common (imaginary) component but
    O(1) separation must stay on the exact spectral formula: a purely
    relative degeneracy threshold would route them into the truncated
    series (error ~ |D|^8/8!, garbage at |D| ~ 1)."""
    import scipy.linalg as sla

    for mu_im, delta in ((60.0, 1.0), (600.0, 2.5), (60.0, 8.0)):
        # eigenvalues mu +- delta/... : a = mu + x, d = mu - x, bc free
        x, b = delta / 2, 0.7
        m = np.array([[1j * mu_im - 0.5 + x, b],
                      [0.0, 1j * mu_im - 0.5 - x]], complex)
        m[1, 0] = 0.03
        truth = sla.expm(m)
        got64 = np.asarray(_expm2(jnp.asarray(m, jnp.complex128)))
        rel = np.abs(got64 - truth).max() / np.abs(truth).max()
        assert rel < 1e-10, (mu_im, delta, rel)


class TestXDerivatives:
    """r5 (beyond reference: epgpy's X raises on _derive1): exchange
    parameters differentiate through the planner's generic epsilon
    substitution.  Fit-relevant directions are structured array
    chain-rule coefficients: order1={"k": {"khi": kron}} for the
    exchange rate (khi = k*kron), {"T2f": {"T2": e0}} for the
    free-pool T2 (compartment one-hot).  FD is the oracle."""

    B, NTR = 3, 12
    dens = [0.8, 0.2]
    kron = np.array([[-0.2, 0.8], [0.2, -0.8]])
    k0 = 0.005
    T2f = np.linspace(40.0, 120.0, B)
    T1 = np.array([1000.0, 1100.0])

    def _train(self, k, dT2f=0.0, track=False):
        T2 = np.stack([self.T2f + dT2f, np.full(self.B, 0.012)], axis=0)
        e0 = np.array([[1.0], [0.0]])
        o1 = ({"k": {"khi": self.kron}, "T2f": {"T2": e0}}
              if track else False)
        X = epg.X(10.0, k * self.kron, axis=0, T1=self.T1, T2=T2,
                  order1=o1)
        seq = []
        for _ in range(self.NTR):
            seq += [epg.T(np.asarray([10.0, 0.0]), 0), epg.ADC, X,
                    epg.S(1)]
        return seq

    def _sim(self, seq, probe=None):
        return np.asarray(epg.simulate(seq, max_nstate=8,
                                       density=self.dens, probe=probe,
                                       fisp_kernel=False))

    def test_fd_parity(self):
        jac = self._sim(self._train(self.k0, track=True),
                        probe=[epg.Jacobian(["k", "T2f"])])
        eps = 1e-7
        fd_k = (self._sim(self._train(self.k0 + eps))
                - self._sim(self._train(self.k0 - eps))) / (2 * eps)
        assert np.abs(jac[..., 0] - fd_k).max() \
            / max(np.abs(fd_k).max(), 1e-12) < 1e-7
        eps2 = 1e-5
        fd_t = (self._sim(self._train(self.k0, dT2f=eps2))
                - self._sim(self._train(self.k0, dT2f=-eps2))) / (2 * eps2)
        assert np.abs(jac[..., 1] - fd_t).max() \
            / max(np.abs(fd_t).max(), 1e-12) < 1e-6

    def test_tracked_x_falls_through_fused_dispatch(self):
        """Tracked X ops must not be claimed by the fused primal
        matchers (their kernels ignore order1); forced dispatch must
        still produce planner-identical signals."""
        from epgpy_tpu import fisp_dispatch
        seq = self._train(self.k0, track=True)
        shape = (2, self.B)
        assert fisp_dispatch.match_xgre(list(seq), shape,
                                        list(self.dens)) is None
        assert fisp_dispatch.match_xcomposite(list(seq), shape,
                                              list(self.dens)) is None
        got = np.asarray(epg.simulate(list(seq), max_nstate=8,
                                      density=self.dens,
                                      fisp_kernel="force"))
        ref = self._sim(self._train(self.k0))
        assert np.abs(got - ref).max() < 1e-10

    def test_probe_untracked_raises(self):
        with pytest.raises(ValueError, match="not tracked"):
            self._sim(self._train(self.k0),
                      probe=epg.Jacobian(["k"]))
