"""Fused EPG-X Jacobian kernel (models/pallas_xgre.xgre_jacobian_pallas).

A beyond-reference capability: epgpy's X operator has no derivatives at
all (reference epgpy/exchange.py -- no _derive1), so the oracle here is
float64 central finite differences of the scan-planner simulate() over
the SAME train, w.r.t. the bound-pool fraction f (enters the kinetic
matrix AND the equilibrium densities) and the free-pool T2 (enters the
transverse mixing matrix).  The kernel runs in interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import epgpy_tpu as epg
from epgpy_tpu.models.pallas_xgre import (exchange_stage_mats,
                                          xgre_jacobian_pallas)

N, B, C = 8, 4, 2
TRv = 12.0
K_EX = 0.004
T2_BOUND = 0.012
T1C = np.array([900.0, 1100.0])
RL_SAT = 0.25
NSTATE = 5
FAS = 8.0 + 40.0 * np.abs(np.sin(np.arange(N) * 0.7))


def planner_signal(f, T2f, g=None):
    """f64 scan-planner signal (N, C, B) for shared f, per-atom T2f."""
    dens = [1.0 - f, f]
    khi = epg.exchange_matrix(K_EX, densities=dens)
    T2 = np.stack([np.asarray(T2f, float), np.full(len(T2f), T2_BOUND)], 0)
    gv = None if g is None else np.asarray(g, float)
    Xop = epg.X(TRv, khi, axis=0, T1=T1C, T2=T2, g=gv)
    sat = epg.R(0, rL=np.asarray([0.0, RL_SAT]), r0=None)
    seq = []
    for i in range(N):
        seq += [sat, epg.T(np.asarray([FAS[i], 0.0]), 0.0), epg.ADC, Xop,
                epg.S(1)]
    return np.asarray(epg.simulate(seq, max_nstate=NSTATE, density=dens,
                                   fisp_kernel=False))


def stage_fn(f, T2f, g):
    """Differentiable (mr, mi, ml, dens) map; f and T2f are (B,)."""
    d0, d1 = 1.0 - f, f
    khi = jnp.stack([jnp.stack([K_EX / d0, -K_EX / d1]),
                     jnp.stack([-K_EX / d0, K_EX / d1])])      # (2, 2, B)
    T2 = jnp.stack([T2f, jnp.full_like(T2f, T2_BOUND)])
    T1 = jnp.broadcast_to(jnp.asarray(T1C)[:, None], (C,) + f.shape)
    gv = None if g is None else jnp.asarray(g)
    mr, mi, ml = exchange_stage_mats(khi, T1, T2, gv, TRv)
    return mr, mi, ml, jnp.stack([d0, d1])


def kernel_jacobian(f, T2f, g=None):
    """Primal + (df, dT2f) tangents from one fused kernel call."""
    f = jnp.asarray(f, jnp.float32)
    T2f = jnp.asarray(T2f, jnp.float32)
    one, zero = jnp.ones_like(f), jnp.zeros_like(f)
    args = (f, T2f, g)

    def jvp(tf, tt):
        return jax.jvp(lambda a, b: stage_fn(a, b, g), (f, T2f), (tf, tt))

    (mr, mi, ml, dens), tf = jvp(one, zero)
    _, tt = jvp(zero, one)
    eye = jnp.broadcast_to(jnp.eye(C, dtype=jnp.float32), (B, C, C))
    zer = jnp.zeros_like(eye)
    matsA = (eye, zer, eye)
    dmatsA = tuple(jnp.zeros((2, B, C, C), jnp.float32) for _ in range(3))
    dmatsB = tuple(jnp.stack([a, b]) for a, b in
                   zip(tf[:3], tt[:3]))
    ddens = jnp.stack([tf[3], tt[3]])                           # (2, C, B)

    alpha = np.stack([FAS, np.zeros(N)], axis=1)
    phi = np.zeros((N, C))
    satf = np.ones((N, C))
    satz = np.stack([np.ones(N), np.full(N, np.exp(-RL_SAT))], axis=1)
    return xgre_jacobian_pallas(
        alpha, phi, satf, np.zeros((N, C)), satz, np.zeros((N, C)),
        dens, matsA, (mr, mi, ml), dmatsA, dmatsB, ddens,
        nstate=NSTATE, btile=128, interpret=True)


@pytest.mark.parametrize("g", [None, "offres"])
def test_xgre_jacobian_fd_parity(g):
    rng = np.random.default_rng(5)
    fv = 0.17
    T2f = np.linspace(45.0, 110.0, B)
    gv = None if g is None else np.stack(
        [rng.uniform(-0.02, 0.02, B), np.zeros(B)])

    (re, im), (jre, jim) = kernel_jacobian(np.full(B, fv), T2f, gv)
    re, im = np.asarray(re), np.asarray(im)
    jre, jim = np.asarray(jre), np.asarray(jim)

    # primal parity vs the f64 planner
    ref = planner_signal(fv, T2f, None if gv is None else gv)
    err = np.abs((re + 1j * im) - ref).max()
    assert err < 3e-6, err

    # tangent parity vs f64 central differences
    eps_f, eps_t = 1e-4, 1e-2
    fd_f = (planner_signal(fv + eps_f, T2f, gv)
            - planner_signal(fv - eps_f, T2f, gv)) / (2 * eps_f)
    fd_t = (planner_signal(fv, T2f + eps_t, gv)
            - planner_signal(fv, T2f - eps_t, gv)) / (2 * eps_t)
    jac_f = jre[:, 0] + 1j * jim[:, 0]
    jac_t = jre[:, 1] + 1j * jim[:, 1]
    err_f = np.abs(jac_f - fd_f).max()
    # T2f enters in ms: scale the absolute comparison to the FD size
    err_t = np.abs(jac_t - fd_t).max()
    assert err_f < 1e-4 + 1e-3 * np.abs(fd_f).max(), err_f
    assert err_t < 1e-6 + 1e-3 * np.abs(fd_t).max(), (err_t,
                                                      np.abs(fd_t).max())


@pytest.mark.slow
def test_xgre_jacobian_three_compartments_fd():
    """C=3 (free + myelin water + bound pool): Pade expm path and the
    unrolled 3x3 mixes; FD oracle on the middle pool's T2."""
    C3 = 3
    B3 = 3
    T13 = np.array([900.0, 500.0, 1000.0])
    dens3 = np.array([0.6, 0.25, 0.15])
    khi3 = epg.exchange_matrix(0.003, ncomp=C3, densities=dens3)
    T2mid = np.linspace(15.0, 30.0, B3)

    def t2stack(t2m):
        return jnp.stack([jnp.full_like(t2m, 80.0), t2m,
                          jnp.full_like(t2m, T2_BOUND)])

    def planner3(t2m):
        T2 = np.stack([np.full(B3, 80.0), np.asarray(t2m, float),
                       np.full(B3, T2_BOUND)])
        Xop = epg.X(TRv, khi3, axis=0, T1=T13, T2=T2)
        seq = []
        for i in range(N):
            seq += [epg.T(np.asarray([FAS[i], FAS[i] * 0.5, 0.0]), 0.0),
                    epg.ADC, Xop, epg.S(1)]
        return np.asarray(epg.simulate(seq, max_nstate=NSTATE,
                                       density=list(dens3),
                                       fisp_kernel=False))

    def stage3(t2m):
        T1 = jnp.broadcast_to(jnp.asarray(T13, jnp.float32)[:, None],
                              (C3, B3))
        mr, mi, ml = exchange_stage_mats(khi3, T1, t2stack(t2m), None, TRv)
        return mr, mi, ml

    t2m = jnp.asarray(T2mid, jnp.float32)
    (mr, mi, ml), (dmr, dmi, dml) = jax.jvp(
        stage3, (t2m,), (jnp.ones_like(t2m),))
    eye = jnp.broadcast_to(jnp.eye(C3, dtype=jnp.float32), (B3, C3, C3))
    zer = jnp.zeros_like(eye)
    zt = tuple(jnp.zeros((1, B3, C3, C3), jnp.float32) for _ in range(3))
    alpha = np.stack([FAS, FAS * 0.5, np.zeros(N)], axis=1)
    ones = np.ones((N, C3))
    zeros = np.zeros((N, C3))
    (re, im), (jre, jim) = xgre_jacobian_pallas(
        alpha, zeros, ones, zeros, ones, zeros, dens3,
        (eye, zer, eye), (mr, mi, ml), zt,
        (dmr[None], dmi[None], dml[None]),
        jnp.zeros((1, C3, B3), jnp.float32),
        nstate=NSTATE, btile=128, interpret=True)

    ref = planner3(T2mid)
    err = np.abs((np.asarray(re) + 1j * np.asarray(im)) - ref).max()
    assert err < 3e-6, err

    eps = 5e-3
    fd = (planner3(T2mid + eps) - planner3(T2mid - eps)) / (2 * eps)
    jac = np.asarray(jre)[:, 0] + 1j * np.asarray(jim)[:, 0]
    err_t = np.abs(jac - fd).max()
    assert err_t < 1e-6 + 2e-3 * np.abs(fd).max(), (err_t,
                                                    np.abs(fd).max())


def test_xgre_jacobian_balanced_fd():
    """Balanced train (no spoiler, shift=False, nstate=0): bSSFP-MT
    family (Gloor 2008).  Phase-alternating RF; FD oracle on the
    bound-pool fraction f and the free-pool T2 as in the spoiled test."""
    phases = (180.0 * np.arange(N)) % 360.0

    def planner_balanced(f, T2f):
        dens = [1.0 - f, f]
        khi = epg.exchange_matrix(K_EX, densities=dens)
        T2 = np.stack([np.asarray(T2f, float),
                       np.full(len(T2f), T2_BOUND)], 0)
        Xop = epg.X(TRv, khi, axis=0, T1=T1C, T2=T2)
        sat = epg.R(0, rL=np.asarray([0.0, RL_SAT]), r0=None)
        seq = []
        for i in range(N):
            seq += [sat, epg.T(np.asarray([FAS[i], 0.0]), float(phases[i])),
                    epg.ADC, Xop]
        return np.asarray(epg.simulate(seq, max_nstate=NSTATE, density=dens,
                                       fisp_kernel=False))

    fv = 0.17
    T2f = np.linspace(45.0, 110.0, B)
    f = jnp.full(B, fv, jnp.float32)
    t2 = jnp.asarray(T2f, jnp.float32)
    one, zero = jnp.ones_like(f), jnp.zeros_like(f)

    def jvp(tf, tt):
        return jax.jvp(lambda a, b: stage_fn(a, b, None), (f, t2), (tf, tt))

    (mr, mi, ml, dens), tf = jvp(one, zero)
    _, tt = jvp(zero, one)
    eye = jnp.broadcast_to(jnp.eye(C, dtype=jnp.float32), (B, C, C))
    zer = jnp.zeros_like(eye)
    dmatsA = tuple(jnp.zeros((2, B, C, C), jnp.float32) for _ in range(3))
    dmatsB = tuple(jnp.stack([a, b]) for a, b in zip(tf[:3], tt[:3]))
    ddens = jnp.stack([tf[3], tt[3]])

    alpha = np.stack([FAS, np.zeros(N)], axis=1)
    phi = np.stack([phases, np.zeros(N)], axis=1)
    satf = np.ones((N, C))
    satz = np.stack([np.ones(N), np.full(N, np.exp(-RL_SAT))], axis=1)
    (re, im), (jre, jim) = xgre_jacobian_pallas(
        alpha, phi, satf, np.zeros((N, C)), satz, np.zeros((N, C)),
        dens, (eye, zer, eye), (mr, mi, ml), dmatsA, dmatsB, ddens,
        nstate=0, btile=128, interpret=True, shift=False)
    re, im = np.asarray(re), np.asarray(im)
    jre, jim = np.asarray(jre), np.asarray(jim)

    ref = planner_balanced(fv, T2f)
    assert np.abs((re + 1j * im) - ref).max() < 3e-6

    eps_f, eps_t = 1e-4, 1e-2
    fd_f = (planner_balanced(fv + eps_f, T2f)
            - planner_balanced(fv - eps_f, T2f)) / (2 * eps_f)
    fd_t = (planner_balanced(fv, T2f + eps_t)
            - planner_balanced(fv, T2f - eps_t)) / (2 * eps_t)
    jac_f = jre[:, 0] + 1j * jim[:, 0]
    jac_t = jre[:, 1] + 1j * jim[:, 1]
    assert np.abs(jac_f - fd_f).max() < 1e-4 + 1e-3 * np.abs(fd_f).max()
    assert np.abs(jac_t - fd_t).max() < 1e-6 + 1e-3 * np.abs(fd_t).max()


def test_xgre_jacobian_zero_tangents():
    """dM = 0, ddens = 0 must give exactly zero tangents, and the primal
    must match xgre_dictionary_pallas bit-for-bit."""
    from epgpy_tpu.models.pallas_xgre import xgre_dictionary_pallas

    fv = 0.2
    T2f = np.linspace(50.0, 100.0, B)
    f32 = jnp.float32
    f = jnp.full(B, fv, f32)
    mr, mi, ml, dens = jax.jit(stage_fn, static_argnames="g")(
        f, jnp.asarray(T2f, f32), None)
    eye = jnp.broadcast_to(jnp.eye(C, dtype=f32), (B, C, C))
    zer = jnp.zeros_like(eye)
    zt = tuple(jnp.zeros((1, B, C, C), f32) for _ in range(3))

    alpha = np.stack([FAS, np.zeros(N)], axis=1)
    phi = np.zeros((N, C))
    satf = np.ones((N, C))
    satz = np.stack([np.ones(N), np.full(N, np.exp(-RL_SAT))], axis=1)
    (re, im), (jre, jim) = xgre_jacobian_pallas(
        alpha, phi, satf, np.zeros((N, C)), satz, np.zeros((N, C)),
        dens, (eye, zer, eye), (mr, mi, ml), zt, zt,
        jnp.zeros((1, C, B), f32), nstate=NSTATE, btile=128, interpret=True)
    assert np.all(np.asarray(jre) == 0) and np.all(np.asarray(jim) == 0)

    # primal path parity with the plain dictionary kernel (same physics,
    # global densities)
    khi = epg.exchange_matrix(K_EX, densities=[1 - fv, fv])
    T2 = np.stack([T2f, np.full(B, T2_BOUND)])
    T1 = np.broadcast_to(T1C[:, None], (C, B))
    re2, im2 = xgre_dictionary_pallas(
        alpha, phi, satf, np.zeros((N, C)), satz, np.zeros((N, C)),
        np.array([1 - fv, fv]),
        (np.zeros((C, C)), T1, T2, np.zeros((C, B)), 0.0),
        (khi, T1, T2, np.zeros((C, B)), TRv),
        nstate=NSTATE, btile=128, interpret=True)
    assert np.allclose(np.asarray(re), np.asarray(re2), atol=2e-6)
    assert np.allclose(np.asarray(im), np.asarray(im2), atol=2e-6)
