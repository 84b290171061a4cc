"""Generate golden parity values by running the reference epgpy (NumPy).

Run where /root/reference exists; commits small .npz files used by the test
suite.  The test suite itself never imports the reference.

Usage: python tools/make_golden.py
"""

import os
import sys

import numpy as np

REF = os.environ.get("EPGPY_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

sys.path.insert(0, REF)

import epgpy.operators as ops  # noqa: E402
import epgpy.functions as fun  # noqa: E402


def cpmg():
    T2s = [30.0, 45.0, 60.0]
    necho = 8
    seq = [ops.T(90, 90)] + [
        ops.E(4.5, 1400, T2s), ops.S(1), ops.T(150, 0),
        ops.E(4.5, 1400, T2s), ops.S(1), ops.ADC,
    ] * necho
    return {"signal": np.asarray(fun.simulate(seq)), "T2s": np.asarray(T2s)}


def spgr():
    # RF-spoiled gradient echo with quadratic phase cycling
    n, TR, TE = 50, 10.0, 3.0
    phases = np.cumsum(np.arange(n) * 117.0)
    seq = []
    for i in range(n):
        seq += [
            ops.T(15, phases[i] % 360),
            ops.E(TE, 1000, 80), ops.Adc(phase=-(phases[i] % 360)),
            ops.E(TR - TE, 1000, 80), ops.S(1),
        ]
    return {"signal": np.asarray(fun.simulate(seq, max_nstate=20))}


def mse_b1():
    # vectorized MSE with B1 sweep via modify (docs/basics.md example)
    necho = 18
    T2s = np.linspace(20, 100, 11)
    B1s = np.linspace(0.5, 1.2, 7)
    seq = [ops.T(90, 90)]
    for _ in range(necho):
        seq += [
            ops.E(4.5, 1400, T2s), ops.S(1),
            ops.T(150 * B1s[None, :], 0),
            ops.E(4.5, 1400, T2s), ops.S(1), ops.ADC,
        ]
    return {
        "signal": np.asarray(fun.simulate(seq)),
        "T2s": T2s, "B1s": B1s,
    }


def fisp_mrf():
    # small FISP MRF dictionary: variable flip angles, fixed TR
    np.random.seed(0)
    npulse = 64
    FAs = 10 + 50 * np.abs(np.sin(np.arange(npulse) * 2 * np.pi / npulse))
    TR, TE = 12.0, 5.0
    T1s = np.asarray([300.0, 800.0, 1400.0])
    T2s = np.asarray([30.0, 80.0, 110.0])
    seq = []
    for i in range(npulse):
        seq += [
            ops.T(FAs[i], 90),
            ops.E(TE, T1s, T2s), ops.ADC,
            ops.E(TR - TE, T1s, T2s), ops.S(1),
        ]
    return {
        "signal": np.asarray(fun.simulate(seq, max_nstate=10)),
        "FAs": FAs, "T1s": T1s, "T2s": T2s,
    }


def shift3d_diffusion():
    """3D integer shifts + anisotropic diffusion (Weigel 2010 style)."""
    Dtensor = np.diag([2e-3, 1e-3, 0.5e-3])
    k1 = np.array([[1, 0, 0]])
    k2 = np.array([[0, 1, 1]])
    tau = 5.0
    seq = [
        ops.T(90, 90),
        ops.S(k1), ops.D(tau, Dtensor, k=k1),
        ops.T(150, 0),
        ops.S(k2), ops.D(tau, Dtensor, k=k2),
        ops.T(60, 30),
        ops.S(-k2), ops.D(tau, Dtensor, k=-k2),
        ops.S(-k1), ops.D(tau, Dtensor, k=-k1),
        ops.ADC,
    ]
    sig = np.asarray(fun.simulate(seq, probe=["F0", "Z0"]))
    return {"signal": sig}


def diffusion_se():
    """Isotropic diffusion weighting in a spin echo (Stejskal-Tanner)."""
    Dc = 1e-3  # mm^2/s
    out = {}
    sigs = []
    for tau in (5.0, 10.0, 20.0):
        seq = [
            ops.T(90, 90),
            ops.S(1, duration=tau), ops.D(tau, Dc, k=1),
            ops.T(180, 0),
            ops.S(1, duration=tau), ops.D(tau, Dc, k=1),
            ops.ADC,
        ]
        sigs.append(np.asarray(fun.simulate(seq, kvalue=500.0)))
    out["signal"] = np.stack(sigs)
    return out


def exchange_gre():
    """Two-compartment EPG-X SPGR (Malik 2018 style)."""
    T1 = [1000.0, 500.0]
    T2 = [80.0, 20.0]
    g = [0.0, 0.02]
    khi = 0.01  # 1/ms
    TR, alpha, n = 10.0, 15.0, 40
    X = ops.X(TR, khi, axis=-1, T1=T1, T2=T2, g=g)
    seq = []
    for i in range(n):
        seq += [ops.T(alpha, 0), ops.ADC, X, ops.S(1)]
    sig = np.asarray(fun.simulate(seq, max_nstate=12,
                                  init=np.array([0, 0, 0.5]) * np.ones((2, 1, 1)),
                                  density=[0.5, 0.5]))
    return {"signal": sig}


def shift_merge():
    """Float wavenumbers with gridded merge (Gao 2021)."""
    seq = [
        ops.T(90, 90),
        ops.S(np.array([[1.3]]), kgrid=0.5), ops.T(120, 0),
        ops.S(np.array([[0.9]]), kgrid=0.5), ops.T(45, 90),
        ops.S(np.array([[-1.3]]), kgrid=0.5), ops.T(30, 0),
        ops.ADC,
    ]
    sig = np.asarray(fun.simulate(seq, max_nstate=30, probe=["F0", "Z0"]))
    return {"signal": sig}


def rfpulse_profile():
    """Shaped sinc pulse + slice profile via modify(g=freqs)."""
    from epgpy import rfpulse as rrf
    x = np.linspace(-3, 3, 64)
    values = np.sinc(x) * np.hamming(64)
    values /= np.abs(values).max()
    pulse = rrf.RFPulse(values, 2.0, alpha=90.0)
    freqs = np.linspace(-2.0, 2.0, 21)
    import epgpy.functions as rfun2
    seq = rfun2.modify([pulse], g=freqs, expand=False)
    sig = np.asarray(fun.simulate(list(seq) + [ops.ADC]))
    return {"signal": sig, "values_re": values.real, "values_im": values.imag,
            "rf": np.asarray(pulse.rf), "freqs": freqs}


def imaging_probe():
    """Spatially-resolved imaging readout after a gradient-echo prep."""
    from epgpy import probe as rprobe
    positions = np.linspace(-0.01, 0.01, 9)[:, None]  # m
    seq = [
        ops.T(90, 90), ops.S(1, duration=1.0),
        ops.T(30, 0), ops.S(1, duration=1.0),
        rprobe.Imaging(positions, reduce=False, voxel_size=2e-3),
    ]
    sig = np.asarray(fun.simulate(seq, kvalue=400.0))
    return {"signal": sig, "positions": positions}


def mt_rates():
    # numpy-2 shim: the reference still uses np.asfarray (removed)
    if not hasattr(np, "asfarray"):
        np.asfarray = lambda a: np.asarray(a, dtype=float)
    from epgpy import magnettransfer as rmt
    offres = np.asarray([0.0, 0.5, 1.0, 2.0, 5.0, 10.0])
    out = {"offres": offres}
    for shape in ("gaussian", "lorentzian"):
        out[shape.replace("-", "_")] = rmt.absorption_rate(12e-3, shape, offres)
    # reference's cubic extrapolation for |offres|<1 uses np.asfarray
    # (removed in numpy 2); golden only covers the integral region
    out["super_lorentzian"] = rmt.absorption_rate(
        12e-3, "super-lorentzian", offres[2:])
    out["satrate"] = np.asarray(
        rmt.saturation_rate(5.0, 10.0, rmt.absorption_rate(12e-3, "gaussian", 2.0)))
    return out


def shift_prune():
    """Batch-varying float shifts (reference shift-prune method)."""
    ks = np.array([[0.7], [1.3], [2.1]])
    seq = [
        ops.T(90, 90),
        ops.S(ks, kgrid=0.25), ops.T(120, 0),
        ops.S(ks, kgrid=0.25), ops.T(60, 45),
        ops.S(-ks, kgrid=0.25), ops.ADC,
    ]
    sig = np.asarray(fun.simulate(seq, max_nstate=20, probe=["F0", "Z0"]))
    return {"signal": sig, "ks": ks}


def dess():
    """Double-echo steady state: two ADC per TR (FISP + PSIF)."""
    n, TR, TE = 30, 20.0, 5.0
    seq = []
    for _ in range(n):
        seq += [
            ops.T(25, 0),
            ops.E(TE, 1000, 80), ops.ADC,
            ops.E(TR - 2 * TE, 1000, 80), ops.S(1),
            ops.E(TE, 1000, 80), ops.ADC,
        ]
    return {"signal": np.asarray(fun.simulate(seq, max_nstate=15))}


def megre():
    """Multi-echo spoiled GRE: m=3 echoes per TR before the spoiler
    (T2*/B0-mapping acquisition), varying flips, off-resonance."""
    n, TR = 20, 22.0
    tes = [4.0, 9.0, 15.0]
    g = 0.02
    seq = []
    for i in range(n):
        seq.append(ops.T(15 + i, 0))
        prev = 0.0
        for te in tes:
            seq += [ops.E(te - prev, 900, 70, g), ops.ADC]
            prev = te
        seq += [ops.E(TR - prev, 900, 70, g), ops.S(1)]
    return {"signal": np.asarray(fun.simulate(seq, max_nstate=12))}


def t2star():
    """C operator: accumulated-time dephasing (4th coordinate) with F0
    readout weighted by exp(-|t|) (reference t2star example)."""
    seq = [ops.T(90, 90)]
    sigs = []
    for _ in range(6):
        seq = seq + [ops.C(2.0, 0.3)]
        sigs.append(None)
    seq2 = [ops.T(90, 90)]
    out = []
    for i in range(6):
        seq2 += [ops.C(2.0, 0.3), ops.ADC]
    sig = np.asarray(fun.simulate(seq2, max_nstate=20, kgrid=0.1))
    # interleave with a refocusing pulse (tests t-coordinate mixing)
    seq3 = [ops.T(90, 90), ops.C(2.0, 0.3), ops.T(150, 0), ops.C(2.0, 0.3),
            ops.ADC]
    sig3 = np.asarray(fun.simulate(seq3, max_nstate=20, kgrid=0.1))
    return {"fid": sig, "echo": sig3}


def press():
    """PRESS spectroscopy voxel localization via 3-D crusher gradients
    (Gao 2021 part 3.3): reduced-scale reference
    examples/gradient/point_resolved_mrs.py.  Golden records the 3-D DFT
    images at each ADC (representation-independent: padded zero-F rows of
    a static ladder contribute nothing to the DFT sums)."""
    from epgpy import utils as rutils
    gamma = rutils.gamma_1H
    FOV, npix = 48, 8  # mm, pixels per axis
    grid = FOV * 1e-3 * np.stack(
        np.meshgrid(*[np.linspace(-0.5, 0.5, npix)] * 3, indexing="ij"), -1)
    kfilt = 2 * np.pi / (FOV * 1e-3 / npix)
    TE1, TE2 = 14, 16  # ms
    kc = 2 * np.pi * 50  # crusher area (rad/m)
    Gs = np.array([0.1, -0.2, 0.3]) / gamma * 1e2  # static gradient (mT/m)
    kim = 2 * np.pi * npix / FOV * 1e3
    rf1, rf2, rf3 = ops.T(90, 90), ops.T(90, 0), ops.T(90, 0)
    eye = 0.5 * np.eye(3)
    gy, gz = ops.S(eye[1] * kim), ops.S(eye[2] * kim)
    gc = ops.S([kc] * 3)
    gs1 = ops.G(TE1 / 2, Gs, duration=True)
    gs2 = ops.G(TE2 / 2, Gs, duration=True)
    gslong = ops.G(100, Gs, duration=True)
    seq = [
        [rf1],
        [gs1, gc, gy, rf2, gy, gc, gs1], ops.ADC,
        [gs2, gc, gz, rf3, gz, gc, gs2], ops.ADC,
        [gslong], ops.ADC,
        [gslong], ops.ADC,
    ]
    Fs, ks = fun.simulate(seq, kgrid=1.0, probe=("F", "k"), asarray=False)
    keep = [np.all(np.abs(ks[i]) <= kfilt, axis=-1) for i in range(4)]
    sig = np.stack([
        fun.dft(grid, Fs[i][keep[i]], ks[i][keep[i]]) for i in range(4)])
    return {"images": sig, "kfilt": np.asarray(kfilt)}


def rare_diffusion():
    """RARE diffusion sensitivity vs flip angle (Weigel 2010): reduced
    reference examples/diffusion/diffusion_sensitivity_rare.py.  Signals
    with and without D over an FA sweep; the b-factor their log-ratio."""
    from epgpy import utils as rutils
    taurf = 2.56
    k1 = rutils.get_wavenumber(4.0, 7.2) / 2 + rutils.get_wavenumber(0.72, 9.9)
    k2 = rutils.get_wavenumber(4.0, 7.2)
    kS = rutils.get_wavenumber(0.72, 9.9)
    T1, T2, D = 1e3, 1e2, 1e-3
    ETL = 6
    angles = np.linspace(10, 180, 18)
    exc = ops.T(90, 90)
    trf = ops.T(angles, 0)
    erf = ops.E(taurf / 2, T1, T2)
    s1, d1, e1 = ops.S(k1), ops.D(1.44, D, k=k1), ops.E(1.44, T1, T2)
    s2, d2, e2 = ops.S(k2 / 2), ops.D(2.0, D, k=k2 / 2), ops.E(2.0, T1, T2)
    sS, dS, eS = ops.S(kS), ops.D(0.72, D, k=kS), ops.E(0.72, T1, T2)
    init = [erf, s1, d1, e1]
    pre = [s2, d2, e2, sS, dS, eS, erf]
    post = [erf, sS, dS, eS, s2, d2, e2]
    seq = [exc, init, trf, post] + [pre, trf, post] * ETL + [ops.ADC]
    signal = fun.simulate(seq, kgrid=10)[0]
    initn = [erf, s1, e1]
    pren = [s2, e2, sS, eS, erf]
    postn = [erf, sS, eS, s2, e2]
    seqn = [exc, initn, trf, postn] + [pren, trf, postn] * ETL + [ops.ADC]
    signaln = fun.simulate(seqn, kgrid=10)[0]
    return {"angles": angles, "signal": np.asarray(signal),
            "signal_nodiff": np.asarray(signaln)}


def ssfp_dwi():
    """Diffusion-weighted SSFP with anisotropic D in a static background
    gradient (Gao 2021 part 3.2): reduced reference
    examples/diffusion/ssfp_diffusion_weighting.py.  Conventional
    (same-axis) vs quasi-isotropic (alternating-axis) diffusion gradients,
    DFT-probed across a 1-D position profile."""
    from epgpy import utils as rutils
    gamma = rutils.gamma_1H
    Nrf, FA, Gdiff, Tdiff, TR = 30, 25, 23.5, 5.0, 10.0
    T1, T2 = 1084.0, 68.0
    D = np.diag([1.35, 0.5, 0]) * 1e-3
    FOV, Freq = 0.128, 100.0
    G = Freq / (FOV / 2) / gamma
    npos = 51
    pos = np.c_[np.zeros((npos, 2)), np.linspace(-0.5, 0.5, npos) * FOV]
    from epgpy import probe as rprobe
    adc = rprobe.DFT(pos)
    rf1, rf2 = ops.T(FA, 0), ops.T(FA, 180)
    g1x = ops.G(Tdiff, [Gdiff, 0, G])
    g1y = ops.G(Tdiff, [0, Gdiff, G])
    g2 = ops.G(TR - Tdiff, [0, 0, G])
    d1x, d1y = ops.D(Tdiff, D, g1x.k), ops.D(Tdiff, D, g1y.k)
    d2 = ops.D(TR - Tdiff, D, g2.k)
    rx1, rx2 = ops.E(Tdiff, T1, T2), ops.E(TR - Tdiff, T1, T2)
    conv = (Nrf // 2) * [
        [rf1, [g1x, d1x, rx1], [g2, d2, rx2], adc],
        [rf2, [g1x, d1x, rx1], [g2, d2, rx2], adc]]
    qi = (Nrf // 2) * [
        [rf1, [g1x, d1x, rx1], [g2, d2, rx2], adc],
        [rf2, [g1y, d1y, rx1], [g2, d2, rx2], adc]]
    sig0 = np.asarray(fun.simulate(conv, kgrid=1.0))
    sigqi = np.asarray(fun.simulate(qi, kgrid=1.0))
    return {"conventional": sig0.squeeze(), "quasi_isotropic": sigqi.squeeze(),
            "pos": pos}


def _ellipse_phantom(n):
    """Synthetic 3-tissue phantom shared with examples/gradient_echo_2d.py."""
    y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    outer = ((x / 0.85) ** 2 + (y / 0.95) ** 2 < 1).astype(float)
    wm = (((x / 0.55) ** 2 + ((y - 0.05) / 0.65) ** 2) < 1).astype(float) * outer
    gm = np.clip(outer - wm, 0, 1)
    csf = ((((x + 0.15) / 0.2) ** 2 + ((y + 0.2) / 0.25) ** 2) < 1
           ).astype(float) * outer
    wm = np.clip(wm - csf, 0, 1)
    gm = np.clip(gm - csf, 0, 1)
    return wm, gm, csf


def gre2d():
    """2-D spatially-resolved gradient-echo imaging (reference
    examples/gradient/isochromats_vs_epg_2d_vec.py on a synthetic
    phantom): per-line phase encodes, batched readout axis, T2' via the
    accumulated-time coordinate, Imaging probe with System weights and
    modulation, reduce over (tissue, position)."""
    NAX = np.newaxis
    from epgpy import probe as rprobe
    n = 16
    wm, gm, csf = _ellipse_phantom(n)
    mask = np.max([wm, gm, csf], 0) > 1e-5
    FA, TR, FOV = 30, 10, 200e-3
    pixels = (np.mgrid[-n // 2:n // 2, -n // 2:n // 2]
              .reshape(2, -1).T[mask.flat] * FOV / np.array([n, n]))
    PD = [0.8, 0.7, 1.0]
    T1 = [1.55e3, 0.83e3, 4.16e3]
    T2 = [0.09e3, 0.07e3, 1.65e3]
    T2p = [0.322e3, 0.183e3, 0.0591e3]
    pds = np.stack([gm * PD[0], wm * PD[1], csf * PD[2]]
                   ).reshape(3, -1)[..., mask.flat]
    init = ops.System(weights=pds[NAX], modulation=-1 / np.array([T2p]))
    rf = ops.T(FA, 0)
    adc = rprobe.Imaging(pixels, voxel_size=FOV / n, phase=-rf.phi,
                         reduce=(1, 2))
    rlx1 = ops.E([i * TR / n for i in range(n)], [T1], [T2])
    rlx1 *= ops.C(rlx1.tau)
    rlx2 = ops.E([TR * (n - 1 - i) / n for i in range(n)], [T1], [T2])
    rlx2 *= ops.C(rlx2.tau)
    kx = np.array([2 * np.pi / FOV, 0])
    kp = np.array([0, 2 * np.pi / FOV])
    gx1 = ops.S([kx * (i - n / 2) for i in range(n)])
    gx2 = ops.S([kx * (n - i + 1) for i in range(n)])
    gxspl = ops.S(1.5 * kx * n / 2)
    gp1 = [ops.S(kp * i) if i != 0 else ops.NULL
           for i in range(-n // 2, n // 2)]
    gp2 = [ops.S(-kp * i) if i != 0 else ops.NULL
           for i in range(-n // 2, n // 2)]
    seq = [init] + [
        [rf, gx1, gp1[i], rlx1, adc, rlx2, gx2, gxspl, gp2[i]]
        for i in range(n)]
    kspace = np.asarray(fun.simulate(seq, prune=1e-4, kgrid=1e-8))
    return {"kspace": kspace, "mask": mask,
            "pd_map": np.stack([wm, gm, csf])}


def fuzz():
    """Randomized mixed-operator sequences (combinational parity fuzz).

    Samples 24 seeded random sequences over T/Phi/E/P/R/S(int)/SPOILER
    with scalar or batched parameters, runs them through the reference,
    and stores BOTH the op specs (JSON) and the signals: the test suite
    rebuilds the same sequences against epgpy_tpu and compares at 1e-10
    (tests/test_fuzz.py)."""
    import json as _json
    rng = np.random.default_rng(12345)
    specs_all, signals = [], []
    for si in range(36):
        nops = int(rng.integers(6, 18))
        specs = []
        batched = bool(rng.random() < 0.5)
        bshape = [int(rng.integers(2, 4))] if batched else []
        nshift = 0
        for _ in range(nops):
            kind = rng.choice(
                ["T", "E", "P", "R", "Phi", "S", "SPOILER", "ADC"],
                p=[0.22, 0.22, 0.1, 0.08, 0.08, 0.16, 0.04, 0.10])
            if kind == "T":
                alpha = rng.uniform(5, 180, bshape) if batched and rng.random() < 0.5 \
                    else float(rng.uniform(5, 180))
                specs.append({"k": "T", "alpha": np.asarray(alpha).tolist(),
                              "phi": float(rng.uniform(-180, 180))})
            elif kind == "E":
                T2 = rng.uniform(20, 200, bshape) if batched and rng.random() < 0.5 \
                    else float(rng.uniform(20, 200))
                specs.append({"k": "E", "tau": float(rng.uniform(1, 20)),
                              "T1": float(rng.uniform(300, 2000)),
                              "T2": np.asarray(T2).tolist(),
                              "g": float(rng.uniform(-0.05, 0.05))})
            elif kind == "P":
                specs.append({"k": "P", "tau": float(rng.uniform(1, 10)),
                              "g": float(rng.uniform(-0.1, 0.1))})
            elif kind == "R":
                specs.append({"k": "R", "rT": float(rng.uniform(0, 0.3)),
                              "rL": float(rng.uniform(0, 0.3)),
                              "r0": float(rng.uniform(0, 0.3))})
            elif kind == "Phi":
                specs.append({"k": "Phi", "phi": float(rng.uniform(-180, 180))})
            elif kind == "S":
                kk = int(rng.choice([-2, -1, 1, 2]))
                nshift += abs(kk)
                specs.append({"k": "S", "kint": kk})
            else:
                specs.append({"k": kind})
        if not any(sp["k"] == "ADC" for sp in specs):
            specs.append({"k": "ADC"})

        seq = []
        for sp in specs:
            if sp["k"] == "T":
                seq.append(ops.T(np.asarray(sp["alpha"]), sp["phi"]))
            elif sp["k"] == "E":
                seq.append(ops.E(sp["tau"], sp["T1"], np.asarray(sp["T2"]),
                                 g=sp["g"]))
            elif sp["k"] == "P":
                seq.append(ops.P(sp["tau"], sp["g"]))
            elif sp["k"] == "R":
                seq.append(ops.R(sp["rT"], sp["rL"], r0=sp["r0"]))
            elif sp["k"] == "Phi":
                seq.append(ops.Phi(sp["phi"]))
            elif sp["k"] == "S":
                seq.append(ops.S(sp["kint"]))
            elif sp["k"] == "SPOILER":
                seq.append(ops.SPOILER)
            else:
                seq.append(ops.ADC)
        sig = np.asarray(fun.simulate(seq, max_nstate=12))
        specs_all.append(specs)
        signals.append(sig.ravel())

    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, sig in enumerate(signals):
        out[f"sig_re_{i:02d}"] = sig.real
        out[f"sig_im_{i:02d}"] = sig.imag
    return out


def fuzz_diff():
    """Randomized differentiation parity: random trains with tracked
    variables, reference analytic Jacobians vs our jacfwd
    (tests/test_fuzz.py::test_fuzz_diff_parity)."""
    import json as _json
    rng = np.random.default_rng(777)
    specs_all, jacs = [], []
    for si in range(16):
        ntr = int(rng.integers(3, 9))
        use_alias = bool(rng.random() < 0.5)
        specs = {"ntr": ntr, "alias": use_alias,
                 "alphas": rng.uniform(10, 170, ntr).tolist(),
                 "taus": rng.uniform(3, 15, ntr).tolist(),
                 "T1": float(rng.uniform(400, 1800)),
                 "T2": float(rng.uniform(30, 150)),
                 "phi": float(rng.uniform(-90, 90))}
        seq = []
        varnames = ["T1", "T2"]
        for i in range(ntr):
            if use_alias:
                aname = f"a{i}"
                varnames.append(aname) if i < 3 else None
                o1 = {aname: "alpha"} if i < 3 else False
            else:
                o1 = "alpha" if i < 3 else False
            seq += [
                ops.T(specs["alphas"][i], specs["phi"], order1=o1),
                ops.E(specs["taus"][i], specs["T1"], specs["T2"],
                      order1=["T1", "T2"]),
                ops.ADC, ops.S(1),
            ]
        if not use_alias:
            varnames.append("alpha")
        from epgpy import diff as rdiff
        jac = np.asarray(fun.simulate(
            seq, max_nstate=6, probe=rdiff.Jacobian(varnames)))
        specs["vars"] = varnames
        specs_all.append(specs)
        jacs.append(jac)

    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, j in enumerate(jacs):
        out[f"jac_re_{i:02d}"] = j.real
        out[f"jac_im_{i:02d}"] = j.imag
    return out


def fuzz_shift():
    """Randomized n-D / float shift-table parity: mixed int-vector and
    float gridded shifts with T/E interleaved
    (tests/test_fuzz.py::test_fuzz_shift_parity)."""
    import json as _json
    rng = np.random.default_rng(4242)
    specs_all, signals = [], []
    for si in range(20):
        ntr = int(rng.integers(3, 7))
        kdim = int(rng.choice([1, 2, 3]))
        float_ks = bool(rng.random() < 0.6)
        kgrid = float(rng.choice([0.25, 0.5, 1.0])) if float_ks else 1.0
        specs = {"ntr": ntr, "kdim": kdim, "float": float_ks,
                 "kgrid": kgrid, "items": []}
        seq = [ops.T(90, 90)]
        for i in range(ntr):
            if float_ks:
                kv = np.round(rng.uniform(-2.5, 2.5, (1, kdim)), 3)
                while np.allclose(kv, 0):
                    kv = np.round(rng.uniform(-2.5, 2.5, (1, kdim)), 3)
            else:
                kv = rng.integers(-2, 3, (1, kdim))
                while np.all(kv == 0):
                    kv = rng.integers(-2, 3, (1, kdim))
            alpha = float(rng.uniform(15, 160))
            phi = float(rng.uniform(-180, 180))
            tau = float(rng.uniform(2, 12))
            T2 = float(rng.uniform(30, 150))
            specs["items"].append({
                "kv": kv.tolist(), "alpha": alpha, "phi": phi,
                "tau": tau, "T2": T2})
            seq += [ops.S(kv if float_ks else kv.astype(int)),
                    ops.T(alpha, phi), ops.E(tau, 1000.0, T2), ops.ADC]
        sig = np.asarray(fun.simulate(
            seq, max_nstate=200, kgrid=kgrid, probe=["F0", "Z0"]))
        specs_all.append(specs)
        signals.append(sig.ravel())
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, sig in enumerate(signals):
        out[f"sig_re_{i:02d}"] = sig.real
        out[f"sig_im_{i:02d}"] = sig.imag
    return out


def fuzz_prune():
    """Randomized BATCH-VARYING float-shift (shift-prune) trains: each
    atom carries its own per-TR shift magnitude -- the reference's
    shiftprune path (epgpy/shift.py:478-542), our batch-varying dense
    merge (tests/test_fuzz.py::test_fuzz_prune_parity)."""
    import json as _json
    rng = np.random.default_rng(777)
    specs_all, signals = [], []
    for si in range(10):
        ntr = int(rng.integers(3, 7))
        nb = int(rng.integers(2, 6))
        kgrid = float(rng.choice([0.25, 0.5]))
        ks = np.round(rng.uniform(0.4, 2.6, (nb, 1)), 3)
        specs = {"ntr": ntr, "nb": nb, "kgrid": kgrid,
                 "ks": ks.tolist(), "items": []}
        seq = [ops.T(90, 90)]
        for i in range(ntr):
            scale = round(float(rng.uniform(0.8, 1.3)), 3)
            alpha = float(rng.uniform(15, 160))
            phi = float(rng.uniform(-180, 180))
            tau = float(rng.uniform(2, 12))
            T2 = float(rng.uniform(30, 150))
            specs["items"].append({"scale": scale, "alpha": alpha,
                                   "phi": phi, "tau": tau, "T2": T2})
            seq += [ops.S(ks * scale), ops.T(alpha, phi),
                    ops.E(tau, 1000.0, T2), ops.ADC]
        sig = np.asarray(fun.simulate(
            seq, max_nstate=256, kgrid=kgrid, probe=["F0", "Z0"]))
        specs_all.append(specs)
        signals.append(sig.ravel())
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, sig in enumerate(signals):
        out[f"sig_re_{i:02d}"] = sig.real
        out[f"sig_im_{i:02d}"] = sig.imag
    return out


def fuzz_physics():
    """Randomized diffusion / exchange parity: D with scalar + tensor
    diffusivities along int shift trains, X with random 2-compartment
    rates/relaxation (tests/test_fuzz.py::test_fuzz_physics_parity)."""
    import json as _json
    from epgpy import exchange as rexch
    rng = np.random.default_rng(2026)
    specs_all, signals = [], []
    for si in range(20):
        kind = "X" if si % 2 else "D"
        if kind == "D":
            ntr = int(rng.integers(2, 6))
            aniso = bool(rng.random() < 0.5)
            if aniso:
                Dv = np.diag(rng.uniform(0.2, 2.5, 3) * 1e-3)
            else:
                Dv = float(rng.uniform(0.2, 2.5) * 1e-3)
            kvalue = float(rng.uniform(5e3, 5e4))
            items = []
            seq = [ops.T(90, 90)]
            for _ in range(ntr):
                kk = int(rng.choice([-2, -1, 1, 2]))
                alpha = float(rng.uniform(30, 170))
                tau = float(rng.uniform(2, 12))
                items.append({"kint": kk, "alpha": alpha, "tau": tau})
                seq += [ops.S(kk), ops.D(tau, Dv, k=kk), ops.T(alpha, 0),
                        ops.ADC]
            spec = {"kind": "D", "aniso": aniso,
                    "D": np.asarray(Dv).tolist(), "kvalue": kvalue,
                    "items": items}
            sig = np.asarray(fun.simulate(seq, kvalue=kvalue,
                                          probe=["F0", "Z0"]))
        else:
            ntr = int(rng.integers(3, 8))
            k12 = float(rng.uniform(1e-4, 0.05))
            dens = rng.uniform(0.2, 0.8)
            densities = [float(dens), float(1 - dens)]
            T1 = rng.uniform(300, 1800, 2).tolist()
            T2 = rng.uniform(20, 150, 2).tolist()
            g = [0.0, float(rng.uniform(-0.05, 0.05))]
            TRv = float(rng.uniform(5, 20))
            alpha = float(rng.uniform(5, 60))
            khi = rexch.exchange_matrix(k12, axis=-1, ncomp=2,
                                        densities=densities)
            X = ops.X(TRv, khi, axis=-1, T1=T1, T2=T2, g=g)
            seq = []
            for _ in range(ntr):
                seq += [ops.T(alpha, 0), ops.ADC, X, ops.S(1)]
            init = np.array([0, 0, 1.0]) * np.array(densities)[:, None, None]
            sig = np.asarray(fun.simulate(
                seq, max_nstate=8, init=init, density=densities))
            spec = {"kind": "X", "ntr": ntr, "k12": k12,
                    "densities": densities, "T1": T1, "T2": T2, "g": g,
                    "TR": TRv, "alpha": alpha}
        specs_all.append(spec)
        signals.append(sig.ravel())
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, sig in enumerate(signals):
        out[f"sig_re_{i:02d}"] = sig.real
        out[f"sig_im_{i:02d}"] = sig.imag
    return out


def fuzz_modify():
    """Randomized modify() parity: random T/S(duration) trains rewritten
    with T1/T2/g sweeps and B1 attenuation
    (tests/test_fuzz.py::test_fuzz_modify_parity)."""
    import json as _json
    rng = np.random.default_rng(555)
    specs_all, signals = [], []
    for si in range(16):
        ntr = int(rng.integers(3, 8))
        specs = {"ntr": ntr,
                 "alphas": rng.uniform(20, 170, ntr).tolist(),
                 "phis": rng.uniform(-180, 180, ntr).tolist(),
                 "durs": rng.uniform(1, 10, ntr).tolist(),
                 "T1": float(rng.uniform(400, 1800)),
                 "T2": rng.uniform(30, 150, 3).tolist(),
                 "g": (rng.uniform(-0.02, 0.02, 2).tolist()
                       if rng.random() < 0.5 else None),
                 "att": (float(rng.uniform(0.6, 1.2))
                         if rng.random() < 0.5 else None)}
        seq = [ops.T(90, 90)]
        for i in range(ntr):
            seq += [ops.S(1, duration=specs["durs"][i]),
                    ops.T(specs["alphas"][i], specs["phis"][i]),
                    ops.ADC]
        kw = {"T1": specs["T1"], "T2": np.asarray(specs["T2"])}
        if specs["g"] is not None:
            kw["g"] = np.asarray(specs["g"])[None, :]
        if specs["att"] is not None:
            kw["att"] = specs["att"]
        seq = fun.modify(seq, **kw)
        sig = np.asarray(fun.simulate(seq))
        specs_all.append(specs)
        signals.append(sig.ravel())
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, sig in enumerate(signals):
        out[f"sig_re_{i:02d}"] = sig.real
        out[f"sig_im_{i:02d}"] = sig.imag
    return out


def fuzz_time():
    """Randomized accumulated-time (C operator, 4th coordinate) parity:
    random C/S/T/E trains with F0t-weighted readout
    (tests/test_fuzz.py::test_fuzz_time_parity)."""
    import json as _json
    rng = np.random.default_rng(999)
    specs_all, signals = [], []
    for si in range(16):
        ntr = int(rng.integers(3, 7))
        items = []
        seq = [ops.T(90, 90)]
        for _ in range(ntr):
            kind = str(rng.choice(["C", "CS", "CT"]))
            tau = float(rng.uniform(0.5, 4.0))
            r2 = float(rng.uniform(0.05, 0.4))
            alpha = float(rng.uniform(30, 170))
            kint = int(rng.choice([-1, 1]))
            items.append({"kind": kind, "tau": tau, "r2": r2,
                          "alpha": alpha, "kint": kint})
            seq += [ops.C(tau, r2)]
            if kind == "CS":
                seq += [ops.S(kint)]
            elif kind == "CT":
                seq += [ops.T(alpha, 0)]
            seq += [ops.E(2.0, 1000.0, 80.0), ops.ADC]
        specs_all.append({"items": items})
        # Z0 at kdim==4 is a growing masked ladder (not reducible to a
        # stackable scalar in the reference): probe F0 only
        sig = np.asarray(fun.simulate(seq, max_nstate=40, kgrid=0.05,
                                      probe="F0"))
        signals.append(sig.ravel())
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, sig in enumerate(signals):
        out[f"sig_re_{i:02d}"] = sig.real
        out[f"sig_im_{i:02d}"] = sig.imag
    return out


def _expr_tree(rng, depth, vars_):
    """Random expression tree spec; guaranteed to contain a variable."""
    if depth <= 0 or rng.random() < 0.25:
        return ["var", str(rng.choice(vars_))]
    op = str(rng.choice(["add", "sub", "mul", "div", "exp", "sqr"]))
    a = _expr_tree(rng, depth - 1, vars_)
    if op in ("exp", "sqr"):
        return [op, a]
    if rng.random() < 0.3:
        b = ["const", float(np.round(rng.uniform(0.5, 2.5), 3))]
    else:
        b = _expr_tree(rng, depth - 1, vars_)
    return [op, a, b]


def _expr_build(node, V, M):
    """Build an expression from a tree spec with either side's primitives.

    V: name -> Variable; M: math namespace (exp).  Shared by the golden
    generator (reference) and tests/test_fuzz.py (epgpy_tpu)."""
    op = node[0]
    if op == "var":
        return V[node[1]]
    if op == "const":
        return node[1]
    a = _expr_build(node[1], V, M)
    if op == "exp":
        return M.exp(a * (-0.2))
    if op == "sqr":
        return a * a
    b = _expr_build(node[2], V, M)
    if op == "add":
        return a + b
    if op == "sub":
        return a - b
    if op == "mul":
        return a * b
    # div with a guarded denominator (b may be a plain float)
    return a / (b * b + 0.5)


def fuzz_hessian():
    """Randomized order2 parity: reference hand-derived Hessian chain
    rule vs nested jacfwd over random short trains with restricted
    vars1 x vars2 blocks (tests/test_fuzz.py::test_fuzz_hessian_parity)."""
    import json as _json
    from epgpy import diff as rdiff
    rng = np.random.default_rng(60613)
    specs_all, hessians = [], []
    for si in range(12):
        ntr = int(rng.integers(2, 5))
        specs = {"ntr": ntr,
                 "alphas": rng.uniform(20, 160, ntr).tolist(),
                 "taus": rng.uniform(3, 12, ntr).tolist(),
                 "T1": float(rng.uniform(500, 1500)),
                 "T2": float(rng.uniform(40, 120)),
                 "phi": float(rng.uniform(-60, 60))}
        seq = []
        avars = [f"a{i}" for i in range(ntr)]
        # cross pairs must be declared on EVERY op they propagate through
        # (reference cross-term accumulation), hence also on the E ops
        cross = [(a, p) for a in avars for p in ("T1", "T2")]
        import warnings as _warnings
        _warnings.filterwarnings("ignore")
        for i in range(ntr):
            aname = avars[i]
            seq += [
                ops.T(specs["alphas"][i], specs["phi"],
                      order1={aname: "alpha"},
                      order2=[(aname, "T1"), (aname, "T2"),
                              (aname, aname)]),
                ops.E(specs["taus"][i], specs["T1"], specs["T2"],
                      order1=["T1", "T2"],
                      order2=[("T1", "T1"), ("T2", "T2"), ("T1", "T2")]
                      + cross),
                ops.ADC, ops.S(1),
            ]
        vars1 = ["magnitude", "T1", "T2"]
        vars2 = avars + ["T1", "T2"]
        sig, hess = fun.simulate(
            seq, max_nstate=6,
            probe=[rdiff.Jacobian(["T1"]), rdiff.Hessian(vars1, vars2)])
        hess = np.asarray(hess)
        specs_all.append({**specs, "vars1": vars1, "vars2": vars2})
        hessians.append(hess)
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, h in enumerate(hessians):
        out[f"hes_re_{i:02d}"] = h.real
        out[f"hes_im_{i:02d}"] = h.imag
    return out


def fuzz_rfpulse():
    """Randomized shaped-pulse parity: random complex envelopes with
    explicit rf scale (no calibration), slice profiles via modify(g=...)
    (tests/test_fuzz.py::test_fuzz_rfpulse_parity)."""
    import json as _json
    from epgpy import rfpulse as rrf
    import epgpy.functions as rfun
    rng = np.random.default_rng(8080)
    specs_all, signals = [], []
    for si in range(10):
        npts = int(rng.choice([16, 32, 48]))
        x = np.linspace(-2.5, 2.5, npts)
        env = np.sinc(x * rng.uniform(0.5, 1.5)) * np.hamming(npts)
        if rng.random() < 0.5:  # complex envelope (quadratic phase)
            env = env * np.exp(1j * rng.uniform(-1, 1) * x ** 2)
        env = env / np.abs(env).max()
        dur = float(rng.uniform(1.0, 4.0))
        rf = float(rng.uniform(0.05, 0.3))
        nfreq = 9
        freqs = np.linspace(-1.5, 1.5, nfreq)
        pulse = rrf.RFPulse(env, dur, rf=rf)
        seq = rfun.modify([pulse], g=freqs, expand=False)
        sig = np.asarray(rfun.simulate(list(seq) + [ops.ADC]))
        specs_all.append({"env_re": env.real.tolist(),
                          "env_im": env.imag.tolist(),
                          "dur": dur, "rf": rf,
                          "freqs": freqs.tolist()})
        signals.append(sig.ravel())
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, sig in enumerate(signals):
        out[f"sig_re_{i:02d}"] = sig.real
        out[f"sig_im_{i:02d}"] = sig.imag
    return out


def fuzz_expr():
    """Randomized sequence-DSL expression parity: operator arguments are
    random expression trees of shared variables; the reference's symbolic
    chain rule vs our jvp-backed derive
    (tests/test_fuzz.py::test_fuzz_expr_parity)."""
    import json as _json
    from epgpy.sequence import Sequence as RSeq, Variable as RVar
    from epgpy.sequence import math as rmath, operators as rops_v
    rng = np.random.default_rng(31415)
    specs_all, jacs = [], []
    for si in range(14):
        ntr = int(rng.integers(2, 5))
        trees_a = [_expr_tree(rng, 2, ["x", "y"]) for _ in range(ntr)]
        trees_t = [_expr_tree(rng, 2, ["x", "y"]) for _ in range(ntr)]
        vals = {"x": float(rng.uniform(0.5, 3.0)),
                "y": float(rng.uniform(0.5, 3.0))}
        V = {"x": RVar("x"), "y": RVar("y")}
        seq = []
        for i in range(ntr):
            alpha = _expr_build(trees_a[i], V, rmath) * 10 + 20
            tau = _expr_build(trees_t[i], V, rmath) * 0.5 + 2
            seq += [rops_v.T(alpha, 90), rops_v.E(tau, 1000.0, 80.0),
                    "ADC", rops_v.S(1)]
        sig, jac = RSeq(seq).jacobian(["x", "y"])(**vals)
        specs_all.append({"ntr": ntr, "trees_a": trees_a,
                          "trees_t": trees_t, "vals": vals})
        jacs.append(np.asarray(jac))
    out = {"specs_json": np.frombuffer(
        _json.dumps(specs_all).encode(), dtype=np.uint8)}
    for i, j in enumerate(jacs):
        out[f"jac_re_{i:02d}"] = j.real
        out[f"jac_im_{i:02d}"] = j.imag
    return out


def bssfp():
    # IR-prepped phase-alternating balanced SSFP (TrueFISP): no spoiler,
    # the EPG ladder never leaves k=0; off-resonance + B1 atom batch
    npulse = 48
    FAs = 10 + 50 * np.abs(np.sin(np.arange(npulse) / 5.0))
    TRs = 12.0 + (np.arange(npulse) % 3)
    T1s = np.asarray([300.0, 800.0, 1400.0, 1100.0])
    T2s = np.asarray([30.0, 80.0, 110.0, 60.0])
    dfs = np.asarray([0.0, 0.01, -0.02, 0.04])
    B1s = np.asarray([1.0, 0.95, 1.1, 1.05])
    phases = np.cumsum(np.full(npulse, 180.0)) % 360.0
    seq = [ops.T(180 * B1s, 0), ops.E(18.0, T1s, T2s, dfs)]
    for i in range(npulse):
        te = TRs[i] / 2
        seq += [
            ops.T(FAs[i] * B1s, phases[i]),
            ops.E(te, T1s, T2s, dfs), ops.Adc(phase=-phases[i]),
            ops.E(TRs[i] - te, T1s, T2s, dfs),
        ]
    return {"signal": np.asarray(fun.simulate(seq)),
            "FAs": FAs, "TRs": TRs, "T1s": T1s, "T2s": T2s,
            "dfs": dfs, "B1s": B1s, "phases": phases}


def xbssfp():
    """Two-pool balanced EPG-X (bSSFP-MT, Gloor 2008 style): no spoiler
    so the ladder stays at k=0; phase-alternating train, per-TR
    bound-pool saturation, unequal densities, TE/TR-TE exchange split."""
    from epgpy import exchange as rexch

    dens = np.array([0.85, 0.15])
    khi = rexch.exchange_matrix(0.004, axis=0, ncomp=2, densities=dens)
    T1 = [900.0, 400.0]
    T2 = [70.0, 0.02]
    g = [0.003, 0.0]
    n = 36
    TR, TE = 5.0, 2.3
    FAs = 20 + 25 * np.abs(np.sin(np.arange(n) / 4.0))
    phases = (180.0 * np.arange(n)) % 360.0
    W = 0.3  # bound-pool saturation rate x pulse duration (total rate)
    X1 = ops.X(TE, khi, axis=0, T1=T1, T2=T2, g=g)
    X2 = ops.X(TR - TE, khi, axis=0, T1=T1, T2=T2, g=g)
    seq = []
    for i in range(n):
        seq += [ops.R(0, rL=[0.0, W]),
                ops.T(np.array([FAs[i], 0.0]), phases[i]),
                X1, ops.ADC, X2]
    sig = np.asarray(fun.simulate(seq, density=list(dens)))
    return {"signal": sig, "FAs": FAs, "phases": phases}


def mprage():
    # segmented inversion-recovery GRE (MPRAGE): per-segment adiabatic
    # 180 + TI delay, short FISP readout blocks, recovery delay
    T1s = np.array([400.0, 800.0, 1200.0, 1600.0])
    T2s = np.array([40.0, 70.0, 100.0, 130.0])
    seq = []
    for seg in range(4):
        seq += [ops.T(180, 0), ops.E(120.0, T1s, T2s)]
        for i in range(8):
            seq += [ops.T(9.0 + 0.5 * i + seg, 30.0 * i),
                    ops.E(3.0, T1s, T2s), ops.ADC,
                    ops.E(5.5, T1s, T2s), ops.S(1)]
        seq += [ops.E(250.0, T1s, T2s)]
    return {"signal": np.asarray(fun.simulate(seq)),
            "T1s": T1s, "T2s": T2s}


def dw_cpmg():
    """Diffusion-weighted CPMG on the unit-shift grid (Weigel 2010
    diffusion-trap physics; the DW-TSE kernel family's exact pattern):
    [T(exc)] + [E, S(1), D(k=1), T(ref), E, S(1), D(k=1), ADC] * n with
    a physical kvalue setting the b-values."""
    KV = 2 * np.pi / 1e-3          # 1 mm voxel (rad/m per state index)
    T1s = np.array([800.0, 1200.0, 1600.0])
    T2s = np.array([60.0, 90.0, 140.0])
    Dc = 1.2e-3                    # mm^2/s
    tau1, tau2 = 4.0, 4.5
    d1 = ops.D(tau1, Dc, k=1)
    d2 = ops.D(tau2, Dc, k=1)
    seq = [ops.T(90, 90)]
    for i in range(10):
        fa = 100.0 + 4.0 * (i % 5)
        seq += [ops.E(tau1, T1s, T2s), ops.S(1), d1, ops.T(fa, 0),
                ops.E(tau2, T1s, T2s), ops.S(1), d2, ops.ADC]
    sig = np.asarray(fun.simulate(seq, kvalue=KV))
    # tensor-D variant (b00 * sum(D) reduction on the 1-D grid)
    Dt = np.diag([1.5e-3, 0.5e-3, 0.25e-3])
    d1t = ops.D(tau1, Dt, k=1)
    d2t = ops.D(tau2, Dt, k=1)
    seqt = [ops.T(90, 90)]
    for i in range(10):
        fa = 100.0 + 4.0 * (i % 5)
        seqt += [ops.E(tau1, T1s, T2s), ops.S(1), d1t, ops.T(fa, 0),
                 ops.E(tau2, T1s, T2s), ops.S(1), d2t, ops.ADC]
    sigt = np.asarray(fun.simulate(seqt, kvalue=KV))
    return {"signal": sig, "signal_tensor": sigt, "T1s": T1s, "T2s": T2s,
            "kvalue": np.float64(KV)}


def cardiac_mrf():
    # cardiac-MRF-style blocks (Hamilton 2017): T2prep composites
    # (90x - 180y - 180y - 90-x, no gradient) + crusher, B1-scaled FISP
    # readouts, recovery gaps
    T1s = np.array([300.0, 900.0, 1400.0])
    T2s = np.array([35.0, 60.0, 110.0])
    B1s = np.array([0.85, 0.95, 1.05, 1.15])
    # NB the atom (3) and B1 (4) batch sizes differ ON PURPOSE: for
    # EQUAL sizes the reference's append-broadcast right-aligns the
    # (1, B) alpha row onto the existing atom axis (elementwise
    # T2/B1 pairing + a dead appended axis) instead of giving B1 its
    # own axis; with distinct sizes both frameworks agree on the
    # (atom, B1) outer grid.  Also every block starts with a
    # scalar-pulse T2prep whose E ops establish the atom batch before
    # the first vector flip.
    eco = [12.0, 24.0, 12.0]
    seq = []
    for blk in range(3):
        scale = blk + 1.0
        seq += [ops.T(90, 0), ops.E(eco[0] * scale, T1s, T2s),
                ops.T(180, 90), ops.E(eco[1] * scale, T1s, T2s),
                ops.T(180, 90), ops.E(eco[2] * scale, T1s, T2s),
                ops.T(90, 180), ops.S(1)]
        for i in range(10):
            fa = (12.0 + i + 2.0 * blk) * B1s[None, :]
            seq += [ops.T(fa, 15.0 * i), ops.E(2.5, T1s, T2s), ops.ADC,
                    ops.E(6.0, T1s, T2s), ops.S(1)]
        seq += [ops.E(180.0, T1s, T2s)]
    return {"signal": np.asarray(fun.simulate(seq)),
            "T1s": T1s, "T2s": T2s, "B1s": B1s}

def xgre_parity():
    """Spoiled MT-GRE at thermal equilibrium: the xgre kernel family's
    exact pattern ([R(sat), T, ADC, X, S(1)] * N with density) -- the
    exchange_gre golden uses a custom init, which the fused dispatch
    rejects, so bench.py's per-family TPU parity probe needs this one
    (reference anchor epgpy/exchange.py:89-120)."""
    from epgpy import exchange as rexch
    from epgpy import evolution as rev
    NTR, B = 20, 4
    T2f = np.linspace(40.0, 120.0, B)
    T2 = np.stack([T2f, np.full(B, 0.012)], axis=0)
    khi = rexch.exchange_matrix(0.005, densities=[0.8, 0.2])
    X = rexch.X(10.0, khi, axis=0, T1=np.asarray([1000.0, 1000.0]),
                T2=T2)
    sat = rev.R(0, rL=np.asarray([0.0, 2.5]), r0=None)
    seq = []
    for _ in range(NTR):
        seq += [sat, ops.T(np.asarray([10.0, 0.0]), 0), ops.ADC, X,
                ops.S(1)]
    sig = np.asarray(fun.simulate(seq, max_nstate=10,
                                  density=[0.8, 0.2]))
    return {"signal": sig}


def xcomp_gre():
    """Segmented MT-prepped spoiled GRE: the composite EPG-X
    stage-train family's pattern ([R(sat), X(recovery)] preps +
    [T, X, ADC, X, S(1)] readout segments + recovery delays) for
    bench.py's xcomp parity probe."""
    from epgpy import exchange as rexch
    from epgpy import evolution as rev
    B = 4
    dens = [0.85, 0.15]
    khi = rexch.exchange_matrix(0.005, ncomp=2, densities=dens)
    T2f = np.linspace(50.0, 110.0, B)
    T2 = np.stack([T2f, np.full(B, 0.012)], axis=0)
    T1p = np.array([1000.0, 1100.0])
    Xte = rexch.X(3.0, khi, axis=0, T1=T1p, T2=T2)
    Xtr = rexch.X(7.0, khi, axis=0, T1=T1p, T2=T2)
    Xrec = rexch.X(150.0, khi, axis=0, T1=T1p, T2=T2)
    sat = rev.R(0, rL=np.asarray([0.0, 0.3]), r0=None)
    seq = []
    for seg in range(3):
        seq += [sat, Xrec]
        for i in range(6):
            seq += [ops.T(np.asarray([8.0 + i + seg, 0.0]), 0.0),
                    Xte, ops.ADC, Xtr, ops.S(1)]
        seq += [Xrec]
    sig = np.asarray(fun.simulate(seq, max_nstate=8, density=dens))
    return {"signal": sig}


CASES = {
    "mprage": mprage,
    "xgre_parity": xgre_parity,
    "xcomp_gre": xcomp_gre,
    "cardiac_mrf": cardiac_mrf,
    "bssfp": bssfp,
    "xbssfp": xbssfp,
    "cpmg": cpmg,
    "dw_cpmg": dw_cpmg,
    "press": press,
    "fuzz": fuzz,
    "fuzz_diff": fuzz_diff,
    "fuzz_shift": fuzz_shift,
    "fuzz_prune": fuzz_prune,
    "fuzz_physics": fuzz_physics,
    "fuzz_modify": fuzz_modify,
    "fuzz_time": fuzz_time,
    "fuzz_expr": fuzz_expr,
    "fuzz_rfpulse": fuzz_rfpulse,
    "fuzz_hessian": fuzz_hessian,
    "rare_diffusion": rare_diffusion,
    "ssfp_dwi": ssfp_dwi,
    "gre2d": gre2d,
    "spgr": spgr,
    "t2star": t2star,
    "dess": dess,
    "megre": megre,
    "shift_prune": shift_prune,
    "rfpulse_profile": rfpulse_profile,
    "imaging_probe": imaging_probe,
    "mt_rates": mt_rates,
    "mse_b1": mse_b1,
    "fisp_mrf": fisp_mrf,
    "shift3d_diffusion": shift3d_diffusion,
    "diffusion_se": diffusion_se,
    "exchange_gre": exchange_gre,
    "shift_merge": shift_merge,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    names = sys.argv[1:] or list(CASES)
    for name in names:
        data = CASES[name]()
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, **data)
        print(f"wrote {path}: " + ", ".join(f"{k}{v.shape}" for k, v in data.items()))


if __name__ == "__main__":
    main()
