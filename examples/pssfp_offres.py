"""MRF-pSSFP off-resonance sensitivity via spatially-resolved EPG.

Gao 2021 ("Three-dimensional spatially resolved phase graph framework",
part 3.1): a pSSFP train in a static off-resonance gradient is simulated
with *float* wavenumber shifts on a quantization grid (shift-merge), and
the spectrum recovered by DFT of the F-state ladder is compared against a
per-frequency Bloch reference (E with g=offres sweep).  Behavioral parity:
reference examples/gradient/mrf_pssfp_offres_sensitivity.py.

Static-shape notes vs the reference: the k-state count is a fixed capacity
(max_nstate) rather than a dynamically growing list, so the "burden" study
becomes a (kgrid, capacity) accuracy trade-off; the convergence loop below
shrinks kgrid until the spectrum stops changing, as in the reference.
"""

import os
import time

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.utils import helpers, imaging

NRF = int(os.environ.get("PSSFP_NRF", 50))
NPOS = int(os.environ.get("PSSFP_NPOS", 501))
MAX_ITER = int(os.environ.get("PSSFP_ITERS", 4))
MAX_NSTATE = int(os.environ.get("PSSFP_NSTATE", 8192))
TOL = float(os.environ.get("PSSFP_TOL", 0.05))


def pssfp_schedule(nrf, tr_ssfp=10.0, seed=0):
    """pSSFP (FA, TE, TR) trains: half-angle splitting with TE/TR chosen so
    consecutive half-pulses see matched transverse phase (Gao 2021 eq. 3.1
    setup; reference example lines 30-56)."""
    rng = np.random.default_rng(seed)
    fa0 = (10 + np.sin(2 * np.pi * np.linspace(1, 250, nrf) * 1e-3) * 50
           + rng.uniform(-8.66, 8.66, nrf))
    FA, TE, TR = [fa0[0] / 2], [0.0], []
    for i in range(1, nrf):
        fa = fa0[i] / 2 + fa0[i - 1] / 2
        c = np.sin(np.radians(fa0[i - 1] / 2)) / np.sin(np.radians(fa0[i] / 2))
        if c < 1:
            tr = tr_ssfp / 2 + TE[-1]
            te = (tr - TE[-1]) * c
        else:
            te = tr_ssfp / 2
            tr = te / c + TE[-1]
        FA.append(fa)
        TE.append(te)
        TR.append(tr)
    TR.append(tr_ssfp)
    return np.asarray(FA), np.asarray(TE), np.asarray(TR)


def main():
    gamma = helpers.gamma_1H  # kHz/T == Hz/mT
    fov = 0.128  # m
    freq = 100.0  # Hz at fov/2
    grad = freq / (fov / 2) / gamma  # mT/m
    pos = np.linspace(-0.5, 0.5, NPOS) * fov  # m
    offres = helpers.space_to_freq(grad, pos * 1e3)  # kHz
    T1, T2 = 1084.0, 68.0

    FA, TE, TR = pssfp_schedule(NRF)
    # wavenumbers accumulated before/after each echo (rad/m)
    k1 = [helpers.get_wavenumber(grad, TE[i]) for i in range(NRF)]
    k2 = [helpers.get_wavenumber(grad, TR[i] - TE[i]) for i in range(NRF)]

    rf = [epg.T(FA[i], 180.0 * (i % 2)) for i in range(NRF)]
    # EPG: rf, shift+relax to TE, ADC, shift+relax to end of TR
    seq = []
    for i in range(NRF):
        block = [rf[i]]
        if i > 0:
            block += [epg.S(float(k1[i])), epg.E(TE[i], T1, T2)]
        block += [epg.ADC, epg.S(float(k2[i])), epg.E(TR[i] - TE[i], T1, T2)]
        seq.append(block)

    # Bloch reference: no gradient shifts, per-position off-resonance sweep
    seqr = []
    for i in range(NRF):
        block = [rf[i]]
        if i > 0:
            block += [epg.E(TE[i], T1, T2, g=offres)]
        block += [epg.ADC, epg.E(TR[i] - TE[i], T1, T2, g=offres)]
        seqr.append(block)
    sig_ref = np.asarray(epg.simulate(seqr))[-1].squeeze()

    # converge the merge grid: shrink kgrid until the spectrum is stable
    kg, shrink = 20.0, 0.2
    sims, errors, prev = {}, {}, None
    for it in range(MAX_ITER):
        tic = time.time()
        F, k = epg.simulate(seq, kgrid=kg, max_nstate=MAX_NSTATE,
                            probe=("F", "k"))
        dt = time.time() - tic
        # spectrum: DFT of the final F ladder at each position
        sig = np.asarray(imaging.dft(pos[:, None], F[-1], k[-1])).squeeze()
        err = np.linalg.norm(sig - sig_ref) / np.linalg.norm(sig_ref)
        sims[kg], errors[kg] = sig, err
        print(f"iter {it}: kgrid={kg:.3g} rad/m, vs-Bloch error={err:.4f}, "
              f"{dt:.1f} s")
        if prev is not None:
            diff = np.linalg.norm(sig - sims[prev]) / np.linalg.norm(sig)
            if diff < 1e-2:
                break
        prev = kg
        kg *= shrink

    best = min(errors, key=errors.get)
    print(f"best kgrid={best:.3g}: error vs Bloch = {errors[best]:.4f}")
    assert errors[best] < TOL, "spatially-resolved EPG must match Bloch"

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(1, 2, figsize=(11, 4), num="pssfp")
    wfreqs = offres * 2 * np.pi * 1e3  # rad/s
    for kgv in sorted(sims)[::-1]:
        axes[0].plot(wfreqs, np.abs(sims[kgv]), label=f"Kg={kgv:.2g} rad/m")
    axes[0].plot(wfreqs, np.abs(sig_ref), "k:", label="Bloch reference")
    axes[0].set(xlabel="off-resonance (rad/s)", ylabel="|signal| (a.u.)",
                title="pSSFP spectrum")
    axes[0].legend(fontsize=7)
    axes[1].loglog(sorted(errors), [errors[kk] for kk in sorted(errors)], "o-")
    axes[1].set(xlabel="kgrid (rad/m)", ylabel="relative error vs Bloch",
                title="merge-grid accuracy")
    fig.suptitle("MRF-pSSFP off-resonance sensitivity (float shift-merge)")
    fig.tight_layout()
    fig.savefig("pssfp_offres.png", dpi=110)
    print("saved: pssfp_offres.png")


if __name__ == "__main__":
    main()
