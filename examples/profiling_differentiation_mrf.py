"""MRF Hessian at reference flagship scale.

Mirrors reference examples/profiling/differentiation_mrf.py:18-67: a
400-TR FISP MRF train [T, E, ADC, S], Hessian of the signal w.r.t.
(magnitude, T1, T2) x (400 per-pulse alpha + 400 per-TR tau) = 3 x 800
block, max_nstate=10.

Here the reference's hand-derived operator chain rule becomes nested
jacfwd through the compiled scan; ``jacobian_chunk`` bounds tangent
memory by processing the 802-variable basis (and the vars1 x vars2
Hessian block) in fixed-width tiles, each a call of ONE compiled program
with a traced column offset (see epgpy_tpu/diff.py:simulate_diff).

Env knobs: MRF_NTR (default 400), MRF_CHUNK (default 100).
"""

import json
import os
import time

import numpy as np

import jax

# profiling runs on whatever the default device is; pin CPU explicitly
# only when requested (the TPU tunnel serializes jobs)
if os.environ.get("MRF_CPU"):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import epgpy_tpu as epg  # noqa: E402

nTR = int(os.environ.get("MRF_NTR", 400))
CHUNK = int(os.environ.get("MRF_CHUNK", 100))
T1, T2 = 1380.0, 80.0

alphas = [f"alpha_{i:03d}" for i in range(nTR)]
TRs = [f"tau_{i:03d}" for i in range(nTR)]

rng = np.random.default_rng(0)
values_alphas = rng.uniform(10, 60, nTR)
values_TRs = rng.uniform(11, 16, nTR)


def sequence(angles, times):
    seq = []
    for i in range(nTR):
        seq += [
            epg.T(angles[i], 90, order1={alphas[i]: "alpha"}),
            epg.E(times[i], T1, T2,
                  order1={"T1": "T1", "T2": "T2", TRs[i]: "tau"}),
            epg.ADC,
            epg.S(1),
        ]
    return seq


def main():
    hes_probe = epg.Hessian(["magnitude", "T1", "T2"], alphas + TRs)
    jac_probe = epg.Jacobian(["magnitude", "T1", "T2"])

    print(f"Simulate MRF sequence (nTR={nTR}, vars={2 * nTR + 2}, "
          f"jacobian_chunk={CHUNK})")
    tic = time.time()
    sig, jac, hes = epg.simulate(
        sequence(values_alphas, values_TRs),
        probe=[epg.ADC, jac_probe, hes_probe],
        max_nstate=10,
        jacobian_chunk=CHUNK,
    )
    toc = time.time()
    assert hes.shape == sig.shape + (3, 2 * nTR)
    print(f"Done. Duration: {toc - tic:.1f}s  "
          f"hessian block: {hes.shape}")

    # FD spot-check: d2 signal / dT2 dalpha_5 via FD of the alpha-jacobian
    eps = 1e-4

    def jac_alpha5(T2x):
        seqv = []
        for i in range(nTR):
            seqv += [
                epg.T(values_alphas[i], 90, order1={alphas[i]: "alpha"}),
                epg.E(values_TRs[i], T1, T2x), epg.ADC, epg.S(1),
            ]
        _, j = epg.simulate(seqv, max_nstate=10,
                            probe=[epg.ADC, epg.Jacobian([alphas[5]])])
        return j[..., 0]

    fd = (jac_alpha5(T2 + eps) - jac_alpha5(T2 - eps)) / (2 * eps)
    err = np.abs(hes[..., 2, 5] - fd).max()
    print(f"FD check d2/dT2 dalpha_005: {err:.2e}")
    assert err < 1e-5, err

    print(json.dumps({
        "metric": "mrf_hessian_seconds", "value": round(toc - tic, 1),
        "unit": "s", "nTR": nTR, "nvars": 2 * nTR + 2,
        "jacobian_chunk": CHUNK, "fd_err": float(err),
        "device": str(jax.config.jax_default_device or jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
