"""MRF Hessian at flagship scale through the sequence DSL.

Same computation as profiling_differentiation_mrf.py -- a 400-TR FISP
train, Hessian w.r.t. (magnitude, T1, T2) x (400 alpha + 400 TR) -- but
built with the symbolic layer: string variables, `repeat` cloning the TR
block with per-repetition variable names, and `Sequence.hessian`
returning a callable over variable-value dicts.  Behavioral parity:
reference examples/profiling/differentiation_mrf_seq.py.

Env knobs: MRF_NTR (default 400), MRF_CHUNK (default 100), MRF_CPU.
"""

import json
import os
import time

import numpy as np

import jax

if os.environ.get("MRF_CPU"):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

from epgpy_tpu.sequence import Sequence, operators, repeat  # noqa: E402

nTR = int(os.environ.get("MRF_NTR", 400))
CHUNK = int(os.environ.get("MRF_CHUNK", 100))
T1, T2 = 1380.0, 80.0


def main():
    alphas = [f"alpha_{i:03d}" for i in range(nTR)]
    TRs = [f"TR_{i:03d}" for i in range(nTR)]

    adc = operators.ADC
    spl = operators.S(1)
    rf = operators.T("alpha", 90)
    rlx = operators.E("TR", "T1", "T2")
    seq = Sequence(repeat([rf, rlx, adc, spl], alpha=alphas, TR=TRs))

    rng = np.random.default_rng(0)
    values_alphas = dict(zip(alphas, rng.uniform(10, 60, nTR)))
    values_TRs = dict(zip(TRs, rng.uniform(11, 16, nTR)))

    hessfunc = seq.hessian(
        ["magnitude", "T1", "T2"], alphas + TRs,
        options={"max_nstate": 10, "jacobian_chunk": CHUNK},
    )

    print(f"Simulate MRF sequence via DSL (nTR={nTR})")
    tic = time.time()
    sig, jac, hess = hessfunc({**values_alphas, **values_TRs}, T1=T1, T2=T2)
    toc = time.time()
    print(f"Done. Duration: {toc - tic:.1f}s  hessian block: {hess.shape}")
    assert hess.shape == sig.shape + (3, 2 * nTR)

    # cross-check a Hessian entry against the direct-operator variant
    import epgpy_tpu as epg
    va = np.asarray([values_alphas[a] for a in alphas])
    vt = np.asarray([values_TRs[t] for t in TRs])
    seq_direct = []
    for i in range(nTR):
        seq_direct += [
            epg.T(va[i], 90, order1={alphas[i]: "alpha"}),
            epg.E(vt[i], T1, T2,
                  order1={"T1": "T1", "T2": "T2", TRs[i]: "tau"}),
            epg.ADC, epg.S(1),
        ]
    _, hes_d = epg.simulate(
        seq_direct, max_nstate=10, jacobian_chunk=CHUNK,
        probe=[epg.ADC, epg.Hessian(["magnitude", "T1", "T2"],
                                    alphas + TRs)])
    # DSL output: (batch, nADC, n1, n2); direct: (nADC, batch, n1, n2)
    err = np.abs(np.asarray(hess).squeeze()
                 - np.asarray(hes_d).squeeze()).max()
    print(f"DSL vs direct-operator Hessian: max delta {err:.2e}")
    assert err < 1e-9, err

    print(json.dumps({
        "metric": "mrf_hessian_seq_seconds", "value": round(toc - tic, 1),
        "unit": "s", "nTR": nTR, "nvars": 2 * nTR + 2,
        "jacobian_chunk": CHUNK, "dsl_vs_direct": float(err),
    }))


if __name__ == "__main__":
    main()
