"""Hyperecho with random 1-D / 2-D / 3-D gradients + EPG diagrams.

Behavioral parity: reference examples/basics/hyperecho3d.py.  The 2-D and
3-D diagrams color-code the off-axis k coordinates (plasma ramp for one
axis, HSV wheel for two; see utils/plotting.k_colors_1d/2d) with an inset
legend -- the n-D analog of the reference's cm1d/cm2d rendering
(reference epgpy/plotting.py:231-295).
"""

import numpy as np

import epgpy_tpu as epg
from epgpy_tpu.utils import plotting


def hyperecho_seq(grads_fwd, grads_bwd):
    rf1, rf2, rfc = epg.T(30, 0), epg.T(-30, 0), epg.T(180, 0)
    return ([[rf1, g] for g in grads_fwd] + [rfc]
            + [[g, rf2] for g in grads_bwd] + [epg.ADC])


def main():
    rng = np.random.default_rng(7)
    ks = rng.uniform(-5, 5, (5, 3))

    figs = []
    for dim, tag in ((1, "1d"), (2, "2d"), (3, "3d")):
        if dim == 1:
            fwd = [epg.S(float(k[0]), duration=1) for k in ks]
            bwd = [epg.S(float(k[0]), duration=1) for k in ks[::-1]]
        else:
            fwd = [epg.S(k[None, :dim].copy(), duration=1) for k in ks]
            bwd = [epg.S(k[None, :dim].copy(), duration=1) for k in ks[::-1]]
        seq = hyperecho_seq(fwd, bwd)
        # no excitation pulse: the hyperecho returns the magnetization to
        # its initial state, i.e. Z0 -> 1 (F stays dephased/refocused away)
        z0 = np.asarray(epg.simulate(seq, kgrid=0.01, max_nstate=400,
                                     probe="Z0"))
        print(f"{tag}: |Z0| at hyperecho = {np.abs(z0).max():.6f}")
        assert np.abs(z0).max() > 0.999, "hyperecho must refocus"
        try:
            fig = plotting.plot_epg(
                seq, kgrid=0.01,
                title=f"Hyper-echo sequence (random {tag} gradients)",
                figname=f"hyperecho-{tag}")
            fig.savefig(f"hyperecho_{tag}.png", dpi=110)
            figs.append(tag)
        except ImportError:
            pass
    if figs:
        print("saved:", ", ".join(f"hyperecho_{t}.png" for t in figs))


if __name__ == "__main__":
    main()
