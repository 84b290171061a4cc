"""EPG sequence diagrams (RF / gradient lanes + k-state trajectory).

Host-side visualization (matplotlib), semantics target: reference
epgpy/plotting.py plot_epg -- the diagram is produced by actually
simulating the sequence (eager mode) and drawing each state's k-path,
with line alpha/width scaled by state magnitude.
"""

from __future__ import annotations

import numpy as np

from .. import engine, statematrix
from ..ops import probe as probe_mod, shift as shift_mod, transition

__all__ = ["plot_epg", "show"]


def show():
    from matplotlib import pyplot as plt
    plt.show()


def _get_shift(op, kvalue):
    """Physical shift vector of an S/G/C operator (first batch element)."""
    if isinstance(op.k, int):
        return np.asarray([op.k * kvalue])
    karr = np.atleast_2d(np.asarray(op.k, float)).reshape(-1, np.shape(op.k)[-1])
    return karr[0] * kvalue


def plot_epg(seq, *, kvalue=1, kgrid=None, yaxis=0, ops="S,T,E", title=None,
             figname=None, calpha=0.5, cwidth=0):
    """Plot RF/gradient timing lanes and the EPG k-state diagram.

    Returns the matplotlib figure.
    """
    from matplotlib import pyplot as plt
    import matplotlib.gridspec as gridspec

    seq = engine.flatten_sequence(seq)
    kdim = min(engine.getkdim(seq), 3)
    opnames = set(ops.split(","))

    nshift = engine.getnshift(seq)
    sm = statematrix.StateMatrix(nstate=max(nshift, 1), kgrid=kgrid)
    sm = engine._setup_table(sm, seq)

    fig = plt.figure(figname, figsize=(8, 6))
    gs = gridspec.GridSpec(3, 1, figure=fig, height_ratios=(1, kdim, 6))
    ax_rf = fig.add_subplot(gs[0, 0])
    gs_grad = gridspec.GridSpecFromSubplotSpec(kdim, 1, subplot_spec=gs[1, 0])
    ax_grad = [fig.add_subplot(gs_grad[i, 0]) for i in range(kdim)]
    ax_epg = fig.add_subplot(gs[2, 0])

    yax = int(np.arange(kdim)[yaxis])
    index0 = lambda arr, nb: np.asarray(arr)[(0,) * nb]

    now = 0.0
    for op in seq:
        prev, now = now, now + float(np.max(np.asarray(op.duration)))

        if isinstance(op, transition.T):
            # RF stem
            alpha = float(np.ravel(np.asarray(op.alpha))[0])
            ax_rf.plot([prev, prev], [0, alpha], color="C3")
            ax_rf.plot(prev, alpha, "v" if alpha < 0 else "^", color="C3", ms=4)

        name = type(op).__name__
        if not (name in opnames or isinstance(op, probe_mod.Probe)):
            continue

        if isinstance(op, shift_mod.S):
            shiftvec = np.zeros(kdim)
            sv = _get_shift(op, kvalue)
            shiftvec[: min(len(sv), kdim)] = sv[:kdim]
            for i in range(kdim):
                ax_grad[i].fill_between([prev, now], [shiftvec[i]] * 2,
                                        color="gray", alpha=0.3)
            # EPG lines: each state's k moves by shiftvec over [prev, now]
            ks_before = index0(sm.k, sm.k.ndim - 2)
            sm = op(sm)
            F = index0(sm.F, sm.F.ndim - 1)
            ks = index0(sm.k, sm.k.ndim - 2)
            for i in range(ks.shape[0]):
                mag = min(float(np.abs(F[i])), 1.0)
                if mag < 1e-6:
                    continue
                y0 = float(ks[i, yax] - shiftvec[yax])
                y1 = float(ks[i, yax])
                ax_epg.plot([prev, now], [y0, y1], color="k",
                            alpha=max(mag ** calpha, 0.05),
                            lw=1 + cwidth * mag)
        elif isinstance(op, probe_mod.Probe):
            ax_epg.axvline(now, color="C0", ls=":", alpha=0.6)
        else:
            sm = op(sm)
            # horizontal segments (relaxation: k constant)
            F = index0(sm.F, sm.F.ndim - 1)
            ks = index0(sm.k, sm.k.ndim - 2)
            if now > prev:
                for i in range(ks.shape[0]):
                    mag = min(float(np.abs(F[i])), 1.0)
                    if mag < 1e-6:
                        continue
                    y = float(ks[i, yax])
                    ax_epg.plot([prev, now], [y, y], color="k",
                                alpha=max(mag ** calpha, 0.05),
                                lw=1 + cwidth * mag)

    ax_epg.axhline(0, color="C0", lw=0.5)
    ax_epg.set_xlabel("time (ms)")
    ax_epg.set_ylabel(f"k (axis {yax})")
    ax_rf.set_ylabel("RF (deg)")
    for i, ax in enumerate(ax_grad):
        ax.set_ylabel(f"G{'xyz'[i]}")
        ax.set_xticks([])
    ax_rf.set_xticks([])
    if title:
        fig.suptitle(title)
    return fig
