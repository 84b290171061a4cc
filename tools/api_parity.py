"""Automated public-API parity audit against the reference epgpy.

Walks every public symbol the reference exports (top level + the
subsystem modules) and resolves each one to its epgpy_tpu counterpart:
same name in the mapped module, a documented rename, or a documented
redesign.  Exits nonzero if anything is unaccounted for — run under
pytest via tests/test_api_parity.py so API regressions fail CI.

Usage: python tools/api_parity.py [-v]
"""

from __future__ import annotations

import importlib
import os
import sys

REF_PATH = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# reference module -> our counterpart module
MODULE_MAP = {
    "epgpy": "epgpy_tpu",
    "epgpy.sequence": "epgpy_tpu.sequence",
    "epgpy.stats": "epgpy_tpu.stats",
    "epgpy.plotting": "epgpy_tpu.utils.plotting",
    "epgpy.pulseio": "epgpy_tpu.utils.pulseio",
    "epgpy.magnettransfer": "epgpy_tpu.utils.magnettransfer",
    "epgpy.rfpulse": "epgpy_tpu.ops.rfpulse",
    "epgpy.utilities.ilt1d": "epgpy_tpu.utils.ilt1d",
}

# accidental re-exports in the reference (stdlib / third-party / own
# submodules) that are not API surface
JUNK = {
    "np", "sys", "enum", "math", "re", "csv", "pathlib", "plt",
    "gridspec", "optimize", "logging", "LOGGER", "annotations",
    # reference-internal submodule handles re-exported by `import X`
    "common", "core", "operator", "operators", "functions", "utils",
    "statematrix", "rfpulse", "probe", "shift", "diff", "diffusion",
    "evolution", "exchange", "transition", "opscalar", "opmatrix",
    "epg", "imaging", "dft",
}

# documented renames / redesigns: (ref_module, name) -> (our dotted
# path or None, note).  None = capability exists but deliberately has
# no standalone symbol; the note says where it lives.
RESOLUTIONS = {
    ("epgpy", "NAX"): ("epgpy_tpu.NAX", "same constant (np.newaxis)"),
    ("epgpy.plotting", "cm1d"): (
        "epgpy_tpu.utils.plotting.k_colors_1d", "renamed"),
    ("epgpy.plotting", "cm2d"): (
        "epgpy_tpu.utils.plotting.k_colors_2d", "renamed"),
    ("epgpy.plotting", "colorbar1d"): (
        "epgpy_tpu.utils.plotting._add_k_colorbar",
        "plot_epg adds k-colorbars automatically (internal helper)"),
    ("epgpy.plotting", "colorbar2d"): (
        "epgpy_tpu.utils.plotting._add_k_colorbar",
        "plot_epg adds k-colorbars automatically (internal helper)"),
    ("epgpy.plotting", "get_shift"): (
        "epgpy_tpu.utils.plotting._get_shift",
        "internal helper of plot_epg"),
    ("epgpy.sequence", "Null"): (
        "epgpy_tpu.NULL",
        "DSL accepts the 'NULL' string op (sequence.STR_OPERATORS)"),
    ("epgpy.utilities.ilt1d", "qcr"): (
        "epgpy_tpu.utils.ilt1d.quasi_continuous", "renamed"),
    ("epgpy.utilities.ilt1d", "tsvd"): (
        "epgpy_tpu.utils.ilt1d._tsvd",
        "internal step of the matrix-pencil solve"),
    ("epgpy.magnettransfer", "cubic_interp1d"): (
        None,
        "absorption_rate uses scipy CubicSpline directly; no "
        "standalone interp helper (epgpy_tpu/utils/magnettransfer.py)"),
    ("epgpy", "set_array_module"): (
        "epgpy_tpu.set_array_module",
        "compat shim: numpy/cupy switch redesigned into config dtype "
        "policy (docs/DESIGN.md)"),
    ("epgpy", "get_array_module"): (
        "epgpy_tpu.get_array_module", "compat shim, see above"),
}


def _resolve(path):
    mod_name, _, attr = path.rpartition(".")
    try:
        mod = importlib.import_module(mod_name)
    except ImportError:
        return False
    return hasattr(mod, attr)


def audit(verbose=False):
    """Returns (covered, mapped, missing) lists of dotted ref names."""
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    covered, mapped, missing = [], [], []
    for ref_name, ours_name in MODULE_MAP.items():
        ref = importlib.import_module(ref_name)
        ours = importlib.import_module(ours_name)
        for name in sorted(dir(ref)):
            if name.startswith("_") or name in JUNK:
                continue
            val = getattr(ref, name)
            if type(val).__name__ == "module":
                continue
            label = f"{ref_name}.{name}"
            if (ref_name, name) in RESOLUTIONS:
                target, note = RESOLUTIONS[(ref_name, name)]
                if target is None or _resolve(target):
                    mapped.append((label, target, note))
                    if verbose:
                        print(f"  mapped  {label} -> {target} ({note})")
                else:
                    missing.append(label + f" (broken mapping {target})")
                continue
            if hasattr(ours, name) or hasattr(
                    importlib.import_module("epgpy_tpu"), name):
                covered.append(label)
                if verbose:
                    print(f"  ok      {label}")
            else:
                missing.append(label)
    return covered, mapped, missing


def main():
    verbose = "-v" in sys.argv
    covered, mapped, missing = audit(verbose)
    print(f"API parity: {len(covered)} same-name, {len(mapped)} "
          f"documented renames/redesigns, {len(missing)} missing")
    for m in missing:
        print(f"  MISSING {m}")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
