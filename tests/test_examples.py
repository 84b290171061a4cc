"""Smoke-run the cheap examples end-to-end (CPU backend, no plotting).

The examples are the behavioral spec surface users copy from (reference
keeps 3,400 LoC of them); each must stay runnable as the API evolves.
Heavier examples (mrf_dictionary, sequence_optimization) are exercised
by their own unit tests and the benchmark.
"""

import runpy
import sys
import pathlib

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"


def _run(name, monkeypatch, tmp_path):
    # examples save .png when matplotlib exists: run inside tmp_path
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [name])
    runpy.run_path(str(EXAMPLES / name), run_name="__main__")


@pytest.mark.parametrize("name", [
    "basics_mse.py",
    "hyperecho.py",
    "rf_spoiling.py",
    "t2star_imaging.py",
    "diffusion_exchange.py",
    "epg_diagrams.py",
])
def test_example_smoke(name, monkeypatch, tmp_path):
    _run(name, monkeypatch, tmp_path)


def test_mt_qmt_mapping_smoke(monkeypatch, tmp_path):
    """qMT dictionary mapping over (bound fraction, free T2): recovered
    values must land on the nearest grid points (asserted inside)."""
    monkeypatch.setenv("QMT_NTR", "40")
    monkeypatch.setenv("QMT_NT2", "16")
    _run("mt_qmt_mapping.py", monkeypatch, tmp_path)


@pytest.mark.slow
def test_optim_tse_smoke(monkeypatch, tmp_path):
    """SAR-constrained variable-flip TSE CRLB design (fused per-echo
    CPMG design kernel); constraint satisfaction + improvement over
    the constant-flip train asserted inside."""
    monkeypatch.setenv("TSE_NECHO", "12")
    monkeypatch.setenv("TSE_ITERS", "40")
    _run("optim_tse.py", monkeypatch, tmp_path)


def test_mprage_t1_mapping_smoke(monkeypatch, tmp_path):
    """MPRAGE dictionary T1 mapping (composite-GRE family): nearest-
    grid recovery with randomized T2/PD asserted inside."""
    monkeypatch.setenv("MPRAGE_NT1", "48")
    monkeypatch.setenv("MPRAGE_NVOX", "16")
    monkeypatch.setenv("MPRAGE_NSEG", "4")
    monkeypatch.setenv("MPRAGE_NREAD", "12")
    monkeypatch.setenv("MPRAGE_ITERS", "3")
    _run("mprage_t1_mapping.py", monkeypatch, tmp_path)


def test_cardiac_mrf_t1t2_smoke(monkeypatch, tmp_path):
    """Prepared cardiac-MRF blocks (composite family): dictionary match
    + GN refinement on the fused composite-Jacobian dispatch; halved
    RMSE asserted inside the example."""
    monkeypatch.setenv("CMRF_NBEAT", "6")
    monkeypatch.setenv("CMRF_NREAD", "12")
    monkeypatch.setenv("CMRF_NT1", "12")
    monkeypatch.setenv("CMRF_NT2", "8")
    monkeypatch.setenv("CMRF_NVOX", "12")
    monkeypatch.setenv("CMRF_ITERS", "5")
    _run("cardiac_mrf_t1t2.py", monkeypatch, tmp_path)


def test_dess_t1t2_mapping_smoke(monkeypatch, tmp_path):
    """Joint T1+T2 GN fit from both DESS echoes (fused Jacobian
    kernel); recovery RMSE asserted inside the example."""
    monkeypatch.setenv("DESS_NVOX", "24")
    _run("dess_t1t2_mapping.py", monkeypatch, tmp_path)


def test_megre_t2_b0_mapping_smoke(monkeypatch, tmp_path):
    """Joint T2+B0 GN fit of multi-echo GRE through the simulate()
    dispatch; recovery RMSE asserted inside the example."""
    monkeypatch.setenv("MEGRE_NVOX", "16")
    monkeypatch.setenv("MEGRE_NTR", "16")
    monkeypatch.setenv("MEGRE_ITERS", "6")
    _run("megre_t2_b0_mapping.py", monkeypatch, tmp_path)


def test_mt_qmt_fit_refine_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("QMTFIT_NTR", "32")
    monkeypatch.setenv("QMTFIT_NVOX", "12")
    monkeypatch.setenv("QMTFIT_ITERS", "6")
    _run("mt_qmt_fit_refine.py", monkeypatch, tmp_path)


def test_mrf_maps_2d_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("MAP2D_N", "20")
    monkeypatch.setenv("MAP2D_NPULSE", "80")
    monkeypatch.setenv("MAP2D_NGRID", "18")
    monkeypatch.setenv("MAP2D_ITERS", "4")
    _run("mrf_maps_2d.py", monkeypatch, tmp_path)


def test_mrf_bssfp_smoke(monkeypatch, tmp_path):
    """Ma 2013 bSSFP MRF: compressed (T1, T2, df) match must recover
    the picked atoms (asserted inside the example)."""
    monkeypatch.setenv("BSSFP_NPULSE", "48")
    monkeypatch.setenv("BSSFP_NGRID", "8")
    monkeypatch.setenv("BSSFP_NDF", "5")
    monkeypatch.setenv("BSSFP_RANK", "12")
    _run("mrf_bssfp.py", monkeypatch, tmp_path)


@pytest.mark.slow
def test_mrf_bssfp_refine_smoke(monkeypatch, tmp_path):
    """Off-grid (T1, T2, df) Gauss-Newton stage (g-tracked balanced
    Jacobian dispatch): needs a refinement-capable train length."""
    monkeypatch.setenv("BSSFP_NPULSE", "200")
    monkeypatch.setenv("BSSFP_NGRID", "10")
    monkeypatch.setenv("BSSFP_NDF", "9")
    monkeypatch.setenv("BSSFP_RANK", "20")
    monkeypatch.setenv("BSSFP_NVOX", "16")
    _run("mrf_bssfp.py", monkeypatch, tmp_path)


def test_mrf_dw_smoke(monkeypatch, tmp_path):
    """DW-MRF (T1, T2, ADC) mapping via the diffusion kernel axis."""
    monkeypatch.setenv("DW_NPULSE", "60")
    monkeypatch.setenv("DW_NGRID", "6")
    monkeypatch.setenv("DW_ND", "4")
    monkeypatch.setenv("DW_RANK", "16")
    monkeypatch.setenv("DW_INTERPRET", "1")
    _run("mrf_dw.py", monkeypatch, tmp_path)


def test_mrf_fit_refine_smoke(monkeypatch, tmp_path):
    """Dictionary match + Gauss-Newton refinement: the refined (T1, T2)
    must beat the grid match (asserted inside the example)."""
    monkeypatch.setenv("FIT_NPULSE", "60")
    monkeypatch.setenv("FIT_NGRID", "16")
    monkeypatch.setenv("FIT_NVOX", "16")
    monkeypatch.setenv("FIT_ITERS", "4")
    _run("mrf_fit_refine.py", monkeypatch, tmp_path)


def test_profiling_differentiation_mrf_smoke(monkeypatch, tmp_path):
    """Flagship diff example (scaled down; full 400-TR run documented in
    docs/PERFORMANCE.md)."""
    monkeypatch.setenv("MRF_NTR", "12")
    monkeypatch.setenv("MRF_CHUNK", "5")
    _run("profiling_differentiation_mrf.py", monkeypatch, tmp_path)


def test_profiling_differentiation_mrf_seq_smoke(monkeypatch, tmp_path):
    """DSL-built MRF Hessian (string variables + repeat) cross-checked
    bit-exactly against the direct-operator variant."""
    monkeypatch.setenv("MRF_NTR", "10")
    monkeypatch.setenv("MRF_CHUNK", "5")
    _run("profiling_differentiation_mrf_seq.py", monkeypatch, tmp_path)


def test_optim_mrf_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("MRF_CPU", "1")
    monkeypatch.setenv("MRF_NTR", "24")
    monkeypatch.setenv("MRF_STEPS", "2")
    monkeypatch.setenv("MRF_MAXITER", "4")
    monkeypatch.setenv("MRF_ATOMS", "8")
    _run("optim_mrf.py", monkeypatch, tmp_path)


def test_optim_mrf_pg_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("MRF_CPU", "1")
    monkeypatch.setenv("MRF_SOLVER", "pg")
    monkeypatch.setenv("MRF_NTR", "24")
    monkeypatch.setenv("MRF_STEPS", "2")
    monkeypatch.setenv("MRF_ATOMS", "8")
    _run("optim_mrf.py", monkeypatch, tmp_path)


@pytest.mark.slow
def test_hyperecho3d_smoke(monkeypatch, tmp_path):
    _run("hyperecho3d.py", monkeypatch, tmp_path)


def test_mrf_dictionary_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("DICT_NPULSE", "128")
    monkeypatch.setenv("DICT_NGRID", "12")
    _run("mrf_dictionary.py", monkeypatch, tmp_path)


def test_sequence_optimization_smoke(monkeypatch, tmp_path):
    _run("sequence_optimization.py", monkeypatch, tmp_path)


def test_pulse_profile_smoke(monkeypatch, tmp_path):
    _run("pulse_profile.py", monkeypatch, tmp_path)


def test_optim_mse_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("MSE_NTAU", "120")
    monkeypatch.setenv("MSE_MAXECHO", "3")
    _run("optim_mse.py", monkeypatch, tmp_path)


@pytest.mark.slow
def test_gradient_echo_2d_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("GRE2D_N", "16")
    _run("gradient_echo_2d.py", monkeypatch, tmp_path)


def test_iso_vs_epg_imaging_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("IMG_NREAD", "32")
    monkeypatch.setenv("IMG_NISO", "800")
    _run("iso_vs_epg_imaging.py", monkeypatch, tmp_path)


@pytest.mark.slow
def test_ssfp_diffusion_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("SSFP_NRF", "20")
    monkeypatch.setenv("SSFP_NPOS", "41")
    _run("ssfp_diffusion.py", monkeypatch, tmp_path)


def test_rare_diffusion_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("RARE_ETL", "6")
    monkeypatch.setenv("RARE_NANGLE", "41")
    _run("rare_diffusion.py", monkeypatch, tmp_path)


def test_press_mrs_smoke(monkeypatch, tmp_path):
    _run("press_mrs.py", monkeypatch, tmp_path)


def test_random_spoiling_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("SPOIL_NRF", "120")
    monkeypatch.setenv("SPOIL_NPOINT", "101")
    _run("random_spoiling.py", monkeypatch, tmp_path)


def test_pssfp_offres_smoke(monkeypatch, tmp_path):
    """Float shift-merge vs Bloch: at kgrid=4 rad/m with capacity above
    the retained-state count the error matches the reference's own value
    (0.0923) exactly; see examples/pssfp_offres.py."""
    monkeypatch.setenv("PSSFP_NRF", "30")
    monkeypatch.setenv("PSSFP_NPOS", "61")
    monkeypatch.setenv("PSSFP_ITERS", "2")
    monkeypatch.setenv("PSSFP_NSTATE", "1400")
    monkeypatch.setenv("PSSFP_TOL", "0.12")
    _run("pssfp_offres.py", monkeypatch, tmp_path)


def test_slice_profile_mrf_smoke(monkeypatch, tmp_path):
    """Slice-profile-corrected dictionary must beat the ideal-pulse one
    against the exact shaped-pulse oracle (asserted inside)."""
    monkeypatch.setenv("SLICE_NT1", "8")
    monkeypatch.setenv("SLICE_NT2", "6")
    monkeypatch.setenv("SLICE_NTR", "40")
    _run("slice_profile_mrf.py", monkeypatch, tmp_path)


def test_mt_prep_gre_smoke(monkeypatch, tmp_path):
    """MT-prepped segmented GRE (composite EPG-X family): MTR
    monotonicity + zero-exchange control asserted inside."""
    monkeypatch.setenv("MTPREP_NSEG", "3")
    monkeypatch.setenv("MTPREP_NREAD", "8")
    monkeypatch.setenv("MTPREP_NVOX", "8")
    _run("mt_prep_gre.py", monkeypatch, tmp_path)


def test_mwf_mapping_smoke(monkeypatch, tmp_path):
    """EPG-NNLS myelin-water mapping: per-tissue MWF recovery within
    0.06 absolute asserted inside the example."""
    monkeypatch.setenv("MWF_NBINS", "32")
    monkeypatch.setenv("MWF_NB1", "4")
    monkeypatch.setenv("MWF_NREP", "6")
    monkeypatch.setenv("MWF_ITERS", "3000")
    _run("mwf_mapping.py", monkeypatch, tmp_path)


def test_mse_t2_b1_mapping_smoke(monkeypatch, tmp_path):
    """Joint (T2, B1) EPG fit from CPMG echoes (fused Jacobian kernel)
    must halve the mono-exponential T2 error (asserted inside)."""
    monkeypatch.setenv("MSE_NECHO", "12")
    monkeypatch.setenv("MSE_NVOX", "16")
    monkeypatch.setenv("MSE_ITERS", "12")
    _run("mse_t2_b1_mapping.py", monkeypatch, tmp_path)


def test_b1_mapping_dispatch_smoke(monkeypatch, tmp_path):
    """Operator-level (T2, B1) GN mapping via the r5 B1-tracked
    Jacobian dispatch (assertions inside: dispatch engaged + RMSEs)."""
    monkeypatch.setenv("B1MAP_NECHO", "10")
    monkeypatch.setenv("B1MAP_NVOX", "24")
    _run("b1_mapping_dispatch.py", monkeypatch, tmp_path)
