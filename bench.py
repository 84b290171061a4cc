#!/usr/bin/env python
"""Headline benchmark: FISP MRF dictionary generation throughput.

Config (BASELINE.json config 2 / north star): 1000-pulse variable-FA FISP
train, max_nstate=10, dictionary over a T1 x T2 x B1 atom grid.

Prints ONE JSON line:
  {"metric": "mrf_fisp_atoms_per_sec", "value": ..., "unit": "atoms/s",
   "vs_baseline": <ratio vs reference epgpy NumPy-CPU atoms/s>, ...}

The reference baseline is measured locally on a reduced atom count (its
cost is linear in atoms) and cached in bench_baseline.json; re-measure by
deleting that file (requires the reference at /root/reference or
$EPGPY_REFERENCE).

Env overrides: BENCH_NATOMS, BENCH_NPULSE, BENCH_NSTATE, BENCH_REPEATS.
"""

import json
import os
import signal
import sys
import time

import numpy as np

#: Best-effort result accumulator (r5): sections fill this in as they
#: complete, and a SIGTERM handler prints it before dying -- a driver
#: timeout then records a PARTIAL JSON line (tagged bench_partial)
#: instead of nothing at all.  A fully collapsed tunnel window once ran
#: a single bench past a 30-minute kill with zero output.
_RESULT: dict = {"metric": "mrf_fisp_atoms_per_sec", "value": None,
                 "unit": "atoms/s", "vs_baseline": None}


def _emit_partial(signum=None, frame=None):
    _RESULT["bench_partial"] = True
    try:
        print(json.dumps(_RESULT), flush=True)
    finally:
        os._exit(0)

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

NATOMS = int(os.environ.get("BENCH_NATOMS", 102400))
NPULSE = int(os.environ.get("BENCH_NPULSE", 1000))
NSTATE = int(os.environ.get("BENCH_NSTATE", 10))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
REF_ATOMS = int(os.environ.get("BENCH_REF_ATOMS", 512))
BASELINE_CACHE = os.path.join(HERE, "bench_baseline.json")

TR, TE = 12.0, 5.0


def make_train(npulse):
    rng = np.random.default_rng(42)
    FA = 10.0 + 50.0 * np.abs(np.sin(np.arange(npulse) * 2 * np.pi / 500.0))
    FA += rng.uniform(0, 2, npulse)
    return FA.astype(np.float64)


def make_atoms(natoms):
    # T1 x T2 x B1 grid flattened to `natoms` atoms
    n1 = max(int(round(natoms ** (1 / 3))), 2)
    n2 = max(int(round((natoms / n1) ** 0.5)), 2)
    n3 = max(natoms // (n1 * n2), 1)
    T1 = np.linspace(100.0, 3000.0, n1)
    T2 = np.linspace(10.0, 300.0, n2)
    B1 = np.linspace(0.7, 1.3, n3)
    g = np.stack(np.meshgrid(T1, T2, B1, indexing="ij"), -1).reshape(-1, 3)
    if len(g) < natoms:  # pad by tiling
        reps = -(-natoms // len(g))
        g = np.tile(g, (reps, 1))
    g = g[:natoms]
    # keep T2 < T1 (physical)
    g[:, 1] = np.minimum(g[:, 1], 0.8 * g[:, 0])
    return g[:, 0], g[:, 1], g[:, 2]


def measure_reference(FA, T1, T2, B1):
    """Reference epgpy (NumPy) throughput on the same sequence."""
    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if not os.path.isdir(ref_path):
        return None
    sys.path.insert(0, ref_path)
    import epgpy.operators as rops
    import epgpy.functions as rfun

    seq = []
    for i in range(len(FA)):
        seq += [
            rops.T(FA[i] * B1, 90),
            rops.E(TE, T1, T2), rops.ADC,
            rops.E(TR - TE, T1, T2), rops.S(1),
        ]
    t0 = time.perf_counter()
    sig = rfun.simulate(seq, max_nstate=NSTATE)
    dt = time.perf_counter() - t0
    probe = np.asarray(sig)[:, :8]  # (P, 8)
    return {"atoms_per_sec": len(T1) / dt, "natoms": len(T1),
            "npulse": len(FA), "seconds": dt,
            "probe_re": probe.real.tolist(), "probe_im": probe.imag.tolist()}


def get_baseline(FA, T1, T2, B1):
    """Reference throughput on the first REF_ATOMS atoms of the main grid."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            cached = json.load(fh)
        if (cached.get("npulse") == len(FA)
                and cached.get("main_natoms") == len(T1)):
            return cached
    ref = measure_reference(FA, T1[:REF_ATOMS], T2[:REF_ATOMS], B1[:REF_ATOMS])
    if ref is not None:
        ref["main_natoms"] = len(T1)
        with open(BASELINE_CACHE, "w") as fh:
            json.dump(ref, fh)
    return ref


def measure_engine(FA, T1, T2, B1):
    """General operator-engine throughput on the same MRF config.

    The engine (scan-planned simulate) is the product surface; this keeps a
    driver-visible perf number next to the hand-fused model kernel so an
    engine regression (e.g. lanes layout falling back) shows in BENCH.
    """
    import time
    import epgpy_tpu as epg

    T1j, T2j = T1.astype(np.float32), T2.astype(np.float32)
    seq = []
    for i in range(len(FA)):
        seq += [
            epg.T((FA[i] * B1).astype(np.float32), 90),
            epg.E(TE, T1j, T2j), epg.ADC,
            epg.E(TR - TE, T1j, T2j), epg.S(1),
        ]

    def run():
        # fisp_kernel=False pins the scan planner: this metric is the
        # regression canary for the GENERAL engine (lanes layout, scan
        # grouping); the auto kernel dispatch is measured separately
        return epg.simulate(seq, max_nstate=NSTATE, asarray=False,
                            fisp_kernel=False)

    def esync(out):
        return float(np.asarray(out["__c_re"][-1, -1]))

    t0 = time.perf_counter()
    esync(run())
    ewarm = time.perf_counter() - t0
    ebest, _, esprd = _pipelined_best(run, esync, REPEATS, M=5)
    out = {"engine_atoms_per_sec": round(len(T1) / ebest, 1),
           "engine_best_seconds": round(float(ebest), 4),
           "engine_window_spread": esprd,
           "engine_warmup_seconds": round(float(ewarm), 2)}

    # the same operator train through the default path: on TPU the
    # whole-sequence FISP dispatch routes it to the fused Pallas kernel
    # (what a simulate() user actually gets)
    import jax
    if jax.devices()[0].platform != "cpu":
        def run_auto():
            return epg.simulate(seq, max_nstate=NSTATE, asarray=False)

        t0 = time.perf_counter()
        esync(run_auto())
        dwarm = time.perf_counter() - t0
        dbest, _, _ = _pipelined_best(run_auto, esync, REPEATS, M=5)
        out.update({
            "engine_dispatch_atoms_per_sec": round(len(T1) / dbest, 1),
            "engine_dispatch_best_seconds": round(float(dbest), 4),
            "engine_dispatch_warmup_seconds": round(float(dwarm), 2)})
    return out


def measure_table():
    """Spatially-resolved (float-shift merge) path throughput.

    50-TR pSSFP-like train, capacity-1024 coordinate table, 64-atom T2
    sweep: the sort/segment-sum merge engine (Gao 2021) that backs the
    off-resonance/PRESS/imaging examples.  Regression canary for the
    scan-grouping + pow2-sort + re/im-split compile path.
    """
    import epgpy_tpu as epg

    # device time is flat from 64 to 512 atoms (the 128-lane tiles are
    # underfilled at 64; measured in-window: 7.2 ms vs 6.1 ms/train):
    # run the TPU at 512 atoms, the NumPy reference at 1024 (r4: large
    # batches amortize the reference's per-op Python overhead -- small
    # ref batches inflate per-atom cost and hence the ratio; the
    # 64-atom measurement is kept as a recorded flatness check)
    NRF, CAP, B, REF_B = 50, 1024, 512, 1024
    rng = np.random.default_rng(0)
    T2s = np.linspace(40.0, 120.0, B).astype(np.float32)
    seq = [epg.T(90, 90)]
    for i in range(NRF):
        seq += [epg.S(float(rng.uniform(2, 10))), epg.T(40, 0),
                epg.E(5.0, 1000.0, T2s), epg.ADC]

    def run():
        return epg.simulate(seq, kgrid=0.5, max_nstate=CAP, asarray=False)

    def tsync(out):
        return float(np.asarray(out["__c_re"][-1]).ravel()[0])

    t0 = time.perf_counter()
    tsync(run())
    twarm = time.perf_counter() - t0

    tbest, t1, tsprd = _pipelined_best(run, tsync, 2 * REPEATS)
    out = {"table_tr_atoms_per_sec": round(NRF * B / tbest, 1),
           "table_best_seconds": round(float(tbest), 4),
           "table_window_spread": tsprd,
           "table_single_shot_seconds": round(float(t1), 4),
           "table_warmup_seconds": round(float(twarm), 2),
           "table_capacity": CAP}

    # reference throughput on the same float-shift train (NumPy shift-merge)
    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.functions as rfun
            def _time_ref(nat):
                rng = np.random.default_rng(0)
                t2r = np.linspace(40.0, 120.0, nat).astype(np.float32)
                rseq = [rops.T(90, 90)]
                for i in range(NRF):
                    rseq += [rops.S(np.array([[rng.uniform(2, 10)]])),
                             rops.T(40, 0), rops.E(5.0, 1000.0, t2r),
                             rops.ADC]
                t0 = time.perf_counter()
                rfun.simulate(rseq, kgrid=0.5, max_nstate=CAP)
                return time.perf_counter() - t0

            rdt64 = _cached_ref_seconds(f"table_{NRF}x64x{CAP}",
                                        lambda: _time_ref(64))
            rdt = _cached_ref_seconds(f"table_{NRF}x{REF_B}x{CAP}",
                                      lambda: _time_ref(REF_B))
            out["table_vs_baseline"] = round((B / tbest) / (REF_B / rdt), 1)
            out["table_ref_seconds"] = round(float(rdt), 3)
            out["table_ref_natoms"] = REF_B
            # per-atom flatness of the reference (1024 vs 64 atoms);
            # < 1 means the big batch is CHEAPER per atom (honest ratio)
            out["table_ref_per_atom_vs_64"] = round(
                (rdt / REF_B) / (rdt64 / 64), 3)
        except Exception as exc:
            out["table_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_hessian():
    """Flagship per-pulse Hessian (reference examples/profiling/
    differentiation_mrf.py): the 400-TR, (magnitude, T1, T2) x
    (400 alpha + 400 tau) block via the fused Pallas kernel
    (models/pallas_hessian; all 2403 tangents on the lane axis in
    VMEM).  vs_baseline is a like-for-like PER-ATOM A/B at 48 TR
    against the reference's hand-derived chain-rule propagation
    (NumPy; cached), both sides batched (r5): the reference's
    vectorized chain rule amortizes its Python overhead over atoms
    (0.55 s at 1 atom vs 0.64 s at 8 -- r4's single-atom ratio of
    ~110-160x under-credited the kernel by ~7x), and the kernel side
    batches atoms through its grid to satisfy the >= 5 ms
    minimum-work rule."""
    from epgpy_tpu.models.pallas_hessian import fisp_hessian_pallas

    NTR = 400
    # minimum-work rule (r5, VERDICT #1a): a single atom's 400-TR pass
    # is ~1.3 GFLOP =~ 1-3 ms of device time -- small enough that one
    # contended tunnel window once produced a physically impossible
    # 0.3 ms (implying > VPU peak).  Batch HB atoms through the
    # kernel's atom grid so every pipelined call carries >= 5 ms of
    # device work; throughput is per-atom (grid steps are independent).
    HB = int(os.environ.get("BENCH_HESS_ATOMS", 8))
    rng = np.random.default_rng(0)
    FA = rng.uniform(10, 60, NTR)
    TAU = rng.uniform(11, 16, NTR)
    T1b = 1380.0 + 5.0 * np.arange(HB)
    T2b = np.full(HB, 80.0)

    def run(j):
        return fisp_hessian_pallas(FA, 90.0, TAU, T1b + j * 1e-3,
                                   T2b, nstate=10)

    def hsync(out):
        return float(np.asarray(out["dT1dtau"][0][0, -1, -1]))

    t0 = time.perf_counter()
    hsync(run(0))
    twarm = time.perf_counter() - t0
    import itertools
    it = itertools.count(1)   # unbounded: BENCH_REPEATS must not exhaust it
    best, t1, hsprd = _pipelined_best(lambda: run(next(it)), hsync,
                                      REPEATS, M=5)
    out = {"hessian_seconds": round(float(best / HB), 4),
           "hessian_call_seconds": round(float(best), 4),
           "hessian_natoms": HB,
           "hessian_window_spread": hsprd,
           "hessian_single_shot_seconds": round(float(t1), 4),
           "hessian_warmup_seconds": round(float(twarm), 2),
           "hessian_ntr": NTR, "hessian_nvars": 2 * NTR + 2}

    # like-for-like A/B at 48 TR vs the reference's analytic chain
    # rule.  Same minimum-work rule: the kernel side batches 32 atoms
    # (48 TR x 1 atom is ~0.16 GFLOP); the reference side is measured
    # at 8 atoms (its chain rule is linear in atoms) and compared
    # per-atom, like the jac/exchange metrics.
    NR, KB, RB = 48, 128, 8
    FAr, TAUr = FA[:NR], TAU[:NR]
    T1k = 1380.0 + 5.0 * np.arange(KB)
    T2k = np.full(KB, 80.0)

    def runk(j):
        return fisp_hessian_pallas(FAr, 90.0, TAUr, T1k + j * 1e-3,
                                   T2k, nstate=10)

    hsync(runk(0))
    kbest, _, _ = _pipelined_best(lambda: runk(next(it)), hsync,
                                  REPEATS, M=5)
    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            sys.path.insert(0, ref_path)
            import epgpy as repg

            def _time_ref():
                alr = [f"alpha_{i:03d}" for i in range(NR)]
                trr = [f"tau_{i:03d}" for i in range(NR)]
                o2_rf = [[("T1", alr[i]), ("T2", alr[i])]
                         for i in range(NR)]
                o2_rx = [[("T1", trr[i]), ("T2", trr[i])]
                         for i in range(NR)]
                rT1 = 1380.0 + 5.0 * np.arange(RB)
                rT2 = np.full(RB, 80.0)
                rseq = []
                for i in range(NR):
                    rseq += [
                        repg.T(FAr[i], 90, order1={alr[i]: "alpha"},
                               order2=o2_rf[i]),
                        repg.E(TAUr[i], rT1, rT2,
                               order1={"T1": "T1", "T2": "T2",
                                       trr[i]: "tau"},
                               order2=sum(o2_rx + o2_rf, start=[])),
                        repg.ADC, repg.S(1)]
                hes = repg.Hessian(["magnitude", "T1", "T2"], alr + trr)
                t0 = time.perf_counter()
                repg.simulate(rseq, probe=hes, max_nstate=10)
                return time.perf_counter() - t0

            rdt = _cached_ref_seconds(f"hessian_{NR}tr_x{RB}", _time_ref)
            # per-atom A/B (both sides batched; reference cost is
            # linear in atoms)
            out["hessian_vs_baseline"] = round(
                float((KB / kbest) / (RB / rdt)), 1)
            out["hessian_ref_seconds"] = round(float(rdt), 3)
            out["hessian_ref_ntr"] = NR
            out["hessian_ref_natoms"] = RB
            out["hessian_seconds_48tr"] = round(float(kbest / KB), 6)
            out["hessian_48tr_natoms"] = KB
        except Exception as exc:
            out["hessian_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_jacobian(FA, T1, T2, B1):
    """Jacobian-dictionary throughput: dS/d(T1, T2, B1) for every atom.

    Two engines, best wins (like the headline metric): the XLA path
    (one vmap(jvp) tangent sweep of the batched scan — 4 scan passes)
    and the fused Pallas kernel (primal + 3 tangent half-ladders
    resident in VMEM, ~3.4x the XLA path on TPU)."""
    import jax
    from epgpy_tpu.models.mrf import fisp_mrf_jacobian

    B = min(len(T1), int(os.environ.get("BENCH_JAC_ATOMS", 25600)))
    T1j, T2j, B1j = T1[:B], T2[:B], B1[:B]

    runs = {"xla-jvp": lambda: fisp_mrf_jacobian(
        FA, TR, TE, T1j, T2j, B1j, variables=("T1", "T2", "B1"),
        nstate=NSTATE)}
    if jax.devices()[0].platform != "cpu":
        from epgpy_tpu.models.pallas_fisp import fisp_jacobian_pallas
        runs["pallas-jac"] = lambda: fisp_jacobian_pallas(
            FA, 90.0, TR, TE, T1j, T2j, B1j, nstate=NSTATE)

    def jsync(out):
        jax.block_until_ready(out)
        (_, _), (dre, _) = out
        return float(np.asarray(dre[-1, -1, -1]))

    jbest, jwarm, jkernel = np.inf, 0.0, None
    for name, run in runs.items():
        t0 = time.perf_counter()
        jsync(run())
        warm = time.perf_counter() - t0
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            dt = (jsync(run()), time.perf_counter() - t0)[1]
            if dt < jbest:
                jbest, jwarm, jkernel = dt, warm, name
    out = {"jac_atoms_per_sec": round(B / jbest, 1),
           "jac_best_seconds": round(float(jbest), 4),
           "jac_warmup_seconds": round(float(jwarm), 2),
           "jac_kernel": jkernel,
           "jac_natoms": B, "jac_nvars": 3}

    # reference baseline: its native analytic order1 propagation on the
    # same 1000-TR train at a reduced atom count (cost linear in atoms).
    # Conservative ratio: the reference differentiates (T1, T2) only --
    # B1 is not a global variable there -- while we also carry dB1.
    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            BR = 1024           # r4: de-biased (64-atom kept as flatness)
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.functions as rfun
            import epgpy.diff as rdiff

            def _time_ref(nat):
                T1r = np.asarray(T1[:nat], np.float64)
                T2r = np.asarray(T2[:nat], np.float64)
                rseq = []
                for i in range(len(FA)):
                    rseq += [
                        rops.T(float(FA[i]), 90.0),
                        rops.E(TE, T1r, T2r, order1=["T1", "T2"]),
                        rops.ADC,
                        rops.E(TR - TE, T1r, T2r, order1=["T1", "T2"]),
                        rops.S(1),
                    ]
                t0 = time.perf_counter()
                rfun.simulate(rseq, max_nstate=NSTATE,
                              probe=[rdiff.Jacobian(["T1", "T2"])])
                return time.perf_counter() - t0

            rdt64 = _cached_ref_seconds(f"jac_{len(FA)}x64x{NSTATE}",
                                        lambda: _time_ref(64))
            rdt = _cached_ref_seconds(f"jac_{len(FA)}x{BR}x{NSTATE}",
                                      lambda: _time_ref(BR))
            out["jac_vs_baseline"] = round((B / jbest) / (BR / rdt), 1)
            out["jac_ref_seconds"] = round(float(rdt), 3)
            out["jac_ref_natoms"] = BR
            out["jac_ref_per_atom_vs_64"] = round(
                (rdt / BR) / (rdt64 / 64), 3)
        except Exception as exc:
            out["jac_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


AUX_BASELINE_CACHE = os.path.join(HERE, "bench_aux_baseline.json")


def _cached_ref_seconds(key, fn):
    """Reference (NumPy) timings are stable and slow (the 3-D diffusion
    train takes ~2 min): measure once, cache in bench_aux_baseline.json
    keyed by workload tag; delete the file to re-measure."""
    cache = {}
    if os.path.exists(AUX_BASELINE_CACHE):
        try:
            with open(AUX_BASELINE_CACHE) as fh:
                cache = json.load(fh)
        except Exception:
            cache = {}
    if key in cache:
        return float(cache[key])
    dt = fn()
    cache[key] = float(dt)
    with open(AUX_BASELINE_CACHE, "w") as fh:
        json.dump(cache, fh)
    return float(dt)


def _pipelined_best(run, sync, repeats, M=9):
    """Per-run wall time via pipelined dispatch, plus a window-spread
    dispersion indicator (r5, VERDICT #1d).

    A single launch+sync through the axon tunnel costs ~40 ms
    regardless of program content; dispatch M runs back-to-back
    (async), sync once, and take the slope (T(M) - T(1)) / (M - 1).
    Under timing noise the slope can come out non-positive -- fall back
    to the single-shot time then (never report a bogus near-zero).

    Returns ``(best, single_shot, spread)`` where ``spread`` is the
    median-over-best ratio of the per-repeat pipelined slopes (>= 1;
    ~1 means a quiet tunnel window, >~2 means the published best came
    out of a contended window and cross-round comparison of the
    absolute number is meaningless -- see docs/performance.md
    "Benchmarking honestly")."""
    def timed(m):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = [run() for _ in range(m)]
            sync(outs[-1])
            ts.append(time.perf_counter() - t0)
        return ts

    def one_pass():
        t1 = min(timed(1))
        slopes = [(t - t1) / (M - 1) for t in timed(M)]
        best = min(slopes)
        med = float(np.median(slopes))
        if best <= 0:
            # noise swallowed the slope: single-shot fallback; spread
            # from the (launch-floor-bound) slopes is meaningless, so
            # report the med/|best| dispersion of the raw attempts
            return t1, t1, round(max(med, t1) / t1, 2) if t1 > 0 else 1.0
        return best, t1, round(med / best, 2)

    best, t1, spread = one_pass()
    # degenerate window detection: for a small program the pipelined
    # slope should sit well below the single-shot time (which carries
    # the ~40 ms launch+sync floor).  slope ~ single-shot on a
    # sub-100 ms program means a contention stall ate the whole pass
    # (observed: the SAME call 67 ms vs 2142 ms twenty minutes apart)
    # -- pause and retry ONCE so one bad window can't fake a 100x
    # regression in the round's single official bench run.
    if best > 0.6 * t1 and t1 < 0.1:
        time.sleep(3.0)
        best2, t1b, spread2 = one_pass()
        if best2 < best:
            best, t1, spread = best2, min(t1, t1b), spread2
    return best, t1, spread


def _ab_best(run_a, run_b, sync, repeats=3, M=5):
    """In-window interleaved A/B (r5, VERDICT #1c): alternate pipelined
    passes of the two sides so a contention spike cannot land on only
    one of them (observed: the same kernel call 17 ms and 475 ms
    half an hour apart -- a sequential A/B published the kernel as
    'slower than the planner').

    Returns ``(best_a, best_b, spread)``: per-run bests (each pass is M
    back-to-back dispatches synced once, divided by M -- carries one
    ~40 ms/M launch-floor share, negligible for >= 5 ms programs) and
    the worse side's median/best dispersion.  Ratios with spread > ~3
    belong under an `_unreliable` flag.

    KNOWN COMPRESSION UNDER LOAD: tunnel contention adds a roughly
    content-independent ~90 ms to EVERY dispatch, inflating both sides
    equally and compressing the ratio toward 1 (measured: the same
    kernel-vs-planner A/B reads 8.3 in a quiet window and 1.7-2.2
    loaded, each with in-window spread ~1.0).  Published ratios are
    therefore LOWER bounds; compare across rounds only via the quiet
    samples (bench_compare classifies by spread, not by load)."""
    ta, tb = [], []
    for _ in range(repeats):
        for run, ts in ((run_a, ta), (run_b, tb)):
            t0 = time.perf_counter()
            outs = [run() for _ in range(M)]
            sync(outs[-1])
            ts.append((time.perf_counter() - t0) / M)
    spread = max(float(np.median(ta)) / min(ta),
                 float(np.median(tb)) / min(tb))
    return min(ta), min(tb), round(spread, 2)


def measure_mse():
    """The reference's ONE published benchmark (BASELINE.md row 1):
    18-echo MSE, 100 T2 x 50 B1 = 5,000 signals, ~108 operator
    applications -- 0.69 s on the reference author's laptop
    (reference docs/basics.md:250-267).  Exact same sequence here."""
    import epgpy_tpu as epg

    necho, num_t2, num_b1 = 18, 100, 50
    TE, T1v = 9.5, 1400.0
    T2 = np.linspace(20, 60, num_t2)
    att = np.linspace(0.2, 1, num_b1)
    seq = [epg.T(90, 90)] + [
        epg.S(1), epg.E(TE / 2, T1v, [T2]), epg.T(180 * att, 0),
        epg.S(1), epg.E(TE / 2, T1v, [T2]), epg.ADC] * necho
    nsig = num_t2 * num_b1

    def run():
        return epg.simulate(seq, asarray=False)

    def msync(out):
        return float(np.asarray(out["__c_re"][-1]).ravel()[0])

    t0 = time.perf_counter()
    msync(run())
    mwarm = time.perf_counter() - t0
    mbest, msingle, msprd = _pipelined_best(run, msync, 2 * REPEATS)
    out = {"mse_signals_per_sec": round(nsig / mbest, 1),
           "mse_best_seconds": round(float(mbest), 4),
           "mse_single_shot_seconds": round(float(msingle), 4),
           "mse_window_spread": msprd,
           "mse_warmup_seconds": round(float(mwarm), 2),
           "mse_published_ref_seconds": 0.69}

    # minimum-work configs (r5, VERDICT #1c): the published 5,000-signal
    # train is ~0.3 ms of device work -- fine for the vs-published-ref
    # ratio above, but too small for an efficiency fraction or a stable
    # kernel-vs-planner A/B on a loaded tunnel (r4's judge re-run
    # measured mse_jac_vs_planner = 0.9 from two contention-saturated
    # ~0.11 s samples).  Scale the signal count until the KERNEL side
    # carries >= 5 ms per call; the frac and the A/B use these configs.
    # 200 x 3200 = 640k signals: the fused CPMG kernel kept outrunning
    # the 5 ms minimum-work bar (64k in 2.3 ms, then 320k in ~4.6 ms in
    # a fast window); outputs stay small (18 echoes x B)
    big_t2 = np.linspace(20, 60, 200)
    big_att = np.linspace(0.2, 1, 3200)
    bseq = [epg.T(90, 90)] + [
        epg.S(1), epg.E(TE / 2, T1v, [big_t2]), epg.T(180 * big_att, 0),
        epg.S(1), epg.E(TE / 2, T1v, [big_t2]), epg.ADC] * necho
    big_nsig = big_t2.size * big_att.size

    def run_big():
        return epg.simulate(bseq, asarray=False)

    msync(run_big())
    bbest, _, bsprd = _pipelined_best(run_big, msync, REPEATS, M=5)
    out["mse_big_signals_per_sec"] = round(big_nsig / bbest, 1)
    out["mse_big_best_seconds"] = round(float(bbest), 4)
    out["mse_big_nsig"] = big_nsig
    out["mse_big_window_spread"] = bsprd

    # Jacobian dispatch A/B: tracked E ops + Adc/Jacobian probes route
    # to the fused CPMG primal+tangent kernel; in-window pipelined A/B
    # against the planner's jacfwd (fisp_kernel=False) at a scaled
    # signal count (200 x 160 = 32,000)
    jac_att = np.linspace(0.2, 1, 160)
    dseq = [epg.T(90, 90)] + [
        epg.S(1), epg.E(TE / 2, T1v, [big_t2], order1=["T1", "T2"]),
        epg.T(180 * jac_att, 0),
        epg.S(1), epg.E(TE / 2, T1v, [big_t2], order1=["T1", "T2"]),
        epg.ADC] * necho
    jac_nsig = big_t2.size * jac_att.size
    probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]

    def run_jac():
        return epg.simulate(dseq, probe=probes, asarray=False)

    def jsync(o):
        return float(np.asarray(o[1]["__c_re"]).ravel()[0])

    def run_planner():
        return epg.simulate(dseq, probe=probes, asarray=False,
                            fisp_kernel=False)

    jsync(run_jac())
    jsync(run_planner())              # warm both sides, then interleave
    jbest, jplanner, absprd = _ab_best(run_jac, run_planner, jsync,
                                       REPEATS, M=4)
    out["mse_jac_signals_per_sec"] = round(jac_nsig / jbest, 1)
    out["mse_jac_best_seconds"] = round(float(jbest), 4)
    out["mse_jac_nsig"] = jac_nsig
    out["mse_jac_ab_spread"] = absprd
    ratio = round(jplanner / jbest, 1)
    if jbest < 0.005 or absprd > 3.0:
        # kernel side under the minimum-work bar, or the window blew up
        # mid-A/B: the ratio is noise, not signal -- flag it
        out["mse_jac_vs_planner_unreliable"] = ratio
    else:
        out["mse_jac_vs_planner"] = ratio

    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.functions as rfun
            rseq = [rops.T(90, 90)] + [
                rops.S(1), rops.E(TE / 2, T1v, [T2]),
                rops.T(180 * att, 0),
                rops.S(1), rops.E(TE / 2, T1v, [T2]), rops.ADC] * necho

            def _time_ref():
                t0 = time.perf_counter()
                rfun.simulate(rseq)
                return time.perf_counter() - t0

            rdt = _cached_ref_seconds(f"mse_{necho}x{nsig}", _time_ref)
            out["mse_vs_baseline"] = round(rdt / mbest, 1)
            out["mse_ref_seconds"] = round(float(rdt), 3)
        except Exception as exc:
            out["mse_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_bssfp():
    """Balanced SSFP MRF train (Ma 2013 family): IR-prepped,
    phase-alternating, per-TR FA/TR variation, per-atom off-resonance.
    simulate() routes it to the fused k=0 Pallas kernel
    (fisp_dispatch.match_bssfp); the reference runs the same operator
    train through its dense loop (cost linear in atoms: measured at
    a small batch and scaled)."""
    import epgpy_tpu as epg

    # B=163840 (r5): the wide-tile kernel runs 131072 x 500 in
    # 4.8 ms -- just under the 5 ms minimum-work bar.  NOT much
    # larger: the pipelined measurement keeps all M output sets live
    # at once (outs[] in _pipelined_best), and (500, B) c64-split
    # outputs are ~0.7 GB each at this size -- B=256k with M=9 OOMed
    # the 16 GB HBM and cascaded RESOURCE_EXHAUSTED through every
    # later bench section
    N, B = 500, 163840
    rng = np.random.default_rng(5)
    FA = 10 + 50 * np.abs(np.sin(np.arange(N) * 2 * np.pi / 100))
    TRv = 12.0 + 2.0 * np.sin(np.arange(N) / 17.0)
    phases = np.cumsum(np.full(N, 180.0)) % 360.0
    T1 = rng.uniform(300, 2000, B)
    T2 = rng.uniform(30, 200, B)
    DF = rng.uniform(-0.05, 0.05, B)

    def build(t1, t2, df):
        seq = [epg.T(180, 0), epg.E(18.0, t1, t2, df)]
        for i in range(N):
            te = TRv[i] / 2
            seq += [epg.T(float(FA[i]), float(phases[i])),
                    epg.E(te, t1, t2, df),
                    epg.Adc(phase=-float(phases[i])),
                    epg.E(TRv[i] - te, t1, t2, df)]
        return seq

    seq = build(T1, T2, DF)

    def run():
        return epg.simulate(seq, asarray=False)

    def bsync(out):
        return float(np.asarray(out["__c_re"][-1, 0]))

    t0 = time.perf_counter()
    bsync(run())
    warm = time.perf_counter() - t0
    # M=5: each pipelined output set is ~0.5 GB at this config; depth
    # bounds the live-buffer footprint (see the B comment above)
    best, single, bsprd = _pipelined_best(run, bsync, REPEATS, M=5)
    out = {"bssfp_atoms_per_sec": round(B / best, 1),
           "bssfp_best_seconds": round(float(best), 4),
           "bssfp_window_spread": bsprd,
           "bssfp_single_shot_seconds": round(float(single), 4),
           "bssfp_warmup_seconds": round(float(warm), 2),
           "bssfp_natoms": B, "bssfp_ntr": N}

    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.functions as rfun
            RB = 1024          # r4: de-biased (64-atom kept as flatness)

            def _time_ref(nat):
                rT1, rT2, rDF = T1[:nat], T2[:nat], DF[:nat]
                rseq = [rops.T(180, 0), rops.E(18.0, rT1, rT2, rDF)]
                for i in range(N):
                    te = TRv[i] / 2
                    rseq += [rops.T(float(FA[i]), float(phases[i])),
                             rops.E(te, rT1, rT2, rDF),
                             rops.Adc(phase=-float(phases[i])),
                             rops.E(TRv[i] - te, rT1, rT2, rDF)]
                t0 = time.perf_counter()
                rfun.simulate(rseq)
                return time.perf_counter() - t0

            rdt64 = _cached_ref_seconds(f"bssfp_{N}x64",
                                        lambda: _time_ref(64))
            rdt = _cached_ref_seconds(f"bssfp_{N}x{RB}",
                                      lambda: _time_ref(RB))
            out["bssfp_ref_seconds"] = round(float(rdt), 3)
            out["bssfp_ref_natoms"] = RB
            out["bssfp_vs_baseline"] = round(rdt / RB * B / best, 1)
            out["bssfp_ref_per_atom_vs_64"] = round(
                (rdt / RB) / (rdt64 / 64), 3)
        except Exception as exc:
            out["bssfp_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_exchange():
    """EPG-X two-pool MT-GRE train throughput (BASELINE config 4).

    100-TR spoiled GRE with bound-pool saturation, exchange via the
    kinetic-matrix X operator each TR, 256-atom free-pool T2 sweep
    (reference epgpy/exchange.py:89-120 workload; MT helpers
    epgpy/magnettransfer.py)."""
    import epgpy_tpu as epg
    from epgpy_tpu.utils import magnettransfer as mt

    # device time is FLAT in B up to >=8k atoms (launch/dispatch floor
    # ~5-8 ms dominates at 256): measure TPU throughput at a batch that
    # actually exercises the device, the reference at a small batch,
    # and compare per-atom throughputs (same pattern as the jac metric).
    # B=32768 (r5): at 8192 the fused-kernel dispatch ran ~2 ms/call --
    # under the >= 5 ms minimum-work rule a contended window publishes
    # launch floor as throughput (VERDICT r4 #1c)
    NTR, B, REF_B = 100, 32768, 512
    G = mt.absorption_rate(12e-3, "super-lorentzian", 2.0)
    W = mt.saturation_rate(5.0, 10.0, G)

    def build(nb):
        T2f = np.linspace(40.0, 120.0, nb)
        # compartments on the leading batch axis (append-broadcast
        # rule), atom sweep appended: T2 (2, nb)
        T2 = np.stack([T2f, np.full(nb, 0.012)], axis=0)
        khi = epg.exchange_matrix(0.005, densities=[0.8, 0.2])
        Xop = epg.X(10.0, khi, axis=0, T1=np.asarray([1000.0, 1000.0]),
                    T2=T2)
        sat = epg.R(0, rL=np.asarray([0.0, W * 5.0]), r0=None)
        seq = []
        for _ in range(NTR):
            seq += [sat, epg.T(np.asarray([10.0, 0.0]), 0), epg.ADC, Xop,
                    epg.S(1)]
        return seq, T2

    seq, T2 = build(B)
    # start at thermal equilibrium of the two pools (= the init the
    # reference example builds explicitly).  Two engines: the scanned
    # planner (fisp_kernel=False, pinned) and the fused EPG-X Pallas
    # kernel dispatch (what simulate() users get on TPU, r3).
    def run():
        return epg.simulate(seq, max_nstate=10, density=[0.8, 0.2],
                            asarray=False, fisp_kernel=False)

    def run_auto():
        return epg.simulate(seq, max_nstate=10, density=[0.8, 0.2],
                            asarray=False)

    def xsync(out):
        # one-element completion read (the [-1] row alone is (C, 32768)
        # = 256 KB of d2h per sync)
        return float(np.asarray(out["__c_re"].reshape(-1)[0]))

    t0 = time.perf_counter()
    xsync(run())
    xwarm = time.perf_counter() - t0
    xbest, xsingle, xsprd = _pipelined_best(run, xsync, REPEATS, M=5)
    out = {"exchange_tr_atoms_per_sec": round(NTR * B / xbest, 1),
           "exchange_best_seconds": round(float(xbest), 4),
           "exchange_window_spread": xsprd,
           "exchange_warmup_seconds": round(float(xwarm), 2)}
    try:
        t0 = time.perf_counter()
        auto = run_auto()
        xsync(auto)
        out["exchange_dispatch_warmup_seconds"] = round(
            time.perf_counter() - t0, 2)
        if "__c_re" in auto:
            dbest, _, _ = _pipelined_best(run_auto, xsync, REPEATS, M=5)
            out["exchange_dispatch_tr_atoms_per_sec"] = round(
                NTR * B / dbest, 1)
            out["exchange_dispatch_best_seconds"] = round(float(dbest), 4)
            xbest = min(xbest, dbest)
    except Exception as exc:
        out["exchange_dispatch_error"] = f"{type(exc).__name__}: {exc}"[:160]

    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.exchange as rex
            import epgpy.evolution as rev
            import epgpy.functions as rfun
            # the reference magnettransfer module calls np.asfarray
            # (removed in NumPy 2); reuse our W -- same published formula
            rW = W
            rT2f = np.linspace(40.0, 120.0, REF_B)
            rT2 = np.stack([rT2f, np.full(REF_B, 0.012)], axis=0)
            rkhi = rex.exchange_matrix(0.005, densities=[0.8, 0.2])
            rX = rex.X(10.0, rkhi, axis=0,
                       T1=np.asarray([1000.0, 1000.0]), T2=rT2)
            rsat = rev.R(0, rL=np.asarray([0.0, rW * 5.0]), r0=None)
            rseq = []
            for _ in range(NTR):
                rseq += [rsat, rops.T(np.asarray([10.0, 0.0]), 0),
                         rops.ADC, rX, rops.S(1)]

            def _time_ref():
                t0 = time.perf_counter()
                rfun.simulate(rseq, max_nstate=10, density=[0.8, 0.2])
                return time.perf_counter() - t0

            rdt = _cached_ref_seconds(f"exchange_{NTR}x{REF_B}", _time_ref)
            out["exchange_vs_baseline"] = round(
                (B / xbest) / (REF_B / rdt), 1)
            out["exchange_ref_seconds"] = round(float(rdt), 3)
            out["exchange_ref_natoms"] = REF_B
        except Exception as exc:
            out["exchange_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_diffusion3d():
    """Anisotropic 3-D diffusion train throughput (BASELINE config 3).

    30-TR train of float 3-D crusher shifts with tensor-D attenuation
    during each gradient (reference epgpy/diffusion.py:86-147 b-matrix
    workload over the shift-merge coordinate table), 64-atom T2 sweep."""
    import epgpy_tpu as epg

    NTR, B, CAP = 30, 64, 512
    rng = np.random.default_rng(1)
    T2s = np.linspace(40.0, 120.0, B)
    Dt = np.diag([2e-3, 1e-3, 0.5e-3])
    ks = [np.round(rng.uniform(-3, 3, size=(1, 3)), 2) for _ in range(NTR)]
    seq = [epg.T(90, 90)]
    for k in ks:
        seq += [epg.S(k), epg.D(5.0, Dt, k=k), epg.T(40, 0),
                epg.E(5.0, 1000.0, T2s), epg.ADC]

    def run():
        return epg.simulate(seq, kgrid=1.0, max_nstate=CAP, asarray=False)

    def dsync(out):
        return float(np.asarray(out["__c_re"][-1]).ravel()[0])

    t0 = time.perf_counter()
    dsync(run())
    dwarm = time.perf_counter() - t0
    dbest, _, d3sprd = _pipelined_best(run, dsync, 2 * REPEATS)
    out = {"diff3d_tr_atoms_per_sec": round(NTR * B / dbest, 1),
           "diff3d_best_seconds": round(float(dbest), 4),
           "diff3d_window_spread": d3sprd,
           "diff3d_warmup_seconds": round(float(dwarm), 2)}

    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.diffusion as rdif
            import epgpy.functions as rfun
            rseq = [rops.T(90, 90)]
            for k in ks:
                rseq += [rops.S(k), rdif.D(5.0, Dt, k=k), rops.T(40, 0),
                         rops.E(5.0, 1000.0, T2s), rops.ADC]

            def _time_ref():
                t0 = time.perf_counter()
                rfun.simulate(rseq, kgrid=1.0, max_nstate=CAP)
                return time.perf_counter() - t0

            rdt = _cached_ref_seconds(f"diff3d_{NTR}x{B}x{CAP}", _time_ref)
            out["diff3d_vs_baseline"] = round(rdt / dbest, 1)
            out["diff3d_ref_seconds"] = round(float(rdt), 3)
        except Exception as exc:
            out["diff3d_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_prune():
    """Batch-varying float-shift (shift-prune) train throughput.

    40-TR x 256-atom train with per-atom shifts (the spatially-resolved
    imaging / per-isochromat workloads): exercises the batch-varying
    dense merge (ops/shiftdense.shiftmerge_dense_varying_lanes,
    windowed masked rolls) vs reference epgpy/shift.py:478-542."""
    import epgpy_tpu as epg

    NTR, B, CAP = 40, 256, 512
    rng = np.random.default_rng(2)
    ks = rng.uniform(0.5, 3.0, size=(B, 1))
    seq = [epg.T(90, 90)]
    for i in range(NTR):
        seq += [epg.S(ks * (1 + 0.05 * i)), epg.T(40, 0),
                epg.E(5.0, 1000.0, 80.0), epg.ADC]

    def run():
        return epg.simulate(seq, kgrid=0.5, max_nstate=CAP, asarray=False)

    def psync(out):
        return float(np.asarray(out["__c_re"][-1]).ravel()[0])

    t0 = time.perf_counter()
    psync(run())
    pwarm = time.perf_counter() - t0
    pbest, _, psprd = _pipelined_best(run, psync, 2 * REPEATS)
    out = {"prune_tr_atoms_per_sec": round(NTR * B / pbest, 1),
           "prune_best_seconds": round(float(pbest), 4),
           "prune_window_spread": psprd,
           "prune_warmup_seconds": round(float(pwarm), 2)}

    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.functions as rfun
            rseq = [rops.T(90, 90)]
            for i in range(NTR):
                rseq += [rops.S(ks * (1 + 0.05 * i)), rops.T(40, 0),
                         rops.E(5.0, 1000.0, 80.0), rops.ADC]

            def _time_ref():
                t0 = time.perf_counter()
                rfun.simulate(rseq, kgrid=0.5, max_nstate=CAP)
                return time.perf_counter() - t0

            rdt = _cached_ref_seconds(f"prune_{NTR}x{B}x{CAP}", _time_ref)
            out["prune_vs_baseline"] = round(rdt / pbest, 1)
            out["prune_ref_seconds"] = round(float(rdt), 3)
        except Exception as exc:
            out["prune_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_engine_diff(T1, T2, B1):
    """General-engine differentiation throughput (the product surface
    for CRLB work): engine.simulate with a Jacobian probe over a FISP
    train, dS/d(T1, T2) per atom.  Driver-visible canary for the
    diff.simulate_diff path (VERDICT r2 weak #2)."""
    import epgpy_tpu as epg

    NRF = 200
    B = min(len(T1), int(os.environ.get("BENCH_DIFF_ATOMS", 4096)))
    T1d = np.asarray(T1[:B], np.float64)
    T2d = np.asarray(T2[:B], np.float64)
    FA = make_train(NRF)
    seq = []
    for i in range(NRF):
        seq += [
            epg.T(float(FA[i]), 90.0),
            epg.E(TE, T1d, T2d, order1=["T1", "T2"]),
            epg.ADC,
            epg.E(TR - TE, T1d, T2d, order1=["T1", "T2"]),
            epg.S(1),
        ]
    probes = [epg.Jacobian(["magnitude", "T1", "T2"])]

    def run():
        # asarray=False keeps the Jacobian on device ({"__c_re","__c_im"}
        # dicts); with asarray=True the metric would mostly time the
        # ~20 MB device->host copy through the tunnel (measured 660 ms
        # d2h vs 36 ms device compute), not the diff program.
        # fisp_kernel=False pins the jacfwd planner path (this metric is
        # the simulate_diff regression canary; the auto Jacobian-kernel
        # dispatch is measured separately below)
        return epg.simulate(seq, probe=probes, max_nstate=NSTATE,
                            asarray=False, fisp_kernel=False)

    def dsync(out):
        # one-element read: forces completion without a bulk transfer
        return float(np.asarray(out["__c_re"][-1, -1, -1]))

    t0 = time.perf_counter()
    dsync(run())
    dwarm = time.perf_counter() - t0
    dbest, dsingle, dfsprd = _pipelined_best(run, dsync, REPEATS, M=5)
    out = {"diff_atoms_per_sec": round(B / dbest, 1),
           "diff_best_seconds": round(float(dbest), 4),
           "diff_window_spread": dfsprd,
           "diff_single_seconds": round(float(dsingle), 4),
           "diff_warmup_seconds": round(float(dwarm), 2),
           "diff_natoms": B, "diff_ntr": NRF}

    # the same train through the default path: on TPU the diff dispatch
    # routes Adc/Jacobian probes to the fused primal+tangent Pallas
    # kernel (what a simulate() user actually gets; ~4x the planner)
    import jax
    if jax.devices()[0].platform != "cpu":
        def run_auto():
            return epg.simulate(seq, probe=probes, max_nstate=NSTATE,
                                asarray=False)

        t0 = time.perf_counter()
        dsync(run_auto())
        jwarm = time.perf_counter() - t0
        jbest, _, _ = _pipelined_best(run_auto, dsync, REPEATS, M=5)
        out.update({
            "diff_dispatch_atoms_per_sec": round(B / jbest, 1),
            "diff_dispatch_best_seconds": round(float(jbest), 4),
            "diff_dispatch_warmup_seconds": round(float(jwarm), 2)})

    # reference baseline: same train + Jacobian probe at a reduced atom
    # count (reference cost is linear in atoms), cached like the others
    ref_path = os.environ.get("EPGPY_REFERENCE", "/root/reference")
    if os.path.isdir(ref_path):
        try:
            BR = 1024          # r4: de-biased (64-atom kept as flatness)
            sys.path.insert(0, ref_path)
            import epgpy.operators as rops
            import epgpy.functions as rfun
            import epgpy.diff as rdiff

            def _time_ref(nat):
                T1r = np.asarray(T1[:nat], np.float64)
                T2r = np.asarray(T2[:nat], np.float64)
                rseq = []
                for i in range(NRF):
                    rseq += [
                        rops.T(float(FA[i]), 90.0),
                        rops.E(TE, T1r, T2r, order1=["T1", "T2"]),
                        rops.ADC,
                        rops.E(TR - TE, T1r, T2r, order1=["T1", "T2"]),
                        rops.S(1),
                    ]
                t0 = time.perf_counter()
                rfun.simulate(
                    rseq, max_nstate=NSTATE,
                    probe=[rdiff.Jacobian(["magnitude", "T1", "T2"])])
                return time.perf_counter() - t0

            rdt64 = _cached_ref_seconds(f"diff_{NRF}x64x{NSTATE}",
                                        lambda: _time_ref(64))
            rdt = _cached_ref_seconds(f"diff_{NRF}x{BR}x{NSTATE}",
                                      lambda: _time_ref(BR))
            ref_atoms_per_sec = BR / rdt
            out["diff_vs_baseline"] = round(
                (B / dbest) / ref_atoms_per_sec, 1)
            out["diff_ref_seconds"] = round(float(rdt), 3)
            out["diff_ref_natoms"] = BR
            out["diff_ref_per_atom_vs_64"] = round(
                (rdt / BR) / (rdt64 / 64), 3)
        except Exception as exc:
            out["diff_ref_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_families(ntr=200, natoms=8192, nstate=8):
    """Compact throughput probes for the newer kernel families (DESS
    Jacobian; ME-GRE primal + Jacobian, composite-GRE/MPRAGE, balanced
    EPG-X -- all via the simulate() dispatch).
    Pipelined device timings with one-element completion reads (fact
    14: single-shot walls are launch-floor-bound); absolute numbers
    swing with tunnel load -- treat as liveness + order-of-magnitude."""
    import jax
    import epgpy_tpu as epg
    from epgpy_tpu.models.pallas_dess import dess_jacobian_pallas

    rng = np.random.default_rng(12)
    FA = rng.uniform(12.0, 45.0, ntr)
    T1 = rng.uniform(300.0, 2500.0, natoms).astype(np.float32)
    T2 = np.minimum(rng.uniform(20.0, 300.0, natoms),
                    0.8 * T1).astype(np.float32)
    df = rng.uniform(-0.05, 0.05, natoms).astype(np.float32)
    out = {}
    M = 8

    def timed(fn, read):
        t0 = time.perf_counter()
        r = fn()
        read(r)
        warm = time.perf_counter() - t0
        passes = []
        for _ in range(2):      # two pipelined passes -> window spread
            t0 = time.perf_counter()
            for _ in range(M):
                r = fn()
            read(r)
            passes.append((time.perf_counter() - t0) / M)
        return warm, min(passes), round(max(passes) / min(passes), 2)

    # DESS Jacobian kernel (both echoes' dT1/dT2/dB1 columns)
    warm, best, sprd = timed(
        lambda: dess_jacobian_pallas(FA, 0.0, 18.0, 5.0, T1, T2,
                                     np.ones(natoms, np.float32),
                                     nstate=nstate),
        lambda r: float(np.asarray(r[1][1][0][0, 0, 0])))
    out["dess_jac_atoms_per_sec"] = round(natoms / best, 1)
    out["dess_jac_best_seconds"] = round(float(best), 4)
    out["dess_jac_warmup_seconds"] = round(float(warm), 2)
    out["dess_jac_window_spread"] = sprd

    # ME-GRE through the public simulate() dispatch (3 echoes/TR)
    tes = (3.0, 7.0, 11.0)
    seq = []
    for i in range(ntr):
        seq.append(epg.T(float(FA[i]), 0.0))
        prev = 0.0
        for te in tes:
            seq += [epg.E(te - prev, T1, T2, df), epg.ADC]
            prev = te
        seq += [epg.E(5.0, T1, T2, df), epg.S(1)]
    warm, best, sprd = timed(
        lambda: epg.simulate(seq, max_nstate=nstate, asarray=False),
        lambda r: float(np.asarray(r["__c_re"][0, 0])))
    out["megre_atoms_per_sec"] = round(natoms / best, 1)
    out["megre_best_seconds"] = round(float(best), 4)
    out["megre_warmup_seconds"] = round(float(warm), 2)
    out["megre_window_spread"] = sprd

    # ME-GRE Jacobian dispatch: (T2, g)-tracked train, B0-mapping spec
    o1 = ["T2", "g"]
    seqj = []
    for i in range(ntr):
        seqj.append(epg.T(float(FA[i]), 0.0))
        prev = 0.0
        for te in tes:
            seqj += [epg.E(te - prev, T1, T2, df, order1=o1), epg.ADC]
            prev = te
        seqj += [epg.E(5.0, T1, T2, df, order1=o1), epg.S(1)]
    probes = [epg.ADC, epg.Jacobian(["T2", "g"])]
    warm, best, sprd = timed(
        lambda: epg.simulate(seqj, max_nstate=nstate, probe=probes,
                             asarray=False),
        lambda r: float(np.asarray(r[1]["__c_re"][0, 0, 0])))
    out["megre_jac_atoms_per_sec"] = round(natoms / best, 1)
    out["megre_jac_best_seconds"] = round(float(best), 4)
    out["megre_jac_warmup_seconds"] = round(float(warm), 2)
    out["megre_jac_window_spread"] = sprd

    # Composite-GRE dispatch: segmented MPRAGE-style IR train (prep +
    # readout blocks + recovery delays -> match_composite)
    nseg = 8
    nread = ntr // nseg
    seqc = []
    for seg in range(nseg):
        seqc += [epg.T(180.0, 0.0), epg.E(120.0, T1, T2)]
        for i in range(nread):
            seqc += [epg.T(float(FA[seg * nread + i]), 0.0),
                     epg.E(3.0, T1, T2), epg.ADC,
                     epg.E(5.0, T1, T2), epg.S(1)]
        seqc += [epg.E(250.0, T1, T2)]
    warm, best, sprd = timed(
        lambda: epg.simulate(seqc, max_nstate=nstate, asarray=False),
        lambda r: float(np.asarray(r["__c_re"][0, 0])))
    out["composite_atoms_per_sec"] = round(natoms / best, 1)
    out["composite_best_seconds"] = round(float(best), 4)
    out["composite_warmup_seconds"] = round(float(warm), 2)
    out["composite_window_spread"] = sprd

    # Composite-GRE Jacobian dispatch (r4): the same MPRAGE-style train
    # with canonical (T1, T2) tracking + Adc/Jacobian probes -> fused
    # composite tangent kernel (18 planes: only requested groups)
    o1c = ["T1", "T2"]
    seqcj = []
    for seg in range(nseg):
        seqcj += [epg.T(180.0, 0.0), epg.E(120.0, T1, T2, order1=o1c)]
        for i in range(nread):
            seqcj += [epg.T(float(FA[seg * nread + i]), 0.0),
                      epg.E(3.0, T1, T2, order1=o1c), epg.ADC,
                      epg.E(5.0, T1, T2, order1=o1c), epg.S(1)]
        seqcj += [epg.E(250.0, T1, T2, order1=o1c)]
    probc = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
    warm, best, sprd = timed(
        lambda: epg.simulate(seqcj, max_nstate=nstate, probe=probc,
                             asarray=False),
        lambda r: float(np.asarray(r[1]["__c_re"][0, 0, 0])))
    out["composite_jac_atoms_per_sec"] = round(natoms / best, 1)
    out["composite_jac_best_seconds"] = round(float(best), 4)
    out["composite_jac_warmup_seconds"] = round(float(warm), 2)
    out["composite_jac_window_spread"] = sprd
    # in-window INTERLEAVED planner A/B (r5, _ab_best): the r3 judge
    # called out the ~7-14x cliff tracked MPRAGE fits paid on the
    # jacfwd planner -- quantify its removal without letting one
    # contention spike land on a single side
    kread = lambda r: float(np.asarray(r[1]["__c_re"][0, 0, 0]))  # noqa: E731
    pfn = lambda: epg.simulate(seqcj, max_nstate=nstate, probe=probc,  # noqa: E731
                               asarray=False, fisp_kernel=False)
    kread(pfn())                     # warm the planner side
    kb, pb, absprd = _ab_best(
        lambda: epg.simulate(seqcj, max_nstate=nstate, probe=probc,
                             asarray=False), pfn, kread, 2, M=6)
    key = ("composite_jac_vs_planner" if kb >= 0.005 and absprd <= 3.0
           else "composite_jac_vs_planner_unreliable")
    out[key] = round(pb / kb, 1)

    # Composite EPG-X dispatch (r4): segmented MT-prepped GRE
    # (saturation blocks + readout segments + recovery delays) ->
    # match_xcomposite; the structure match_xgre rejects
    dens2 = [0.85, 0.15]
    khi2 = epg.exchange_matrix(0.005, ncomp=2, densities=dens2)
    # 2x atoms for this family: the r5 measurement-fixed kernel runs
    # the 8192-atom train in ~4.9 ms -- under the 5 ms minimum-work
    # bar that keeps the planner A/B honest
    natx = 2 * natoms
    T2x2f = np.concatenate([T2, T2])
    T2p = np.stack([T2x2f, np.full(natx, 0.012, np.float32)], axis=0)
    T1p = np.array([1000.0, 1100.0])
    Xte = epg.X(3.0, khi2, axis=0, T1=T1p, T2=T2p)
    Xtr = epg.X(7.0, khi2, axis=0, T1=T1p, T2=T2p)
    Xrec = epg.X(150.0, khi2, axis=0, T1=T1p, T2=T2p)
    seqx = []
    nseg = 4
    for seg in range(nseg):
        seqx += [epg.R(0, rL=np.asarray([0.0, 0.3]), r0=None), Xrec]
        for i in range(ntr // (2 * nseg)):
            seqx += [epg.T(np.asarray([float(FA[i] / 3), 0.0]), 0.0),
                     Xte, epg.ADC, Xtr, epg.S(1)]
        seqx += [Xrec]
    # NB read pattern: reshape(-1)[0] ON DEVICE, then transfer ONE
    # element -- np.asarray(r["__c_re"]).reshape(...) transfers the whole
    # (nadc, C, B) output (6.6 MB) and was the r4 artifact that made this
    # kernel look 1.3x the planner (true in-window ratio: 4.2x; both sides
    # of the A/B paid the same d2h, compressing the ratio toward 1)
    warm, best, sprd = timed(
        lambda: epg.simulate(seqx, max_nstate=nstate, density=dens2,
                             asarray=False),
        lambda r: float(np.asarray(r["__c_re"].reshape(-1)[0])))
    out["xcomp_atoms_per_sec"] = round(natx / best, 1)
    out["xcomp_best_seconds"] = round(float(best), 4)
    out["xcomp_warmup_seconds"] = round(float(warm), 2)
    out["xcomp_window_spread"] = sprd
    xread = lambda r: float(np.asarray(r["__c_re"].reshape(-1)[0]))  # noqa: E731
    xpfn = lambda: epg.simulate(seqx, max_nstate=nstate, density=dens2,  # noqa: E731
                                asarray=False, fisp_kernel=False)
    xread(xpfn())                    # warm the planner side
    # M=8: the ~8 ms/pass launch+sync floor divides by M and biases the
    # ratio toward 1 on a ~6 ms kernel side
    kb, pb, absprd = _ab_best(
        lambda: epg.simulate(seqx, max_nstate=nstate, density=dens2,
                             asarray=False), xpfn, xread, 2, M=8)
    key = ("xcomp_vs_planner" if kb >= 0.005 and absprd <= 3.0
           else "xcomp_vs_planner_unreliable")
    out[key] = round(pb / kb, 1)

    # Balanced EPG-X (bSSFP-MT): shiftless two-pool train, alternating
    # RF phase (match_xgre balanced=True -> nstate=0 kernel)
    dens = [0.85, 0.15]
    khi = epg.exchange_matrix(0.004, ncomp=2, densities=dens)
    T2x = np.stack([T2, np.full(natoms, 0.02, np.float32)], axis=0)
    T1x = np.array([1000.0, 1100.0])
    X1 = epg.X(3.0, khi, axis=0, T1=T1x, T2=T2x)
    X2 = epg.X(7.0, khi, axis=0, T1=T1x, T2=T2x)
    seqb = []
    for i in range(ntr):
        seqb += [epg.T(np.array([float(FA[i]), 0.0]), 180.0 * (i % 2)),
                 X1, epg.ADC, X2]
    warm, best, sprd = timed(
        lambda: epg.simulate(seqb, density=dens, asarray=False),
        lambda r: float(np.asarray(r["__c_re"].reshape(-1)[0])))
    out["xbssfp_atoms_per_sec"] = round(natoms / best, 1)
    out["xbssfp_best_seconds"] = round(float(best), 4)
    out["xbssfp_warmup_seconds"] = round(float(warm), 2)
    out["xbssfp_window_spread"] = sprd
    return out


def measure_family_parity():
    """Per-family TPU numerical parity probes (r5, VERDICT #3).

    For every fused kernel family, rebuild the golden config
    (tests/golden/*.npz, generated from /root/reference by
    tools/make_golden.py) with epgpy_tpu ops at its tiny shape
    (3-4 atoms, 8-48 TR), run it through the public ``simulate()`` on
    the real TPU, and emit the max |ours - reference| as
    ``<family>_parity``.  The dispatch counter proves the fused kernel
    actually ran: a silent planner fall-through is reported as
    ``<family>_parity_dispatch: false`` (the error would then measure
    the scan planner, not the kernel).  Nearly free (tiny shapes, warm
    entry points shared with the throughput sections); converts the
    CPU-interpret-mode test evidence into driver-visible TPU numbers.
    """
    import epgpy_tpu as epg
    from epgpy_tpu import fisp_dispatch as _fd

    GOLDEN = os.path.join(HERE, "tests", "golden")
    out = {}
    # own wall budget: 8 probes x (compile + run) can reach minutes on
    # a contended tunnel, and a killed bench records NOTHING -- skip
    # remaining probes rather than risk the driver timeout
    t0_par = time.perf_counter()
    budget = float(os.environ.get("BENCH_PARITY_BUDGET", 150))

    def probe(key, name, tag, build, **simkw):
        if time.perf_counter() - t0_par > budget:
            out[f"{key}_parity_skipped"] = "time budget"
            return
        try:
            g = np.load(os.path.join(GOLDEN, f"{name}.npz"))
            seq = build(g)
            before = _fd.DISPATCH_COUNTS.get(tag, 0)
            sig = np.asarray(epg.simulate(seq, **simkw))
            err = float(np.abs(sig - g["signal"]).max())
            out[f"{key}_parity"] = float(f"{err:.3g}")
            if _fd.DISPATCH_COUNTS.get(tag, 0) <= before:
                out[f"{key}_parity_dispatch"] = False
        except Exception as exc:
            out[f"{key}_parity_error"] = f"{type(exc).__name__}: {exc}"[:120]

    def build_mse(g):
        T2s = g["T2s"]
        return [epg.T(90, 90)] + [
            epg.E(4.5, 1400, T2s), epg.S(1), epg.T(150, 0),
            epg.E(4.5, 1400, T2s), epg.S(1), epg.ADC] * 8

    def build_bssfp(g):
        T1s, T2s, dfs, B1s = g["T1s"], g["T2s"], g["dfs"], g["B1s"]
        seq = [epg.T(180 * B1s, 0), epg.E(18.0, T1s, T2s, dfs)]
        for i in range(len(g["FAs"])):
            te = g["TRs"][i] / 2
            seq += [epg.T(g["FAs"][i] * B1s, g["phases"][i]),
                    epg.E(te, T1s, T2s, dfs),
                    epg.Adc(phase=-g["phases"][i]),
                    epg.E(g["TRs"][i] - te, T1s, T2s, dfs)]
        return seq

    def build_dess(g):
        seq = []
        for _ in range(30):
            seq += [epg.T(25, 0),
                    epg.E(5.0, 1000, 80), epg.ADC,
                    epg.E(10.0, 1000, 80), epg.S(1),
                    epg.E(5.0, 1000, 80), epg.ADC]
        return seq

    def build_megre(g):
        tes = [4.0, 9.0, 15.0]
        seq = []
        for i in range(20):
            seq.append(epg.T(15 + i, 0))
            prev = 0.0
            for te in tes:
                seq += [epg.E(te - prev, 900, 70, 0.02), epg.ADC]
                prev = te
            seq += [epg.E(22.0 - prev, 900, 70, 0.02), epg.S(1)]
        return seq

    def build_mprage(g):
        T1s, T2s = g["T1s"], g["T2s"]
        seq = []
        for seg in range(4):
            seq += [epg.T(180, 0), epg.E(120.0, T1s, T2s)]
            for i in range(8):
                seq += [epg.T(9.0 + 0.5 * i + seg, 30.0 * i),
                        epg.E(3.0, T1s, T2s), epg.ADC,
                        epg.E(5.5, T1s, T2s), epg.S(1)]
            seq += [epg.E(250.0, T1s, T2s)]
        return seq

    def build_xgre(g):
        B = 4
        T2f = np.linspace(40.0, 120.0, B)
        T2 = np.stack([T2f, np.full(B, 0.012)], axis=0)
        khi = epg.exchange_matrix(0.005, densities=[0.8, 0.2])
        X = epg.X(10.0, khi, axis=0, T1=np.asarray([1000.0, 1000.0]),
                  T2=T2)
        sat = epg.R(0, rL=np.asarray([0.0, 2.5]), r0=None)
        seq = []
        for _ in range(20):
            seq += [sat, epg.T(np.asarray([10.0, 0.0]), 0), epg.ADC, X,
                    epg.S(1)]
        return seq

    def build_xcomp(g):
        B = 4
        dens = [0.85, 0.15]
        khi = epg.exchange_matrix(0.005, ncomp=2, densities=dens)
        T2f = np.linspace(50.0, 110.0, B)
        T2 = np.stack([T2f, np.full(B, 0.012)], axis=0)
        T1p = np.array([1000.0, 1100.0])
        Xte = epg.X(3.0, khi, axis=0, T1=T1p, T2=T2)
        Xtr = epg.X(7.0, khi, axis=0, T1=T1p, T2=T2)
        Xrec = epg.X(150.0, khi, axis=0, T1=T1p, T2=T2)
        sat = epg.R(0, rL=np.asarray([0.0, 0.3]), r0=None)
        seq = []
        for seg in range(3):
            seq += [sat, Xrec]
            for i in range(6):
                seq += [epg.T(np.asarray([8.0 + i + seg, 0.0]), 0.0),
                        Xte, epg.ADC, Xtr, epg.S(1)]
            seq += [Xrec]
        return seq

    def build_xbssfp(g):
        dens = [0.85, 0.15]
        khi = epg.exchange_matrix(0.004, ncomp=2, densities=dens)
        T1 = [900.0, 400.0]
        T2 = [70.0, 0.02]
        gg = [0.003, 0.0]
        X1 = epg.X(2.3, khi, axis=0, T1=T1, T2=T2, g=gg)
        X2 = epg.X(5.0 - 2.3, khi, axis=0, T1=T1, T2=T2, g=gg)
        seq = []
        for i in range(len(g["FAs"])):
            seq += [epg.R(0, rL=[0.0, 0.3]),
                    epg.T(np.array([g["FAs"][i], 0.0]), g["phases"][i]),
                    X1, epg.ADC, X2]
        return seq

    probe("mse", "cpmg", "mse", build_mse)
    probe("bssfp", "bssfp", "bssfp", build_bssfp)
    probe("dess", "dess", "dess", build_dess, max_nstate=15)
    probe("megre", "megre", "megre", build_megre, max_nstate=12)
    probe("composite", "mprage", "comp", build_mprage)
    probe("xgre", "xgre_parity", "xgre", build_xgre, max_nstate=10,
          density=[0.8, 0.2])
    probe("xcomp", "xcomp_gre", "xcomp", build_xcomp, max_nstate=8,
          density=[0.85, 0.15])
    probe("xbssfp", "xbssfp", "xgre", build_xbssfp,
          density=[0.85, 0.15])
    return out


def measure_recon(dict_re, dict_im, params):
    """Serving-path throughput: steady-state reconstruction of V voxel
    fingerprints against the headline dictionary in a rank-32
    compressed subspace (McGivney 2014) -- one jitted
    parallel.mrf_reconstruct call per batch (project + match + complex
    PD recovery + map gather).  vs_baseline: single-core NumPy
    full-length complex matching (the reference user's only option),
    cached and compared per-voxel."""
    import jax
    import jax.numpy as jnp
    from epgpy_tpu.parallel import mrf_reconstruct

    V, RANK = 8192, 32
    B, P = dict_re.shape
    f32 = jnp.float32

    t0 = time.perf_counter()
    zero = jnp.zeros((1, P), f32)
    comp = mrf_reconstruct(zero, zero, dict_re, dict_im,
                           rank=RANK)["compression"]
    compress_seconds = time.perf_counter() - t0

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    idx = jax.random.randint(k1, (V,), 0, B)
    pd = jax.random.uniform(k2, (V,), minval=0.5, maxval=2.0)

    # NB: the dictionary MUST be a jit argument, not a closure capture --
    # captured device arrays are baked into the program as constants and
    # the axon remote-compile payload explodes (HTTP 413 at 2 x 400 MB)
    @jax.jit
    def synth(dre, dim, idx, pd, k):
        sre = jnp.take(dre, idx, axis=0) * pd[:, None]
        sim = jnp.take(dim, idx, axis=0) * pd[:, None]
        noise = jax.random.normal(k, (2, V, P), f32) * 1e-5
        return sre + noise[0], sim + noise[1]

    sre, sim = synth(dict_re, dict_im, idx, pd, k3)
    params = jnp.asarray(params, f32)
    compkeys = ("basis_re", "basis_im", "cdict_re", "cdict_im")
    comp_args = tuple(jnp.asarray(comp[k], f32) for k in compkeys)

    @jax.jit
    def run(a, b, dre, dim, prm, *cvals):
        return mrf_reconstruct(a, b, dre, dim, prm,
                               compression=dict(zip(compkeys, cvals)))

    def rsync(o):
        return int(np.asarray(o["index"][-1]))

    t0 = time.perf_counter()
    first = run(sre, sim, dict_re, dict_im, params, *comp_args)
    rsync(first)
    warm = time.perf_counter() - t0
    best, _, rsprd = _pipelined_best(
        lambda: run(sre, sim, dict_re, dict_im, params, *comp_args),
        rsync, REPEATS, M=5)
    # accuracy in PARAMETER space: the atom grid is tiled (duplicate
    # rows) and B1 neighbors nearly coincide, so raw index equality
    # under-reports -- compare the gathered (T1, T2, B1) rows instead
    hp = np.asarray(jax.device_get(first["maps"]))
    tp = np.asarray(params)[np.asarray(jax.device_get(idx))]
    acc = float(np.mean(np.all(hp == tp, axis=1)))
    t1_rms = float(np.sqrt(np.mean((hp[:, 0] - tp[:, 0]) ** 2)))
    out = {"recon_voxels_per_sec": round(V / best, 1),
           "recon_best_seconds": round(float(best), 4),
           "recon_natoms": int(B), "recon_rank": RANK,
           "recon_compress_seconds": round(compress_seconds, 2),
           "recon_window_spread": rsprd,
           "recon_warmup_seconds": round(warm, 2),
           "recon_match_accuracy": round(acc, 4),
           "recon_t1_rms_err_ms": round(t1_rms, 2)}

    REF_V = 64
    REF_B = 4096        # matching cost is linear in atoms: measure the
                        # NumPy baseline at a reduced dictionary (a
                        # full-size host complex128 dictionary is ~3.3
                        # GB on the 1-CPU box) and scale to B

    def _time_ref():
        rng = np.random.default_rng(0)
        D = (rng.standard_normal((REF_B, P))
             + 1j * rng.standard_normal((REF_B, P)))
        Sv = (rng.standard_normal((REF_V, P))
              + 1j * rng.standard_normal((REF_V, P)))
        Dn = D / np.linalg.norm(D, axis=1, keepdims=True)
        t0 = time.perf_counter()
        corr = np.abs(Sv.conj() @ Dn.T)
        corr.argmax(axis=1)
        return time.perf_counter() - t0

    try:
        rdt = _cached_ref_seconds(f"recon_{REF_B}x{P}x{REF_V}", _time_ref)
        rdt_scaled = rdt * (B / REF_B)
        out["recon_vs_baseline"] = round((V / best) / (REF_V / rdt_scaled), 1)
        out["recon_ref_seconds"] = round(float(rdt_scaled), 3)
        out["recon_ref_nvox"] = REF_V
        out["recon_ref_natoms_measured"] = REF_B
    except Exception as exc:
        out["recon_error_ref"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def measure_roofline():
    """Measured single-chip roofline (r4, VERDICT #2).

    Four ceilings, all pipelined (fact 14: single-shot walls are
    launch-floor-bound):

    - ``vpu_f32_tflops``: raw fma peak -- 4 independent fma chains on
      an (8, 512) block that stays in vector REGISTERS (measured
      ~7.8 TFLOP/s = 8x128 lanes x 4 ALUs x 2 flops x ~0.94 GHz).
    - ``vmem_madd_tflops``: the same fma chains on a (256, 512) block
      whose accumulators live in VMEM (loop-carried ld/ld/st per fma).
      This is the ATTAINABLE ceiling for plane-resident EPG kernels,
      whose state planes are VMEM arrays by construction
      (~1-1.5 TFLOP/s, i.e. ~6-9 TB/s of VMEM traffic at 12 B/fma).
    - ``hbm_gbps``: K forced passes over a 256 MB buffer (a single
      y = x + 1 is ~0.6 ms of traffic -- host-dispatch bound even
      pipelined; the fori_loop materializes y every iteration).
    - ``mxu_{bf16,f32_highest}_tflops``: n=8192 / n=4096 matmuls
      (per-call input perturbed: identical repeated dispatches measure
      suspiciously fast through the tunnel).

    These anchor the ``*_flops_frac`` / ``*_bw_frac`` fractions in
    main(); see docs/performance.md "Roofline".
    """
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial
    from jax.experimental import pallas as pl

    out = {}
    f32 = jnp.float32

    def _sync1(o):
        return float(np.asarray(o.reshape(-1)[0]))

    def _vpu_rate(R, C, chains, iters):
        def kern(x_ref, o_ref):
            x = x_ref[...]
            accs = [x * (1.0 + 1e-6 * j) for j in range(chains)]

            def body(i, accs):
                # fma chains with a data dependence Mosaic cannot fold
                return tuple(a * 0.9999998 + x for a in accs)

            accs = jax.lax.fori_loop(0, iters, body, tuple(accs))
            o_ref[...] = sum(accs[1:], accs[0])

        xin = jnp.full((R, C), 0.5, f32)
        run = jax.jit(lambda x: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, C), f32))(x))
        _sync1(run(xin))
        best, _, _ = _pipelined_best(lambda: run(xin), _sync1, REPEATS, M=8)
        return 2.0 * chains * R * C * iters / best

    # per-call work >= ~5 ms: sub-ms probes read as launch floor under
    # tunnel contention (a 0.4 ms register probe once measured SLOWER
    # than the VMEM one)
    out["roofline_vpu_f32_tflops"] = round(
        _vpu_rate(8, 512, 4, 1_000_000) / 1e12, 2)
    out["roofline_vmem_madd_tflops"] = round(
        _vpu_rate(256, 512, 8, 8_000) / 1e12, 2)

    N, K = 1 << 26, 16
    xs = jnp.arange(N, dtype=f32)
    stream = jax.jit(lambda x: jax.lax.fori_loop(
        0, K, lambda i, y: y + 1.0, x))
    _sync1(stream(xs))
    best, _, _ = _pipelined_best(lambda: stream(xs), _sync1, REPEATS, M=4)
    out["roofline_hbm_gbps"] = round(2.0 * 4 * N * K / best / 1e9, 1)

    import itertools
    for name, n, prec in (("bf16", 8192, None),
                          ("f32_highest", 4096,
                           jax.lax.Precision.HIGHEST)):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (n, n), f32)
        # 4 pre-built input variants cycled per call: repeated
        # IDENTICAL dispatches measure suspiciously fast through the
        # tunnel, and an in-call perturbation would add its own
        # elementwise traffic to the timing
        variants = [A + 1e-6 * j for j in range(4)]
        mm = jax.jit(lambda a, b, prec=prec: (
            a @ b if prec is None
            else jnp.matmul(a, b, precision=prec)))
        it = itertools.cycle(variants)
        _sync1(mm(A, A))
        best, _, _ = _pipelined_best(
            lambda: mm(next(it), A), _sync1, REPEATS, M=8)
        out[f"roofline_mxu_{name}_tflops"] = round(
            2.0 * n ** 3 / best / 1e12, 2)
    return out


def efficiency_fracs(engine, headline_best, headline_atoms, npulse,
                     nstate):
    """Absolute-efficiency fractions (r4, VERDICT #2): sustained
    FLOP/s (or bytes/s) of the measured kernels as a fraction of the
    roofline peaks measured in the same bench run.

    FLOP models are hand-audited madd counts of the kernel step
    functions (real FLOPs per atom x TR; transcendental/scalar
    per-atom coefficient work is counted once as the additive
    constant):

    - FISP primal (models/pallas_fisp._kernel_half): 8 complex madds
      x (nstate+1) folded rows = 64*(nstate+1) plane FLOPs + ~50
      scalar/echo FLOPs per atom-TR.
    - CPMG/MSE primal: two halves per echo -> 128*(nstate+1) + ~60
      per signal-echo.
    - bSSFP: whole ladder at k=0 -> ~60 FLOPs per atom-TR.
    - Hessian kernel: 9 folded plane groups with the tangent index on
      the lane axis -> 9 * 64*(nstate+1) * lanes FLOPs per TR (lanes =
      pulses padded to 128).
    - dictionary match (recon): HBM-bound -- model 4 passes over the
      (V, B) correlation plane (two matmul writes re/im + the fused
      |corr|^2 argmax read) = 4*V*B*4 bytes per call.

    The FLOP fractions are against ``roofline_vpu_f32_tflops`` (the
    register-resident fma peak).  The plane-resident kernels sit
    BETWEEN the two measured ceilings: well above the naive
    1-madd-per-VMEM-roundtrip chain rate (they do ~8 madds per loaded
    plane element -- operand reuse inside each TR step) but below raw
    fma peak (every TR still streams all planes through VMEM).  See
    docs/performance.md "Roofline" for the interpretation.
    """
    fr = {}
    vpu = engine.get("roofline_vpu_f32_tflops")
    hbm = engine.get("roofline_hbm_gbps")
    H = nstate + 1

    def guarded(key, work, seconds, peak_per_s):
        """Emit `key` only when the measurement can support it (r5,
        VERDICT #1b): the underlying best must carry >= 5 ms of device
        work (sub-5 ms pipelined slopes read as launch floor under
        tunnel contention -- r4's judge re-run produced an impossible
        hessian_flops_frac of 1.14 from a 0.3 ms sample) and the
        implied rate must not exceed the same-run measured peak.
        Otherwise the value lands under `key + "_unreliable"` so the
        diagnostic survives without publishing a bogus efficiency."""
        if not seconds or not peak_per_s:
            return
        frac = round(work / seconds / peak_per_s, 3)
        if seconds < 0.005 or frac > 1.0:
            fr[key + "_unreliable"] = frac
        else:
            fr[key] = frac

    if vpu:
        vpu_fs = vpu * 1e12
        # headline FISP dictionary kernel
        guarded("fisp_flops_frac",
                headline_atoms * npulse * (64.0 * H + 50.0),
                headline_best, vpu_fs)
        # CPMG at the scaled minimum-work config (mse_big: 18 echoes,
        # nstate from its own train: engine caps at the echo count ->
        # H_mse = 19); the published 5,000-signal config stays for the
        # vs-reference ratio but is ~0.3 ms -- too small for a frac
        guarded("mse_flops_frac",
                float(engine.get("mse_big_nsig", 64000)) * 18
                * (128.0 * 19 + 60.0),
                engine.get("mse_big_best_seconds"), vpu_fs)
        guarded("bssfp_flops_frac",
                float(engine.get("bssfp_natoms", 65536))
                * engine.get("bssfp_ntr", 500) * 60.0,
                engine.get("bssfp_best_seconds"), vpu_fs)
        # Hessian kernel FLOP model (lane-axis reconciliation, r5):
        # the kernel runs 9 plane GROUPS of H=11 rows x Na lanes, where
        # Na = ceil(ntr/128)*128 is the lane-padded PULSE count -- the
        # per-pulse tangent index rides the lane axis WITHIN each
        # group, so the 6N+3 total tangents are carried as 9 x Na lane
        # slots (replication + padding), and 9*64*H*Na FLOPs/TR/atom is
        # the physical madd count of the step function
        # (models/pallas_hessian._kernel_hess).  hessian_call_seconds
        # covers hessian_natoms atoms via the kernel's atom grid.
        ntr = engine.get("hessian_ntr", 400)
        lanes = max(-(-ntr // 128) * 128, 128)
        guarded("hessian_flops_frac",
                engine.get("hessian_natoms", 1) * ntr * 9.0 * 64.0 * 11
                * lanes,
                engine.get("hessian_call_seconds"), vpu_fs)
    rb = engine.get("recon_match_seconds") or engine.get(
        "recon_best_seconds")
    if hbm and rb:
        v = engine.get("recon_nvox", 8192)
        # 4-pass model is an UPPER bound on the (V, B) plane traffic
        # (2 matmul writes + the fused |corr|^2 argmax reads); XLA
        # output-fusion can eliminate passes, so a >1 result means the
        # match moves FEWER bytes than the model -- still filed under
        # _unreliable by the guard (the model, not the kernel, is the
        # weak link there)
        bytes_ = 4.0 * v * headline_atoms * 4
        fr["match_apparent_gbps"] = round(bytes_ / rb / 1e9, 1)
        guarded("match_bw_frac", bytes_, rb, hbm * 1e9)
    return fr


def main():
    import jax
    from epgpy_tpu.models.mrf import fisp_mrf_dictionary

    t_main = time.perf_counter()
    # a driver kill (SIGTERM via `timeout`) must not eat the whole
    # record: print what has been measured so far, flagged partial
    try:
        signal.signal(signal.SIGTERM, _emit_partial)
        signal.signal(signal.SIGINT, _emit_partial)
    except (ValueError, OSError):
        pass                      # non-main thread / exotic platform

    FA = make_train(NPULSE)
    T1, T2, B1 = make_atoms(NATOMS)

    kernels = {
        "xla-scan": lambda: fisp_mrf_dictionary(
            FA, TR, TE, T1, T2, B1, nstate=NSTATE, phi=90.0),
    }
    which = os.environ.get("BENCH_KERNEL", "auto")
    if which in ("auto", "pallas") and jax.devices()[0].platform != "cpu":
        from epgpy_tpu.models.pallas_fisp import fisp_dictionary_pallas
        kernels["pallas"] = lambda: fisp_dictionary_pallas(
            FA, 90.0, TR, TE, T1, T2, B1, nstate=NSTATE)
    if which in kernels and which != "auto":
        kernels = {which: kernels[which]}

    def sync(out):
        # block_until_ready can return early through the axon tunnel;
        # a 1-element device read is the only honest completion barrier.
        jax.block_until_ready(out)
        return float(np.asarray(out[0][-1, -1]))

    best, warmup, best_kernel, out, spread = np.inf, 0.0, None, None, None
    for name, run in kernels.items():
        t0 = time.perf_counter()
        o = run()
        sync(o)
        warmup += time.perf_counter() - t0
        # pipelined dispatch: subtract the ~40 ms per-execution
        # launch+sync floor of the tunnel (see _pipelined_best)
        dt, _, dsprd = _pipelined_best(run, sync, REPEATS, M=5)
        if dt < best:
            best, best_kernel, out, spread = dt, name, o, dsprd
    atoms_per_sec = NATOMS / best
    _RESULT.update({"value": round(float(atoms_per_sec), 1),
                    "natoms": NATOMS, "npulse": NPULSE,
                    "best_seconds": round(float(best), 4),
                    "window_spread": spread, "kernel": best_kernel,
                    "device": str(jax.devices()[0])})

    # baseline throughput + c64 parity probe on the 8 leading atoms
    # (full float64 parity <= 1e-10 is asserted in tests/test_mrf.py)
    baseline = get_baseline(FA, T1, T2, B1)
    vs_baseline = None
    parity = None
    if baseline:
        vs_baseline = atoms_per_sec / baseline["atoms_per_sec"]
        _RESULT["vs_baseline"] = round(float(vs_baseline), 1)
        if "probe_re" in baseline and baseline["npulse"] == NPULSE:
            ref8 = (np.asarray(baseline["probe_re"])
                    + 1j * np.asarray(baseline["probe_im"])).T  # (8, P)
            re, im = out
            ours = np.asarray(re[:8]) + 1j * np.asarray(im[:8])
            parity = float(np.abs(ours - ref8).max())

    engine = _RESULT            # sections accumulate into the shared
    t_sections = time.perf_counter()   # partial-emission dict (r5)
    # global wall deadline: a collapsed tunnel window can stretch ONE
    # section arbitrarily; past this, remaining sections are skipped so
    # the JSON line lands before any external kill
    deadline = float(os.environ.get("BENCH_WALL_DEADLINE", 1200))
    # 270 s default (r5, was 360): the budget is checked BEFORE each
    # section, so the worst case is budget + one contended section
    # (~2-3 min) + the parity probes (own 150 s budget) + roofline.
    # A fully-loaded tunnel run measured 991 s wall with 300/240 --
    # keep the knobs tight so a driver timeout can't eat the JSON line
    budget = float(os.environ.get("BENCH_TIME_BUDGET", 270))

    def within_budget(name):
        # the headline metric above is always measured; optional
        # sections stop once the cumulative budget is spent (tunnel
        # contention can triple section times -- better a JSON line
        # with a few sections marked skipped than a killed process
        # that records nothing).  The wall deadline additionally
        # covers the collapsed-window case where a single section
        # overruns the whole budget.
        if time.perf_counter() - t_main > deadline:
            engine[name + "_skipped"] = "wall deadline"
            return False
        if time.perf_counter() - t_sections <= budget:
            return True
        engine[name + "_skipped"] = "time budget"
        return False

    if os.environ.get("BENCH_ENGINE", "1") not in ("0", "false") \
            and within_budget("engine"):
        try:
            engine = measure_engine(FA, T1, T2, B1)
        except Exception as exc:  # keep the headline metric alive
            engine = {"engine_error": f"{type(exc).__name__}: {exc}"[:200]}
    if os.environ.get("BENCH_TABLE", "1") not in ("0", "false") \
            and within_budget("table"):
        try:
            engine.update(measure_table())
        except Exception as exc:
            engine["table_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if os.environ.get("BENCH_JAC", "1") not in ("0", "false") \
            and within_budget("jac"):
        try:
            engine.update(measure_jacobian(FA, T1, T2, B1))
        except Exception as exc:
            engine["jac_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if os.environ.get("BENCH_DIFF", "1") not in ("0", "false") \
            and within_budget("diff"):
        try:
            engine.update(measure_engine_diff(T1, T2, B1))
        except Exception as exc:
            engine["diff_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if os.environ.get("BENCH_MSE", "1") not in ("0", "false") \
            and within_budget("mse"):
        try:
            engine.update(measure_mse())
        except Exception as exc:
            engine["mse_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if os.environ.get("BENCH_BSSFP", "1") not in ("0", "false") \
            and within_budget("bssfp"):
        try:
            engine.update(measure_bssfp())
        except Exception as exc:
            engine["bssfp_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if os.environ.get("BENCH_EXCHANGE", "1") not in ("0", "false") \
            and within_budget("exchange"):
        try:
            engine.update(measure_exchange())
        except Exception as exc:
            engine["exchange_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if os.environ.get("BENCH_DIFF3D", "1") not in ("0", "false") \
            and within_budget("diff3d"):
        try:
            engine.update(measure_diffusion3d())
        except Exception as exc:
            engine["diff3d_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if os.environ.get("BENCH_PRUNE", "1") not in ("0", "false") \
            and within_budget("prune"):
        try:
            engine.update(measure_prune())
        except Exception as exc:
            engine["prune_error"] = f"{type(exc).__name__}: {exc}"[:200]

    if os.environ.get("BENCH_HESSIAN", "1") not in ("0", "false") \
            and within_budget("hessian"):
        try:
            engine.update(measure_hessian())
        except Exception as exc:
            engine["hessian_error"] = f"{type(exc).__name__}: {exc}"[:200]

    if os.environ.get("BENCH_RECON", "1") not in ("0", "false") \
            and within_budget("recon"):
        try:
            atom_params = np.stack([np.asarray(T1), np.asarray(T2),
                                    np.asarray(B1)], axis=1)
            engine.update(measure_recon(out[0], out[1], atom_params))
        except Exception as exc:
            engine["recon_error"] = f"{type(exc).__name__}: {exc}"[:200]

    if os.environ.get("BENCH_FAMILIES", "1") not in ("0", "false") \
            and within_budget("families"):
        try:
            engine.update(measure_families())
        except Exception as exc:
            engine["families_error"] = f"{type(exc).__name__}: {exc}"[:200]

    # r5: per-family TPU parity probes -- correctness evidence, so they
    # run even when the time budget is spent (tiny shapes; the cost is
    # a handful of cached kernel compiles)
    if os.environ.get("BENCH_PARITY", "1") not in ("0", "false") \
            and time.perf_counter() - t_main < deadline:
        try:
            engine.update(measure_family_parity())
        except Exception as exc:
            engine["parity_error"] = f"{type(exc).__name__}: {exc}"[:200]

    # r4: measured roofline + absolute-efficiency fractions (cheap:
    # ~4 pipelined microbenchmarks; runs even when the budget is spent
    # so BENCH always states absolute efficiency)
    if os.environ.get("BENCH_ROOFLINE", "1") not in ("0", "false") \
            and time.perf_counter() - t_main < deadline + 120:
        try:
            engine.update(measure_roofline())
            engine.update(efficiency_fracs(
                engine, best, NATOMS, NPULSE, NSTATE))
        except Exception as exc:
            engine["roofline_error"] = f"{type(exc).__name__}: {exc}"[:200]

    result = {
        "metric": "mrf_fisp_atoms_per_sec",
        "value": round(float(atoms_per_sec), 1),
        "unit": "atoms/s",
        "vs_baseline": None if vs_baseline is None else round(float(vs_baseline), 1),
        "natoms": NATOMS, "npulse": NPULSE, "nstate": NSTATE,
        "best_seconds": round(float(best), 4),
        "window_spread": spread,
        "warmup_seconds": round(float(warmup), 2),
        "kernel": best_kernel,
        "device": str(jax.devices()[0]),
        "parity_c64_vs_ref": parity,
        **{k: v for k, v in engine.items()
           if k not in ("metric", "value", "unit", "vs_baseline",
                        "natoms", "npulse", "best_seconds",
                        "window_spread", "kernel", "device")},
    }
    result["bench_wall_seconds"] = round(time.perf_counter() - t_main, 1)
    # tail-robust duplicate of the north-star keys (r5, VERDICT #6):
    # the driver stores the TAIL of stdout and clipped the leading
    # headline keys out of BENCH_r03/r04 -- repeating them at the END
    # of the same JSON line means any truncation eats secondary
    # metrics, never the headline
    result["headline"] = {
        "metric": result["metric"], "value": result["value"],
        "unit": result["unit"], "vs_baseline": result["vs_baseline"],
        "best_seconds": result["best_seconds"],
        "window_spread": result["window_spread"],
        "kernel": result["kernel"],
        "parity_c64_vs_ref": result["parity_c64_vs_ref"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
