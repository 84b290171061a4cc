"""Warm-path regression pin (r5, VERDICT #7).

``tools/warm_serving.py`` closes the serving cold-start problem by
priming the SAME jitted entry points the serving pipeline uses (the
compile-cache keys include shapes and -- for Mosaic binaries -- the jit
wrapper identity, CLAUDE.md fact 15).  That contract is easy to break
silently: a rename, a new default kwarg, or a dtype drift in either
warm_serving or the serving code paths un-warms a stage and nobody
notices until a production cold start regresses by minutes.

This test pins the contract mechanically: run ``warm_serving`` at toy
shapes against a FRESH persistent-cache dir, then drive a user-style
serving pipeline (new op objects, new data, same shapes) and assert it
triggers ZERO new backend compilations.  Compilations are counted via
the ``/jax/compilation_cache/cache_misses`` monitoring event (a
persistent-cache HIT -- e.g. the user's own ``jax.jit`` wrapper around
``mrf_reconstruct`` re-tracing an identical program -- is allowed; an
actual compile is the regression).
"""

import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

# toy shapes -- compile keys are shape-specific, so warm and serve must
# agree exactly (that agreement is part of what this test pins)
NATOMS, NPULSE, NSTATE, NVOX, RANK = 64, 12, 4, 32, 4
TRv, TEv = 12.0, 5.0


def _user_inputs():
    """Same VALUES as warm_serving's internal inputs (rng seed 0 and
    formulas mirrored), wrapped in fresh array objects.

    Value-identical on purpose: on CPU this exercises the scan-PLANNER
    diff path, which bakes host-known op leaves into the traced program
    as constants -- different parameter values are a genuinely
    different program there (on TPU the serving jac path routes to the
    Pallas dispatch, where parameters are jit arguments and values
    never enter the cache key).  Identical values still pin what this
    test is for: any structural drift between warm_serving's entry
    points and the serving pipeline's shows up as a backend compile."""
    rng = np.random.default_rng(0)
    FA = (10 + 50 * np.abs(np.sin(np.arange(NPULSE) * 2 * np.pi / 500))
          ).astype(np.float32)
    T1 = rng.uniform(200, 3000, NATOMS).astype(np.float32)
    T2 = np.minimum(rng.uniform(15, 400, NATOMS), 0.8 * T1).astype(
        np.float32)
    B1 = rng.uniform(0.75, 1.25, NATOMS).astype(np.float32)
    return FA.copy(), T1.copy(), T2.copy(), B1.copy()


def _sync(x):
    return float(np.asarray(x).reshape(-1)[0])


def test_warm_serving_pins_entry_points(tmp_path):
    from warm_serving import warm_serving
    import epgpy_tpu as epg
    from epgpy_tpu import engine, fisp_dispatch
    from epgpy_tpu.models.mrf import fisp_mrf_dictionary
    from epgpy_tpu.parallel import mrf_reconstruct

    # hermetic caches: a shared persistent dir (or live tracing caches
    # from earlier test modules) would mask an un-warmed stage as a hit
    jax.clear_caches()
    engine.clear_caches()
    fisp_dispatch.clear_cache()
    old_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))

    state = {"active": True, "events": []}

    def listener(name, **kw):
        if state["active"]:
            state["events"].append(name)

    jax.monitoring.register_event_listener(listener)
    try:
        warm_serving(natoms=NATOMS, npulse=NPULSE, nstate=NSTATE,
                     nvox=NVOX, rank=RANK, steady_repeats=1)
        warm_misses = state["events"].count(
            "/jax/compilation_cache/cache_misses")
        # the counter itself must be live: warming against an empty
        # cache dir MUST have compiled something
        assert warm_misses > 0, "compile-miss counter saw no events"
        mark = len(state["events"])

        # --- user-style serving pipeline: fresh ops/data, same shapes
        FA, T1, T2, B1 = _user_inputs()

        # dictionary build (XLA scan entry point)
        _sync(fisp_mrf_dictionary(FA, TRv, TEv, T1, T2, B1,
                                  nstate=NSTATE)[0][-1, -1])

        # steady-state batches via the public simulate() (dispatch /
        # planner entry) -- new operator instances on purpose: the
        # preamble cache memoizes per op identity, but the jitted
        # executors must hit their tracing caches on shape
        seq, seqj = [], []
        for i in range(NPULSE):
            seq += [epg.T(float(FA[i]) * B1, 90.0),
                    epg.E(TEv, T1, T2), epg.ADC,
                    epg.E(TRv - TEv, T1, T2), epg.S(1)]
            o1 = {"order1": ["T1", "T2"]}
            seqj += [epg.T(float(FA[i]) * B1, 90.0),
                     epg.E(TEv, T1, T2, **o1), epg.ADC,
                     epg.E(TRv - TEv, T1, T2, **o1), epg.S(1)]
        _sync(epg.simulate(seq, max_nstate=NSTATE,
                           asarray=False)["__c_re"])
        probes = [epg.ADC, epg.Jacobian(["magnitude", "T1", "T2"])]
        _sync(epg.simulate(seqj, max_nstate=NSTATE, probe=probes,
                           asarray=False)[1]["__c_re"])

        # reconstruction through the user's OWN jit wrapper (the
        # serving idiom, docs/serving.md): re-tracing an identical
        # program is a persistent-cache HIT, which is fine -- only an
        # actual compile counts as un-warmed
        rng = np.random.default_rng(3)
        dre = np.asarray(rng.standard_normal((NATOMS, NPULSE)),
                         np.float32)
        dim = np.asarray(rng.standard_normal((NATOMS, NPULSE)),
                         np.float32)
        comp = mrf_reconstruct(np.zeros((1, NPULSE), np.float32),
                               np.zeros((1, NPULSE), np.float32),
                               dre, dim, rank=RANK)["compression"]
        keys = tuple(sorted(comp))
        serve = jax.jit(lambda a, b, dr, di, *cv: mrf_reconstruct(
            a, b, dr, di, compression=dict(zip(keys, cv))))
        sre = np.asarray(rng.standard_normal((NVOX, NPULSE)), np.float32)
        sim = np.asarray(rng.standard_normal((NVOX, NPULSE)), np.float32)
        _sync(serve(sre, sim, dre, dim,
                    *(comp[k] for k in keys))["index"][-1])

        new = state["events"][mark:]
        misses = new.count("/jax/compilation_cache/cache_misses")
        assert misses == 0, (
            f"user-style serving pipeline triggered {misses} backend "
            f"compile(s) after warm_serving -- a serving entry point "
            f"is no longer covered by the warm path (events: "
            f"{[e for e in new if 'cache' in e]})")
    finally:
        state["active"] = False
        jax.config.update("jax_compilation_cache_dir", old_dir)
