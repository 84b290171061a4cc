"""MR fingerprinting: dictionary generation + matching
(reference examples/profiling/differentiation_mrf.py workflow)."""

import os
import time

import numpy as np
import jax.numpy as jnp

from epgpy_tpu.models.mrf import fisp_mrf_dictionary
from epgpy_tpu.parallel import dictionary_match


def main():
    # variable flip-angle train
    P = int(os.environ.get("DICT_NPULSE", 500))
    FA = 10 + 50 * np.abs(np.sin(np.arange(P) * 2 * np.pi / 250))

    # T1 x T2 atom grid
    n = int(os.environ.get("DICT_NGRID", 60))
    T1 = np.linspace(200, 2000, n)
    T2 = np.linspace(20, 200, n)
    g = np.stack(np.meshgrid(T1, T2, indexing="ij"), -1).reshape(-1, 2)
    g = g[g[:, 1] < 0.8 * g[:, 0]]  # physical atoms only
    print(f"dictionary: {len(g)} atoms x {P} pulses")

    t0 = time.perf_counter()
    re, im = fisp_mrf_dictionary(FA, 12.0, 5.0, g[:, 0], g[:, 1],
                                 nstate=10, normalize=True)
    re.block_until_ready()
    print(f"generated in {time.perf_counter() - t0:.2f}s")

    # match noisy copies of a few atoms
    rng = np.random.default_rng(0)
    picks = rng.integers(0, len(g), 5)
    sig_re = np.asarray(re)[picks] + 0.003 * rng.normal(size=(5, P))
    sig_im = np.asarray(im)[picks] + 0.003 * rng.normal(size=(5, P))
    idx, corr = dictionary_match(re, im, jnp.asarray(sig_re), jnp.asarray(sig_im))
    print("true atoms:   ", picks)
    print("matched atoms:", np.asarray(idx))
    print("recovered (T1, T2):", g[np.asarray(idx)].round(1).tolist())


if __name__ == "__main__":
    main()
