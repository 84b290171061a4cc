"""CRLB-optimal MRF flip-angle train design (reference
examples/sequence/optim_mrf.py, reimagined as a sharded gradient descent)."""

import numpy as np
import jax
import jax.numpy as jnp

from epgpy_tpu.parallel import make_mesh, crlb_train_step, fingerprint_crlb_loss


def main():
    # prefer the multi-device CPU mesh when the accelerator is a single chip
    devices = jax.devices()
    if len(devices) == 1:
        try:
            cpus = jax.devices("cpu")
            if len(cpus) > len(devices):
                devices = cpus
        except RuntimeError:
            pass
    tang = 2 if len(devices) % 2 == 0 and len(devices) >= 2 else 1
    mesh = make_mesh(devices, axes=("atoms", "tangents"),
                     shape=(len(devices) // tang, tang))
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # atom grid (sharded over the mesh) and initial FA train
    n_atoms = 8 * (len(devices) // tang)
    T1s = jnp.asarray(np.linspace(400.0, 1400.0, n_atoms))
    T2s = jnp.asarray(np.linspace(40.0, 110.0, n_atoms))
    FA = jnp.asarray(np.full(16, 30.0))

    step = jax.jit(lambda fa, t1, t2: crlb_train_step(
        fa, t1, t2, mesh, lr=2.0, nstate=4, fa_weight=0.0))

    loss0 = fingerprint_crlb_loss(FA, T1s, T2s, mesh, nstate=4, fa_weight=0.0)
    for i in range(20):
        FA, loss = step(FA, T1s, T2s)
    print(f"CRLB: {float(loss0):.4g} -> {float(loss):.4g}")
    print("optimized FA train:", np.asarray(FA).round(1))


if __name__ == "__main__":
    main()
