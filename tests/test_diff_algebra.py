"""Exact-arithmetic differentiation algebra tests.

The reference validates its chain-rule accumulation with dummy operators
whose derivatives are constant scalar factors (reference
test/test_diff.py:114-279).  Here the accumulation is jacfwd through the
epsilon substitution (epgpy_tpu/diff.py), and the same algebra is pinned
down with ScalarOps carrying constant `darrs`/`d2arrs` derivative arrays:
every Jacobian/Hessian entry below has a hand-computed closed form and is
checked to ~1e-12 (not just finite differences).
"""

import numpy as np

import epgpy_tpu as epg


def _diag(fp, z):
    """Symmetric coefficient triplet (fp, conj fp, z)."""
    return [fp, np.conj(fp), z]


A0, DX, DY, DXX, DXY = 0.8, 0.1, 0.05, 0.02, 0.03


def _op(order1, order2=False):
    """Diagonal op with constant derivative coefficient arrays.

    arr(x, y) model: arr = A0 + x DX + y DY + x^2/2 DXX + xy DXY
    (all on the F+ element; Z element constant 1).
    """
    return epg.ScalarOp(
        _diag(A0, 1.0),
        darrs={"x": np.asarray(_diag(DX, 0.0)),
               "y": np.asarray(_diag(DY, 0.0))},
        d2arrs={("x", "x"): np.asarray(_diag(DXX, 0.0)),
                ("x", "y"): np.asarray(_diag(DXY, 0.0))},
        order1=order1, order2=order2,
    )


def _probe(seq, jac_vars=None, hess=None):
    probes = [epg.ADC]
    if jac_vars:
        probes.append(epg.Jacobian(jac_vars))
    if hess:
        probes.append(epg.Hessian(*hess))
    return epg.simulate([epg.T(90, 90)] + seq + [epg.ADC], probe=probes)


def test_order1_identity_spec():
    """order1=True tracks each parameter as its own variable: the
    derivative is exactly the darrs coefficient times the state."""
    sig, jac = _probe([_op(True)], jac_vars=["x", "y"])
    # F0 after T(90,90) is 1; after the op: A0
    assert np.allclose(sig, A0, atol=1e-12)
    assert np.allclose(jac[..., 0], DX, atol=1e-12)
    assert np.allclose(jac[..., 1], DY, atol=1e-12)


def test_order1_composed_coefficients():
    """order1={z: {x: c1, y: c2}} composes: df/dz = c1 df/dx + c2 df/dy."""
    sig, jac = _probe([_op({"z": {"x": -1.0, "y": -2.0}})], jac_vars=["z"])
    assert np.allclose(jac[..., 0], -1.0 * DX + -2.0 * DY, atol=1e-12)


def test_order1_alias_variables_accumulate():
    """The same physical parameter aliased on two ops accumulates via the
    product rule: d(a1 a2)/dx1 = (da/dx) a2 at op1, etc."""
    op1 = _op({"x1": "x"})
    op2 = _op({"x2": "x"})
    sig, jac = _probe([op1, op2], jac_vars=["x1", "x2"])
    assert np.allclose(sig, A0 * A0, atol=1e-12)
    assert np.allclose(jac[..., 0], DX * A0, atol=1e-12)
    assert np.allclose(jac[..., 1], A0 * DX, atol=1e-12)


def test_order1_shared_variable_product_rule():
    """One variable driving both ops: df/dx = a'b + ab'."""
    sig, jac = _probe([_op({"x": "x"}), _op({"x": "x"})], jac_vars=["x"])
    assert np.allclose(jac[..., 0], 2 * A0 * DX, atol=1e-12)


def test_order2_same_op_curvature():
    """Hessian of one op: d2f/dx2 = DXX, d2f/dxdy = DXY (the d2arrs)."""
    op = _op(True, order2=True)
    sig, hess = _probe([op], hess=(["x", "y"], ["x", "y"]))
    assert np.allclose(hess[..., 0, 0], DXX, atol=1e-12)
    assert np.allclose(hess[..., 0, 1], DXY, atol=1e-12)
    assert np.allclose(hess[..., 1, 0], DXY, atol=1e-12)
    assert np.allclose(hess[..., 1, 1], 0.0, atol=1e-12)  # no (y, y) d2arr


def test_order2_parametrization_curvature():
    """order2={(z,z): {x: beta}} with order1={z: {x: alpha}} models
    p(z) with dp/dz = alpha, d2p/dz2 = beta:
    d2f/dz2 = beta * df/dp + alpha^2 * d2f/dp2."""
    alpha, beta = 2.0, 0.5
    op = _op({"z": {"x": alpha}}, order2={("z", "z"): {"x": beta}})
    sig, hess = _probe([op], hess=(["z"], ["z"]))
    expected = beta * DX + alpha**2 * DXX
    assert np.allclose(hess[..., 0, 0], expected, atol=1e-12)


def test_order2_cross_operator():
    """Cross second derivative over two ops: d2(ab)/dx dy = a'_x b'_y."""
    op1 = _op({"x1": "x"})
    op2 = _op({"y2": "y"})
    sig, hess = _probe([op1, op2], hess=(["x1"], ["y2"]))
    assert np.allclose(hess[..., 0, 0], DX * DY, atol=1e-12)


def test_order2_shared_variable_full():
    """d2(a(x)b(x))/dx2 = a''b + 2a'b' + ab'' with a''=b''=DXX."""
    op1 = _op({"x": "x"}, order2=[("x", "x")])
    op2 = _op({"x": "x"}, order2=[("x", "x")])
    sig, hess = _probe([op1, op2], hess=(["x"], ["x"]))
    expected = DXX * A0 + 2 * DX * DX + A0 * DXX
    assert np.allclose(hess[..., 0, 0], expected, atol=1e-12)


def test_magnitude_pseudo_variable_rows():
    """'magnitude' rows/cols of the Hessian are the first derivatives."""
    op = _op(True)
    sig, jac, hess = _probe([op], jac_vars=["magnitude", "x"],
                            hess=(["magnitude", "x"], ["x"]))
    assert np.allclose(jac[..., 0], sig, atol=1e-13)
    assert np.allclose(hess[..., 0, 0], jac[..., 1], atol=1e-13)


def test_matrixop_custom_derivative_consistency():
    """MatrixOp dmats derivatives reduce to the ScalarOp case when the
    matrix is diagonal."""
    mat = np.diag([A0 + 0j, A0, 1.0])
    dmat = np.diag([DX + 0j, DX, 0.0])
    mop = epg.MatrixOp(mat[None], dmats={"x": dmat[None]}, order1=["x"])
    sig_m, jac_m = _probe([mop], jac_vars=["x"])
    sop = epg.ScalarOp(_diag(A0, 1.0), darrs={"x": np.asarray(_diag(DX, 0.0))},
                       order1=["x"])
    sig_s, jac_s = _probe([sop], jac_vars=["x"])
    assert np.allclose(sig_m, sig_s, atol=1e-12)
    assert np.allclose(jac_m, jac_s, atol=1e-12)


def test_combined_vs_sequential_diff():
    """Derivatives flow through `@`-combined operators identically to the
    sequential application (reference test_diff.py:471-512, shaped-pulse
    use case: many tiny T ops interleaved with tracked relaxation)."""
    npoint, nlobe = 20, 3
    pulse = np.sinc(nlobe * np.linspace(-1, 1, npoint))
    angles = pulse * (90.0 / 180.0 / np.abs(np.sum(pulse))) / 180.0

    def build():
        seq = []
        for a in angles:
            seq += [epg.T(a, 0),
                    epg.E(1.0, 100.0, 10.0, order1=["T2", "g"])]
        return seq

    probes = [epg.ADC, epg.Jacobian(["T2", "g"])]
    sig_seq, jac_seq = epg.simulate(build() + [epg.ADC], probe=probes)

    ops = build()
    combined = ops[0]
    for op in ops[1:]:
        combined = combined @ op
    sig_cmb, jac_cmb = epg.simulate([combined, epg.ADC], probe=probes)

    assert np.abs(sig_cmb - sig_seq).max() < 1e-12
    assert np.abs(jac_cmb - jac_seq).max() < 1e-10
